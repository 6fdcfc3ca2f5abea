"""Structured-Streaming event ops: micro-batched source, watermarked
tumbling windows, session windows.

The reference has no streaming surface — its closest mechanism is
micro-batched ingest with a shrinking row budget
(`/root/reference/src/lib/themes.js:287,300-347`, SURVEY §2.9 I1).  Here
that becomes the real thing: `readStream` file source with
``maxFilesPerTrigger`` (the same files-per-batch knob, themes.js:287 uses 3),
event-time watermarks for late data, and windowed/sessionized stateful aggs.

Scale notes:
- The file source scales to object-store listings; watermark + window state
  lives in the state store, partitioned by grouping key — the shuffle is on
  (window, event_type) / (user_id), same keys as the batch twins in
  queries/events.py.
- `availableNow` gives batch-bounded execution of the same plan — used by
  tests and the oracle harness to prove stream/batch equivalence (the twins
  must agree row-for-row).
- Event time adapts to the fixture's physical `ts` type (probe-then-adapt,
  like queries.us_col) and is TZ-INDEPENDENT: epoch-nano LONG →
  `timestamp_micros(ts DIV 1000)`, NTZ → pure timestamp arithmetic, LTZ →
  `unix_micros` — no session conf is read or mutated.

Boundary semantics: `session_window` starts a NEW session when the gap is
``>= gap`` (window end is exclusive); the lag-based batch formulation must
use ``>=`` to match — see queries/events i2 oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from overturemaps_duckdb_spark.queries.events import WINDOW_US, cents

#: files per micro-batch, mirroring the reference's ingest batch size
#: (themes.js:287)
DEFAULT_FILES_PER_TRIGGER = 3


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_files_per_trigger: int | None = DEFAULT_FILES_PER_TRIGGER,
) -> DataFrame:
    """Streaming view of the events table (file source, schema-pinned).

    nanosAsLong is schema-affecting and must be live for the probe read
    AND the lazy stream, so it stays session-scoped (it only changes how
    TIMESTAMP(NANOS) parquet is typed — harmless to everything else).
    The session TZ is deliberately NOT touched (r8 review fix: the old
    UTC pin leaked to the caller's session forever): with_event_time is
    TZ-independent now, same as queries.us_col since r4."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # schema via queries.t — its per-(app, fixture, table) schema memo
    # skips the per-call footer-inference job (r13)
    from overturemaps_duckdb_spark.queries import t as _t

    schema = _t(spark, sf_dir, "events").schema
    # the file source wants a directory; glob-filter down to the events file
    reader = (
        spark.readStream.schema(schema).option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(sf_dir)


def with_event_time(stream: DataFrame) -> DataFrame:
    """TIMESTAMP event-time column from whatever physical `ts` the source
    carries (epoch-nano LONG / TIMESTAMP / TIMESTAMP_NTZ) — TZ-INDEPENDENT
    like queries.us_col (r8 review fix: the NTZ branch used a bare
    ``cast('timestamp')``, which reads the SESSION time zone at execution,
    and the loaders compensated by pinning the session TZ to UTC — a
    setting that leaked to the caller forever).  The NTZ wall time is
    anchored via pure timestamp arithmetic instead, so no session conf is
    touched and a hostile session TZ cannot shift event times."""
    dt = stream.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        us = F.expr("ts DIV 1000").cast("bigint")
    elif isinstance(dt, T.TimestampNTZType):
        us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    else:  # TIMESTAMP (LTZ) — already an absolute instant
        us = F.unix_micros(F.col("ts"))
    return stream.withColumn("event_time", F.timestamp_micros(us))


def tumbling_counts(
    stream: DataFrame, *, watermark: str = "30 minutes", window: str = "5 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — the streaming twin
    of queries/events.e1 (same grouping keys, same cents-exact sum)."""
    return (
        with_event_time(stream)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "event_type")
        .agg(F.count("*").alias("n"), F.sum(cents("value")).alias("value_cents"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n",
            "value_cents",
        )
    )


def session_counts(stream: DataFrame, *, gap: str = "30 minutes") -> DataFrame:
    """session_window per user — the streaming twin of queries/events.e2.

    Output is (user_id, session bounds in µs, n_events); state is one open
    session per (user, window) in the state store."""
    return (
        with_event_time(stream)
        .withWatermark("event_time", gap)
        .groupBy(F.session_window("event_time", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            "n_events",
        )
    )


def session_counts_to_batch(
    spark: SparkSession, sf_dir: str, *, gap: str = "30 minutes"
) -> DataFrame:
    """Run the session_window aggregation to completion in APPEND mode.

    Session windows support only append output, and append emits a session
    only once the watermark passes its end — so a bounded replay would leave
    every tail session stuck in the state store.  The standard fix is a
    **flush sentinel**: stage the data plus one far-future marker event as a
    second micro-batch; its event time pushes the watermark past every real
    session, append emits them all, and the sentinel's own session is
    filtered out of the result.
    """
    import os
    import shutil
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # no session-TZ pin (r8 review fix — it leaked to the caller forever):
    # with_event_time is TZ-independent, and the sentinel's collect→lit
    # roundtrip uses one consistent session TZ whatever it is
    src = f"{sf_dir}/events.parquet"
    batch = spark.read.parquet(src)
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    if max_ts is None:  # empty source: no sessions, and no ts to anchor
        # the sentinel to — `max_ts + delta` would TypeError on None
        utype = batch.schema["user_id"].dataType.simpleString()
        return spark.createDataFrame(
            [], f"user_id {utype}, session_start_us long, n_events long"
        )

    # Stage = a SYMLINK to the source file (constant cost — the events
    # table is never copied; at 100 TB the staging dir is a manifest of
    # references, not data) + the one-row sentinel.  Batch order is
    # guaranteed by mtime: the symlink resolves to the source's mtime
    # (some past instant), the sentinel is future-dated below.
    from overturemaps_duckdb_spark.operators._util import staging_root

    stage = staging_root(spark, sf_dir, "streamstage")
    os.symlink(os.path.abspath(src), os.path.join(stage, "events.parquet"))
    if isinstance(max_ts, int):  # epoch-nano LONG fixture
        flush_ts = max_ts + 365 * 86_400 * 10**9
    else:  # timestamp fixture → datetime.datetime
        from datetime import timedelta

        flush_ts = max_ts + timedelta(days=365)
    sentinel_cols = []
    for fld in batch.schema.fields:
        if fld.name == "ts":
            v = F.lit(flush_ts)
        elif fld.name == "event_type":
            v = F.lit("__flush__")
        elif fld.name == "user_id":
            v = F.lit(-1)
        else:
            v = F.lit(0)
        sentinel_cols.append(v.cast(fld.dataType).alias(fld.name))
    sentinel = spark.range(1).select(*sentinel_cols)
    sentinel.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage, "sentinel")
    )
    # the sentinel must land in a LATER micro-batch: the file source orders
    # by modification time, so future-date it past the source's mtime
    import time as _time

    sentinel_path = os.path.join(stage, "zz_sentinel.parquet")
    for fn in os.listdir(os.path.join(stage, "sentinel")):
        if fn.endswith(".parquet"):
            shutil.move(os.path.join(stage, "sentinel", fn), sentinel_path)
    shutil.rmtree(os.path.join(stage, "sentinel"))
    future = int(_time.time()) + 365 * 86_400
    os.utime(sentinel_path, (future, future))

    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out = session_counts(stream, gap=gap)
    result = run_to_batch(out, "i2_sessions", output_mode="append")
    # exclude ONLY the sentinel's session (user_id -1 is reserved for it
    # above).  The old `user_id >= 0` range predicate silently dropped
    # legitimate NULL-user sessions (NULL >= 0 is NULL → filtered) and any
    # negative real id — the oracle sessionizes ALL events.
    return result.where(F.coalesce(F.col("user_id") != -1, F.lit(True)))


def followup_events_join(
    spark: SparkSession,
    sf_dir: str,
    *,
    within: str = "5 minutes",
) -> DataFrame:
    """Stream-stream time-interval self-join: for every event, the same
    user's follow-up events within `within`.

    Both sides are independent watermarked streams; the time-range join
    condition bounds the state each side must keep (Spark evicts rows whose
    join window has passed the other side's watermark).  Inner join emits
    matches as they arrive, so a bounded availableNow replay yields the
    complete batch answer — the i4 oracle states it in plain SQL."""
    a = with_event_time(
        events_stream(spark, sf_dir, max_files_per_trigger=None)
    ).withWatermark("event_time", within)
    b = with_event_time(
        events_stream(spark, sf_dir, max_files_per_trigger=None)
    ).withWatermark("event_time", within)
    a = a.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("event_time").alias("a_time"),
    )
    b = b.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("event_time").alias("b_time"),
    )
    joined = a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_time") > F.col("a_time"))
        & (
            F.col("b_time")
            <= F.col("a_time") + F.expr(f"INTERVAL {within}")
        ),
        "inner",
    )
    return joined.select("a_id", "b_id")


def stream_to_parquet(
    sdf: DataFrame, path: str, checkpoint: str
) -> None:
    """I3's streaming twin: append-mode parquet file sink with a checkpoint.

    The checkpoint gives exactly-once file-sink semantics — re-running with
    the same checkpoint after the source is exhausted appends NOTHING (the
    batch ids are committed), which is the property that makes incremental
    ingest restartable at 100 TB (tested in test_streaming_stateful)."""
    q = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def foreach_batch_ingest(
    spark: SparkSession,
    sf_dir: str,
    *,
    root: str,
    n_splits: int = 3,
) -> tuple[str, str]:
    """I3 through a ``foreachBatch`` sink: each micro-batch appends its rows
    to a parquet table AND writes one `_load_history` telemetry row — the
    streaming twin of the reference's per-batch CTAS/INSERT + history insert
    loop (themes.js:300-347,391).

    ``foreachBatch`` is the escape hatch the plain file sink can't cover:
    the batch function sees a BATCH DataFrame per trigger, so it can do
    multi-sink writes (data + log) — at 100 TB the same
    hook does MERGE/upsert into table formats.  Events are staged into
    `n_splits` files with pinned mtimes so maxFilesPerTrigger=1 yields a
    deterministic batch sequence.

    Returns (sink_path, log_root)."""
    import os
    import shutil

    from overturemaps_duckdb_spark.state import append_load_history

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from overturemaps_duckdb_spark.queries import t as _t

    batch = _t(spark, sf_dir, "events")
    stage = os.path.join(root, "stage")
    for i in range(n_splits):
        # pmod, not %: Spark's % keeps the dividend's sign, so a negative
        # event_id's remainder matches no split in 0..n-1 and the row
        # silently never reaches the sink (repo convention — sampling.py,
        # skew.py use pmod for exactly this)
        part = batch.where(F.pmod(F.col("event_id"), F.lit(n_splits)) == i)
        pdir = os.path.join(stage, f"split_{i}")
        part.coalesce(1).write.mode("overwrite").parquet(pdir)
        for fn in os.listdir(pdir):
            if fn.endswith(".parquet"):
                dst = os.path.join(stage, f"{i:02d}_events.parquet")
                shutil.move(os.path.join(pdir, fn), dst)
                os.utime(dst, (1_000_000 + i, 1_000_000 + i))
        shutil.rmtree(pdir)

    sink = os.path.join(root, "sink")
    log_root = os.path.join(root, "log")
    ckpt = os.path.join(root, "ckpt")

    def handle_batch(bdf: DataFrame, batch_id: int) -> None:
        # two actions consume this batch frame (count + sink write); without
        # a persist each action re-reads the micro-batch's source files —
        # at 100 TB that doubles every ingest's scan (r10 review)
        bdf.persist()
        try:
            n = bdf.count()
            bdf.write.mode("append").parquet(sink)
            append_load_history(
                log_root, key=f"batch_{batch_id}", lim=n, row_count=n
            )
        finally:
            bdf.unpersist()

    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink, log_root


def replayed_dedup_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    root: str,
    n_copies: int = 2,
) -> DataFrame:
    """Streaming exactly-once dedup over an at-least-once source.

    The events file is staged ``n_copies`` times with pinned mtimes, so
    ``maxFilesPerTrigger=1`` replays the identical payload as successive
    micro-batches — the delivery model of a retrying upstream (a queue with
    redelivery, a backfill overlapping live ingest).  ``dropDuplicates`` on
    the key column holds the seen-key set in the state store and emits each
    key exactly once, no matter how many times it arrives.

    At 100 TB the unbounded seen-set is the scale hazard;
    ``dropDuplicatesWithinWatermark`` bounds state to the redelivery horizon
    (keys older than the watermark are evicted).  The bounded replay here
    has no event-time ordering between copies, so the unbounded form is the
    one whose output equals the batch answer deterministically — duplicates
    are bit-identical rows, so WHICH arrival survives cannot matter.
    """
    import os
    import shutil

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(src).schema
    stage = os.path.join(root, "stage")
    os.makedirs(stage, exist_ok=True)
    for i in range(n_copies):
        dst = os.path.join(stage, f"{i:02d}_events.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    return stream.dropDuplicates(["event_id"])


def replayed_dedup_within_watermark(
    spark: SparkSession,
    sf_dir: str,
    *,
    root: str,
    n_copies: int = 2,
    delay: str = "3650 days",
) -> DataFrame:
    """The 100 TB form of :func:`replayed_dedup_stream`: state bounded by a
    watermark instead of growing forever.

    ``dropDuplicatesWithinWatermark`` evicts seen-keys once the watermark
    passes their event time + delay — the state store holds only the
    redelivery horizon, not the corpus's full key history.  Delivery
    semantics: a duplicate arriving within `delay` of the first copy is
    dropped (exactly-once inside the horizon); one arriving later is a new
    row — so `delay` must dominate the upstream's maximum redelivery lag.
    The bounded replay here redelivers everything inside one horizon, so
    the output equals the batch table exactly (pinned in
    test_streaming_stateful)."""
    import os
    import shutil

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(src).schema
    stage = os.path.join(root, "stage")
    os.makedirs(stage, exist_ok=True)
    for i in range(n_copies):
        dst = os.path.join(stage, f"{i:02d}_events.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    ev = with_event_time(stream).withWatermark("event_time", delay)
    return ev.dropDuplicatesWithinWatermark(["event_id"])


def run_to_batch(
    sdf: DataFrame,
    name: str,
    *,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink; return the result as a batch DataFrame.

    `state_partitions`: the state store costs per-partition setup/commit on
    EVERY micro-batch — at fixture event volumes 32 shuffle partitions cost
    3.5 s where 8 cost 1.3 s (measured).  Streaming queries bind the
    partition count at start, so it's set for the query and restored after;
    at real scale size it by grouping-key cardinality, not core count.

    This is the stream/batch-equivalence bridge: the driver's oracle harness
    compares the returned table against plain SQL."""
    spark = sdf.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
