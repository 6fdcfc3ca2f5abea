"""Multi-batch state-carry test for the applyInPandasWithState operator:
split the events table into two files → two micro-batches; per-user state
must accumulate ACROSS batches and the final update must equal the batch
aggregate."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from overturemaps_duckdb_spark.queries.events import cents
from overturemaps_duckdb_spark.streaming.stateful import user_running_totals
from overturemaps_duckdb_spark.streaming.windows import run_to_batch
from tests.conftest import SF_SMOKE


def test_stream_to_parquet_exactly_once(spark, tmp_path):
    """I3 streaming twin: availableNow parquet sink appends all rows once;
    re-running against the SAME checkpoint appends nothing (restartable
    incremental ingest)."""
    from overturemaps_duckdb_spark.streaming.windows import (
        events_stream,
        stream_to_parquet,
    )

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    n_src = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()

    stream = events_stream(spark, SF_SMOKE, max_files_per_trigger=1)
    stream_to_parquet(stream, out, ckpt)
    assert spark.read.parquet(out).count() == n_src

    # same checkpoint, source unchanged → exactly-once: nothing new
    stream2 = events_stream(spark, SF_SMOKE, max_files_per_trigger=1)
    stream_to_parquet(stream2, out, ckpt)
    assert spark.read.parquet(out).count() == n_src


def test_state_carries_across_batches(spark, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")

    stage = str(tmp_path / "stream")
    os.makedirs(stage)
    first = ev.where(F.col("event_id") % 2 == 0)
    second = ev.where(F.col("event_id") % 2 == 1)
    for sub, name, mtime in [(first, "a.parquet", 1_000_000), (second, "b.parquet", None)]:
        d = str(tmp_path / "tmpw")
        sub.coalesce(1).write.mode("overwrite").parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = os.path.join(stage, name)
        shutil.move(os.path.join(d, part), dst)
        if mtime is not None:
            os.utime(dst, (mtime, mtime))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out = run_to_batch(
        user_running_totals(stream), "test_state_carry", output_mode="update"
    )
    # two batches → up to two updates per user; the LAST (max update_count)
    # carries the accumulated state
    final = (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("update_count"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("user_id", "events_seen", "value_cents", "update_count")
    )
    expected = ev.groupBy("user_id").agg(
        F.count("*").alias("events_seen"),
        F.sum(cents("value")).alias("value_cents"),
    )
    f_rows = {r["user_id"]: (r["events_seen"], r["value_cents"]) for r in final.collect()}
    e_rows = {r["user_id"]: (r["events_seen"], r["value_cents"]) for r in expected.collect()}
    assert f_rows == e_rows
    # at least one user must have been updated in BOTH batches (state carry)
    assert any(r["update_count"] == 2 for r in final.collect())


def test_dedup_within_watermark_bounded_state(spark, tmp_path):
    """Watermark-bounded streaming dedup (the 100 TB form of i6): a
    redelivered payload inside the watermark horizon emits exactly once —
    the per-type aggregate of the deduped stream equals the single-copy
    batch table."""
    from overturemaps_duckdb_spark.queries import t
    from overturemaps_duckdb_spark.queries.events import cents
    from overturemaps_duckdb_spark.streaming.windows import (
        replayed_dedup_within_watermark,
        run_to_batch,
    )

    sf = SF_SMOKE
    deduped = replayed_dedup_within_watermark(
        spark, sf, root=str(tmp_path), n_copies=2
    )
    out = run_to_batch(deduped, "wm_dedup", output_mode="append")
    got = {
        r["event_type"]: (r["n"], r["value_cents"])
        for r in out.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum(cents("value")).alias("value_cents"))
        .collect()
    }
    want = {
        r["event_type"]: (r["n"], r["value_cents"])
        for r in t(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum(cents("value")).alias("value_cents"))
        .collect()
    }
    assert got == want


def test_cents_rounding_matches_batch_twin_on_halves_and_nulls(spark, tmp_path):
    """The state accumulator's rounding must equal the batch/SQL twin
    (Spark F.round / DuckDB ROUND = HALF_UP, away from zero) — pandas
    .round() is half-to-even, so 0.125 (= 12.5 cents exactly in float64)
    accumulated 12 while the twin said 13.  A NULL value must be skipped
    like SQL SUM, not NaN-poison the batch (int(NaN) raised and killed
    the streaming query)."""
    rows = [
        (1, 10, 0.125),   # 12.5 cents exactly — the tie case
        (2, 10, 0.375),   # 37.5 cents exactly
        (3, 10, -0.125),  # negative tie: away from zero → -13
        (4, 10, None),    # SQL SUM skips NULL
        (5, 10, 2.675),   # 2.675*100 is EXACTLY 267.5 in float64 → 268
        (6, 20, 0.005),   # 0.5 cents exactly
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, value double"
    )
    stage = str(tmp_path / "halves")
    ev.coalesce(1).write.parquet(stage)

    stream = spark.readStream.schema(ev.schema).parquet(stage)
    from overturemaps_duckdb_spark.streaming.windows import run_to_batch

    out = run_to_batch(
        user_running_totals(stream), "test_half_cents", output_mode="update"
    )
    got = {r["user_id"]: r["value_cents"] for r in out.collect()}

    batch = (
        ev.groupBy("user_id")
        .agg(F.sum(cents("value")).alias("value_cents"))
        .collect()
    )
    want = {r["user_id"]: r["value_cents"] for r in batch}
    assert got == want  # {10: 13+38-13+0+268 = 306, 20: 1}
    assert got[10] == 306 and got[20] == 1
