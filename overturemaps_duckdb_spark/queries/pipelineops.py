"""Training-data pipeline operators beyond the reference surface (task-brief
extension set): as-of join, deterministic hash sampling, stratified mixture
sampling, and sequence packing.

Each is an engine operator (operators/asof.py, sampling.py, packing.py)
with a value-checked DuckDB oracle; the reference has no analogs (its
surface stops at the SQL console), so reference citations point at the
closest surface these extend."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from overturemaps_duckdb_spark.functions.text import token_count
from overturemaps_duckdb_spark.operators.asof import asof_join
from overturemaps_duckdb_spark.operators.packing import pack_sequences
from overturemaps_duckdb_spark.operators.skew import salted_agg, skew_report
from overturemaps_duckdb_spark.queries.events import cents
from overturemaps_duckdb_spark.operators.sampling import (
    deterministic_shuffle,
    hash_sample,
    mixture_sample,
    per_stratum_cap,
    stratified_sample,
    temperature_allocation,
)
from overturemaps_duckdb_spark.queries import query, t, us_col
from overturemaps_duckdb_spark.queries._sql import md5_long_sql, tokens_sql

_CARRY = (
    "OVER (PARTITION BY user_id ORDER BY ts_us, side, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)


@query(
    "aj1_asof_join",
    oracle=f"""
    WITH u AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, 0 AS side
        FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, epoch_us(ts), event_id, 1
        FROM events WHERE event_type = 'purchase'
    ), w AS (
        SELECT *,
               last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
                   {_CARRY} AS v_eid,
               last_value(CASE WHEN side = 0 THEN ts_us END IGNORE NULLS)
                   {_CARRY} AS v_ts_us
        FROM u
    )
    SELECT event_id AS p_eid, user_id, ts_us AS p_ts_us,
           v_eid, CAST(v_ts_us AS BIGINT) AS v_ts_us
    FROM w WHERE side = 1
    """,
)
def aj1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest view at or
    before it (NULL when none) — operators/asof.asof_join union-merge +
    carry-forward, one shuffle on user_id, no range blowup.  The oracle is
    the identical carry-forward expressed as a window over the union."""
    ev = t(spark, sf_dir, "events")
    ev = ev.withColumn("us", us_col(ev))
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "us"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "us"
    )
    out = asof_join(
        purchases,
        views,
        by=["user_id"],
        left_ts="us",
        right_ts="us",
        right_cols=["event_id", "us"],
        right_order="event_id",
    )
    return out.select(
        F.col("event_id").alias("p_eid"),
        "user_id",
        F.col("us").alias("p_ts_us"),
        F.col("r_event_id").alias("v_eid"),
        F.col("r_us").alias("v_ts_us"),
    )


@query(
    "sa1_hash_sample",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {md5_long_sql("CAST(doc_id AS VARCHAR)")} % 1000 < 100
    """,
)
def sa1_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample keyed on md5(doc_id) — stable under
    task retries (rand() is not), identical bits in any engine."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return hash_sample(d, "doc_id", permille=100)


@query(
    "sa2_stratified_sample",
    oracle=f"""
    SELECT event_id, event_type FROM events
    WHERE {md5_long_sql("CAST(event_id AS VARCHAR)")} % 1000 <
          CASE event_type WHEN 'purchase' THEN 1000 WHEN 'view' THEN 500
                          WHEN 'click' THEN 250 WHEN 'error' THEN 50
                          ELSE 0 END
    """,
)
def sa2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified mixture sampling: per-stratum permille rates (keep all
    purchases, half the views, ..., drop unlisted strata) — the explicit
    mixture recipe of a training corpus, as a pure codegen filter."""
    ev = t(spark, sf_dir, "events").select("event_id", "event_type")
    return stratified_sample(
        ev,
        "event_id",
        "event_type",
        {"purchase": 1000, "view": 500, "click": 250, "error": 50},
    )


@query(
    "pk1_sequence_packing",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                   AS before
        FROM tok
    )
    SELECT doc_id, n_tokens,
           CAST(before // 2048 AS BIGINT) AS seq_id,
           CAST(before - (before // 2048) * 2048 AS BIGINT) AS offset
    FROM c
    """,
)
def pk1_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked sequence packing at a 2048-token budget in doc_id order —
    operators/packing.pack_sequences distributed prefix sum (range
    partition → partition-local window → P-row driver stitch), never a
    single-task global window."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("bigint").alias("n_tokens")
    )
    out = pack_sequences(d, "doc_id", "n_tokens", budget=2048)
    return out.select("doc_id", "n_tokens", "seq_id", "offset")


@query(
    "sh1_deterministic_shuffle",
    oracle="""
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS _shuffle_key
    FROM documents
    """,
)
def sh1_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training-order shuffle: every doc keyed by
    md5(id:seed), range-partitioned + locally sorted on the key
    (operators/sampling.deterministic_shuffle) — the seeded permutation a
    training run reads, identical on every re-run and under task retries.
    The driver compare is order-insensitive; the ORDER itself is pytest-
    asserted (tests/test_pipelineops.py)."""
    d = t(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(d, "doc_id").select("doc_id", "_shuffle_key")


@query(
    "sk1_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
    FROM events GROUP BY event_type
    """,
)
def sk1_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation (operators/skew.salted_agg): each key
    splits into 16 salted subkeys, partially aggregates, then merges.

    Scope honesty: for ALGEBRAIC aggregates like these (count/sum/max),
    Catalyst's map-side partial aggregation already collapses hot keys to
    one row per key per task, so salting adds nothing there — the
    mechanism exists for aggregates whose per-key STATE is heavy and
    non-collapsible map-side (collect_set/list accumulation, sketch
    merges, UDAF state), where the per-salt stage bounds both the hash-
    table rows and the single-task merge input.  The query certifies the
    mechanism's correctness with algebraic functions precisely because
    those verify exactly against the plain-GROUP-BY oracle (lossless
    re-aggregation), which the oracle states."""
    ev = t(spark, sf_dir, "events").select(
        "event_id", "event_type", cents("value").alias("_cents")
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n": (F.count("*"), F.sum("n").cast("bigint")),
            "value_cents": (F.sum("_cents"), F.sum("value_cents").cast("bigint")),
            "max_cents": (F.max("_cents"), F.max("max_cents").cast("bigint")),
        },
        # content-derived salt: retry/recompute-stable even if this input
        # ever moves downstream of a shuffle (operators/skew.salted caveat)
        unique_col="event_id",
    )
    return out


#: mixture recipe: target permille share of the token budget per source
#: (sums to 1000; sources not in the recipe are dropped — rate 0)
_MIX_WEIGHTS = {
    "src0": 250,
    "src1": 250,
    "src2": 150,
    "src3": 100,
    "src4": 100,
    "src5": 50,
    "src6": 50,
    "src7": 50,
}
_MIX_BUDGET = 10_000  # tokens

_MIX_W_VALUES = ", ".join(f"('{s}', {w})" for s, w in _MIX_WEIGHTS.items())


@query(
    "mx1_token_budget_mix",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source,
               CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    tot AS (
        SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS st
        FROM tok GROUP BY source
    ),
    w(source, w_pm) AS (VALUES {_MIX_W_VALUES}),
    rate AS (
        SELECT tot.source,
               LEAST(1000, CAST(FLOOR(
                   CAST(w.w_pm * {_MIX_BUDGET} AS DOUBLE) / tot.st
               ) AS BIGINT)) AS rate_pm
        FROM tot JOIN w ON tot.source = w.source
    )
    SELECT k.doc_id, k.source, k.n_tokens, r.rate_pm
    FROM tok k JOIN rate r ON k.source = r.source
    WHERE {md5_long_sql("CAST(k.doc_id AS VARCHAR)")} % 1000 < r.rate_pm
    """,
)
def mx1_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling — the "data recipe" step of a training
    pipeline: each source is downsampled so it contributes its target share
    of a global token budget (operators/sampling.mixture_sample).  Per-source
    rates derive from the actual token mass (a dozens-row broadcast);
    membership is the deterministic md5 threshold, so the sample is
    retry-stable and the oracle reproduces it bit-for-bit."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count("text").cast("bigint").alias("n_tokens")
    )
    return mixture_sample(
        d, "doc_id", "source", "n_tokens", _MIX_WEIGHTS, _MIX_BUDGET
    ).select("doc_id", "source", "n_tokens", "rate_pm")


_MX2_BUDGET = 10_000


@query(
    "mx2_temperature_mixture",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
        WHERE source IS NOT NULL GROUP BY source
    ),
    wq AS (
        SELECT source, n,
               CAST(ROUND(sqrt(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS w
        FROM counts WHERE n > 0
    ),
    tot AS (
        SELECT CAST(SUM(w) AS BIGINT) AS wz, CAST(SUM(n) AS BIGINT) AS nz
        FROM wq
    ),
    based AS (
        SELECT source, n, w, wz, nz,
               (w * {_MX2_BUDGET}) // wz AS base,
               w * {_MX2_BUDGET} - ((w * {_MX2_BUDGET}) // wz) * wz AS rem
        FROM wq CROSS JOIN tot
    ),
    sp AS (SELECT {_MX2_BUDGET} - CAST(SUM(base) AS BIGINT) AS spare FROM based)
    SELECT source, n,
           ROUND(CAST(n AS DOUBLE) / nz, 6) AS p_raw,
           ROUND(CAST(w AS DOUBLE) / wz, 6) AS p_temp,
           CAST(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                            <= spare THEN 1 ELSE 0 END AS BIGINT) AS alloc
    FROM based CROSS JOIN sp
    """,
)
def mx2_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed mixture allocation (mT5/XLM-R sampling rule,
    operators/sampling.temperature_allocation): p(source) ∝ n^0.5 flattens
    the corpus head so low-resource sources up-weight, and a 10k-unit
    budget splits by exact integer largest-remainder (allocations sum to
    the budget bit-for-bit in both engines — sqrt is IEEE
    correctly-rounded, every division a comparison depends on is integer
    div/mod).  The engine-side twin of temperature_weights' driver
    permille dict."""
    d = t(spark, sf_dir, "documents")
    return temperature_allocation(d, "source", budget=_MX2_BUDGET, tau=0.5)


@query(
    "sa3_source_cap",
    oracle=f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY {md5_long_sql("CAST(doc_id AS VARCHAR)")}, doc_id
               ) AS r
        FROM documents
    ) WHERE r <= 10
    """,
)
def sa3_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap (≤10 docs per source): the anti-skew
    mixture guard of web-scale corpora — one mega-domain must not dominate
    training data.  Winners are the deterministic 10 lowest (md5(id), id)
    per source (retry-stable, engine-portable).  Skew safety is Catalyst's
    own rank-limit pushdown: WindowGroupLimit(Partial) under the exchange
    caps every map task's emission at 10 rows per stratum, so a
    billion-row domain never floods the shuffle or the final sort (plan
    shape pinned in tests/test_pipelineops.py)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    return per_stratum_cap(d, "doc_id", "source", cap=10)


@query(
    "ex1_training_shards",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id,
               CAST({md5_long_sql("CAST(doc_id AS VARCHAR) || '#shard:42'")}
                    % 8 AS INT) AS shard,
               md5(CAST(doc_id AS VARCHAR) || ':42') AS sk
        FROM documents
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           arg_min(doc_id, sk) AS first_doc
    FROM keyed GROUP BY shard
    """,
)
def ex1_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export certified end-to-end: write the corpus as 8
    hash-assigned shard directories (operators/sampling.
    write_training_shards — md5(id#seed) mod 8 membership, per-shard seeded
    order, ONE exchange, no global sort), then read the store back and
    manifest it: per shard the row count, an id checksum, and the first
    document in stored training order (min_by over the persisted
    ``_shuffle_key``, which must equal the oracle's arg_min over the same
    md5 — certifying both membership AND order survive the parquet
    round-trip).  At 100 TB this is the loader-facing contract: a shard
    directory streams its sub-permutation front-to-back."""
    from overturemaps_duckdb_spark.operators.sampling import (
        write_training_shards,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    # ONE deterministic store per (app, fixture) via staging_root,
    # overwritten each run (r10: the r8-era md5(sf_dir) form predated the
    # helper — no per-app isolation, so two concurrent processes could
    # clobber each other's shards mid-write, and it keyed on the RAW
    # sf_dir string, so './sf0.01' vs the absolute path wrote two stores)
    from overturemaps_duckdb_spark.operators._util import staging_root

    root = staging_root(spark, sf_dir, "ex1") + "/shards"
    write_training_shards(docs, "doc_id", root, n_shards=8, seed=42)
    back = spark.read.parquet(root)
    return back.groupBy(F.col("_shard").cast("int").alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.min_by("doc_id", "_shuffle_key").alias("first_doc"),
    )


@query(
    "sk2_skew_report",
    oracle="""
    WITH c AS (
        SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_key_rows,
           ROUND(quantile_cont(n, 0.5), 6) AS p50_key_rows,
           ROUND(quantile_cont(n, 0.9), 6) AS p90_key_rows,
           ROUND(quantile_cont(n, 0.99), 6) AS p99_key_rows,
           ROUND(CAST(max(n) AS DOUBLE)
                 / (CAST(sum(n) AS DOUBLE) / count(*)), 6) AS skew_ratio,
           (SELECT l_suppkey FROM c ORDER BY n DESC, l_suppkey LIMIT 1)
               AS hot_l_suppkey,
           (SELECT CAST(n AS BIGINT) FROM c ORDER BY n DESC, l_suppkey
            LIMIT 1) AS hot_rows
    FROM c
    """,
)
def sk2_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnosis (operators/skew.skew_report) over lineitem's
    supplier key — the measurement a 100 TB pipeline runs BEFORE picking a
    shuffle strategy for an unfamiliar join key: rows, distinct keys,
    hottest-key size, exact per-key-count percentiles, and the skew ratio
    (max/mean key size; ≈1 uniform ⇒ plain hash join, ≫1 ⇒ salt or AQE
    skew split).  One count shuffle + a one-row stats pass; exact
    percentiles are engine-portable (linear interpolation both sides)."""
    li = t(spark, sf_dir, "lineitem")
    rep = skew_report(li, ["l_suppkey"])
    return rep.select(
        "n_rows", "n_keys", "max_key_rows",
        F.round("p50_key_rows", 6).alias("p50_key_rows"),
        F.round("p90_key_rows", 6).alias("p90_key_rows"),
        F.round("p99_key_rows", 6).alias("p99_key_rows"),
        F.round("skew_ratio", 6).alias("skew_ratio"),
        "hot_l_suppkey", "hot_rows",
    )
