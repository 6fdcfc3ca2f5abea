"""Deterministic sampling for training-data pipelines.

`rand()`-based sampling is non-reproducible across retries/stage replays —
a failed task that reruns samples DIFFERENT rows, silently corrupting an
otherwise exactly-once pipeline.  Hash-threshold sampling keys the decision
on the row's own identity (md5 of the id), so it is stable under retries,
portable across engines (the DuckDB oracle computes the identical bit
pattern), and trivially stratifiable.  This is the industry-standard shape
for corpus subsampling / heldout splits (sample = hash(id) mod M < k).

Everything is a pure column expression — whole-stage codegen, no shuffle,
the filter evaluates at scan time.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from overturemaps_duckdb_spark.functions.text import md5_long

#: sampling universe denominator — permille thresholds
M = 1000


def hash_bucket(id_col: str | Column) -> Column:
    """Stable per-row bucket in [0, 1000): md5-hash the id, mod 1000."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_long(c.cast("string")) % M


def hash_sample(df: DataFrame, id_col: str, permille: int) -> DataFrame:
    """Keep ~permille/1000 of rows, deterministically by id."""
    return df.where(hash_bucket(id_col) < permille)


def stratified_sample(
    df: DataFrame, id_col: str, stratum_col: str, rates: dict[str, int]
) -> DataFrame:
    """Per-stratum permille rates (e.g. downsample web text, keep all code).

    Unlisted strata are dropped (rate 0) — the explicit-mixture contract of
    a training-data recipe.  The rate lookup is a literal CASE chain, fully
    codegen; rows never shuffle."""
    rate = F.lit(0)
    for value, permille in rates.items():
        rate = F.when(F.col(stratum_col) == value, F.lit(permille)).otherwise(rate)
    return df.where(hash_bucket(id_col) < rate)


def mixture_rates(
    df: DataFrame,
    stratum_col: str,
    token_col: str,
    weights_permille: dict[str, int],
    budget_tokens: int,
) -> DataFrame:
    """(stratum, rate_pm) — per-stratum keep rates (permille) that hit a
    token-budget mixture: stratum s should contribute ~weights[s]/1000 of
    ``budget_tokens``, so rate_pm(s) = min(1000, ⌊w·budget / tokens(s)⌋).

    The per-stratum token totals are a tiny aggregate (one row per source —
    dozens, not billions), so the rate table broadcasts; the corpus itself
    never collects anywhere.  Strata not in the recipe get rate 0 — the
    explicit-mixture contract (same as stratified_sample).

    The division is floor(double/double) rather than integer DIV so the
    DuckDB oracle can state the bit-identical IEEE expression."""
    totals = df.groupBy(stratum_col).agg(
        F.sum(token_col).cast("bigint").alias("_stratum_tokens")
    )
    wmap = F.create_map(
        *[F.lit(x) for kv in weights_permille.items() for x in kv]
    )
    w_pm = F.coalesce(wmap[F.col(stratum_col)], F.lit(0)).cast("bigint")
    # NULL/zero-token strata are decided EXPLICITLY, not by IEEE edge
    # semantics: a stratum whose token column is entirely NULL sums to
    # NULL, the division went NULL, and F.least SKIPS NULLs — the rate
    # came out 1000 (keep everything) even for weight-0/unlisted strata,
    # violating the explicit-mixture contract (and a coalesce-to-0
    # divisor trips ANSI DIVIDE_BY_ZERO).  Tokens present → the original
    # bit-identical IEEE division; no tokens → keep-all when listed
    # (budget unmeetable), drop when unlisted.
    toks = F.col("_stratum_tokens")
    rate = (
        F.when(
            toks > 0,
            F.least(
                F.lit(1000).cast("bigint"),
                F.floor(
                    (w_pm * F.lit(budget_tokens)).cast("double") / toks
                ).cast("bigint"),
            ),
        )
        .when(w_pm > 0, F.lit(1000).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
    )
    return totals.select(stratum_col, rate.alias("rate_pm"))


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    token_col: str,
    weights_permille: dict[str, int],
    budget_tokens: int,
) -> DataFrame:
    """Downsample each stratum to its mixture share of a global token budget
    (the "data recipe" step of a training pipeline: e.g. web 60% / code 30% /
    reference 10% of a 2T-token budget).

    Two bounded stages: a map-side-combinable per-stratum token sum (rows
    shuffle as (stratum, partial-sum) pairs only), then a broadcast join of
    the dozens-row rate table back onto the corpus with the deterministic
    md5-threshold filter — retry-stable, engine-portable, no corpus shuffle.
    Rates are derived from the ACTUAL token mass per stratum, so a stratum
    with less material than its share simply keeps everything (rate caps at
    1000‰) — the standard behavior when a small high-quality source can't
    fill its target share."""
    rates = mixture_rates(df, stratum_col, token_col, weights_permille, budget_tokens)
    return df.join(F.broadcast(rates), stratum_col).where(
        hash_bucket(id_col) < F.col("rate_pm")
    )


def shuffle_key(id_col: str | Column, seed: int = 42) -> Column:
    """Deterministic global-shuffle sort key: md5 of 'id:seed'.

    Training-order shuffling must be reproducible (re-running the pipeline
    yields the identical order) and retry-safe — `rand()` is neither.  The
    hex digest is uniform, so ORDER BY this key is an unbiased permutation;
    a different seed is a fresh independent permutation.  At 100 TB the
    engine range-partitions by this key (repartitionByRange + local sort)
    — a total sort, never a single-task global window."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(c.cast("string"), F.lit(f":{seed}")))


def deterministic_shuffle(df: DataFrame, id_col: str, seed: int = 42) -> DataFrame:
    """The corpus with its shuffle key attached, range-partitioned and
    sorted by it — rows stream out in the seeded permutation order."""
    keyed = df.withColumn("_shuffle_key", shuffle_key(id_col, seed))
    return keyed.repartitionByRange(
        df.sparkSession.sparkContext.defaultParallelism, "_shuffle_key"
    ).sortWithinPartitions("_shuffle_key")


def temperature_weights(
    df: DataFrame,
    stratum_col: str,
    token_col: str,
    tau: float = 0.7,
) -> dict[str, int]:
    """Temperature-smoothed mixture weights from the corpus's own token
    mass: p(s) ∝ tokens(s)^tau — the standard multilingual/multi-source
    sampling rule (tau=1 → proportional to the data, tau=0 → uniform over
    strata; 0.3-0.7 up-weights low-resource strata without drowning the
    head).  Feed the result straight into :func:`mixture_sample` /
    :func:`mixture_rates` as ``weights_permille``.

    The per-stratum totals are one row per source (dozens) — the ONLY
    thing collected; the corpus never moves.  Permilles are rounded by
    largest remainder so they sum to exactly 1000.
    """
    totals = df.groupBy(stratum_col).agg(
        F.sum(token_col).cast("double").alias("_t")
    ).collect()
    powed = {r[0]: float(r["_t"]) ** tau for r in totals if r["_t"] and r["_t"] > 0}
    z = sum(powed.values())
    if not z:
        return {}
    raw = {s: 1000.0 * v / z for s, v in powed.items()}
    floors = {s: int(v) for s, v in raw.items()}
    short = 1000 - sum(floors.values())
    # deterministic largest-remainder: break ties on stratum name
    by_frac = sorted(raw, key=lambda s: (-(raw[s] - floors[s]), s))
    for s in by_frac[:short]:
        floors[s] += 1
    return floors


def quality_weighted_sample(
    df: DataFrame, id_col: str, quality_col: str, *, exponent: int = 2
) -> DataFrame:
    """Soft quality filter (the FineWeb-style alternative to a hard
    threshold): each row survives with probability ``quality^exponent``
    — high-quality documents keep, low-quality documents thin
    proportionally instead of cliff-dropping at a cutoff (``exponent``
    sharpens the curve; 1 = linear).

    Membership is the deterministic md5 bucket (retry-stable, the
    hash_sample contract): keep iff ``bucket(id) < q^exponent · 1000``.
    The comparison is a RAW double comparison — the power is computed by
    repeated multiplication (integer exponent, never ``pow()``) from the
    quality value both engines already agree on bit-for-bit, so
    membership is bit-identical; rounding the rate to a permille integer
    first would reintroduce the cross-engine half-boundary trap the x18
    integer-mean fix removed.  Rows never shuffle; the filter is pure
    codegen riding the scan.

    Domain contract (ADVICE r11): ``quality_col`` is a [0, 1] score.
    NULL quality DROPS the row — mechanically via the clamp, not via a
    NULL comparison (ADVICE r12): Spark's ``greatest()`` SKIPS nulls, so
    ``greatest(NULL, 0.0)`` is 0.0, p becomes 0, and the strict ``<``
    excludes the row (bucket 0 is not < 0).  Anyone relaxing ``<`` to
    ``<=`` or reworking the clamp must re-derive the NULL path.  Quality
    ≥ 1 always keeps, and NEGATIVE quality is clamped to 0 before
    exponentiation —
    without the clamp an even exponent turns q=-0.9 into p=0.81 and
    quietly INVERTS the filter for garbage-scored rows."""
    if exponent < 1:
        raise ValueError(f"exponent must be >= 1, got {exponent}")
    q = F.greatest(F.col(quality_col).cast("double"), F.lit(0.0))
    p = q
    for _ in range(exponent - 1):
        p = p * q
    return df.where(hash_bucket(id_col).cast("double") < p * F.lit(1000.0))


def temperature_allocation(
    df: DataFrame,
    stratum_col: str,
    *,
    budget: int,
    tau: float = 0.5,
    weight_col: str | None = None,
) -> DataFrame:
    """Distributed, integer-exact temperature mixture allocation:
    ``(stratum, n, p_raw, p_temp, alloc)`` where ``p_temp ∝ n^tau`` (the
    mT5/XLM-R multilingual sampling rule — tau<1 up-weights low-resource
    strata) and ``alloc`` splits ``budget`` units across strata by
    LARGEST-REMAINDER so the allocations are integers summing to exactly
    ``budget`` (ties → stratum name ascending).

    :func:`temperature_weights` is the driver-side permille dict for
    feeding :func:`mixture_sample`; this is the engine-side form — no
    collect, and every allocation decision is exact INTEGER arithmetic:
    weights quantize to micro-units (``round(n^tau · 1e6)``), base shares
    are ``(budget·w) div Σw`` and remainders ``(budget·w) mod Σw``, so
    both engines agree bit-for-bit (no float division reaches a
    comparison).  ``tau=0.5`` (default) computes via ``sqrt`` — IEEE
    correctly-rounded in both engines, hence certified; other tau go
    through ``pow``, which is 1-ulp-accurate but not guaranteed
    bit-identical cross-engine (fine in production, noted for oracles).

    ``weight_col`` measures strata by a mass column (tokens) instead of
    row count.  NULL strata are excluded (stated contract, not engine
    NULL-ordering accident).  Scale shape: one map-side-combined
    groupBy(stratum) — the only thing that shuffles is (stratum,
    partial count); the stratum frame is bounded (dozens of sources), so
    the two 1-row broadcasts and the single-partition ranking window are
    driver-free constant-cost steps.  Overflow bound: budget·w_micro <
    2^63 ⇒ budget·√n < 9.2e12 — holds for any real corpus/budget pair
    (1e12 docs, 1e6-unit budgets)."""
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    mass = (
        F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    ).cast("bigint")
    counts = (
        df.where(F.col(stratum_col).isNotNull())
        .groupBy(stratum_col)
        .agg(mass.alias("n"))
        .where(F.col("n") > 0)
    )
    nd = F.col("n").cast("double")
    powed = F.sqrt(nd) if tau == 0.5 else F.pow(nd, F.lit(float(tau)))
    counts = counts.withColumn(
        "_w", F.round(powed * 1e6).cast("bigint")
    )
    tot = counts.agg(
        F.sum("_w").alias("_wz"), F.sum("n").alias("_nz")
    )
    share = F.col("_w") * F.lit(int(budget))
    based = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("_base", F.expr("_w * CAST(%d AS BIGINT) div _wz" % int(budget)))
        .withColumn("_rem", share - F.col("_base") * F.col("_wz"))
    )
    spare = based.agg(
        (F.lit(int(budget)) - F.sum("_base")).alias("_spare")
    )
    w = Window.orderBy(F.desc("_rem"), F.asc(stratum_col))
    return (
        based.crossJoin(F.broadcast(spare))
        .withColumn("_rk", F.row_number().over(w))
        .select(
            stratum_col,
            "n",
            F.round(F.col("n").cast("double") / F.col("_nz").cast("double"), 6).alias(
                "p_raw"
            ),
            F.round(F.col("_w").cast("double") / F.col("_wz").cast("double"), 6).alias(
                "p_temp"
            ),
            (
                F.col("_base")
                + (F.col("_rk") <= F.col("_spare")).cast("bigint")
            ).alias("alloc"),
        )
    )


def per_stratum_cap(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum — the per-domain contribution
    cap every web-scale corpus applies so one giant domain cannot dominate
    the mixture.  Deterministic winners: the ``cap`` lowest
    ``(md5(id), id)`` per stratum, stable under task retries and
    re-ingestion (same contract as :func:`hash_sample`).

    Skew note — this is deliberately the PLAIN single-window form.
    Catalyst's rank-limit pushdown (``WindowGroupLimit``, on by default)
    inserts a *Partial* group-limit below the shuffle: every map task
    emits at most ``cap`` rows per stratum BEFORE the exchange, so a
    mega-domain contributes ≤ cap·n_map_tasks rows to its final sort
    partition — bounded — and the shuffle never carries the domain's
    bulk.  A hand-rolled salted two-phase ranking (tried first) produced
    the identical pruning plus one extra full exchange; the plan shape
    (Partial WindowGroupLimit under the Exchange) is pinned in
    tests/test_pipelineops.py so a regression in that optimization would
    fail loudly rather than silently un-bounding the sort.  Helper
    hash/rank columns are internal; the returned columns are ``df``'s own.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    c = F.col(id_col)
    h = md5_long(c.cast("string"))
    w = Window.partitionBy(stratum_col).orderBy("_cap_h", id_col)
    return (
        df.withColumn("_cap_h", h)
        .withColumn("_cap_r", F.row_number().over(w))
        .where(F.col("_cap_r") <= cap)
        .drop("_cap_h", "_cap_r")
    )


def write_training_shards(
    df: DataFrame,
    id_col: str,
    path: str,
    *,
    n_shards: int,
    seed: int = 42,
    mode: str = "overwrite",
) -> None:
    """Export the corpus as ``n_shards`` shard directories
    (``path/_shard=K/`` — Hive partition layout; the name contains ``=``
    so Hadoop/Spark listing does NOT hide the underscore-prefixed dirs)
    in deterministic training order — the final step between a prepared
    corpus and a data loader.

    Contract (all retry/re-run stable, seed-keyed):
    - shard assignment: ``md5(id:seed) mod n_shards`` — a pure function
      of the row's identity, so re-running the export (or a retried task)
      reproduces byte-identical shard membership; balanced in expectation
      by hash uniformity (≈N/n_shards ± √ noise).
    - within-shard order: rows are sorted by the independent
      :func:`shuffle_key` hex digest, giving each shard its own unbiased
      sub-permutation — a loader reading ``_shard=K`` front-to-back
      streams the seeded global order restricted to that shard.  The
      ``_shuffle_key`` column is PERSISTED on purpose: it is how a reader
      (and the ex1 driver oracle) can verify the stored order without
      re-deriving the hash — order certification is part of the export's
      contract, not an implementation leak.
    - one exchange total: rows repartition straight onto their shard
      (plus local sort); no global sort, no driver involvement.  A loader
      epoch over a different permutation is a new ``seed``, not a data
      rewrite.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    c = F.col(id_col)
    keyed = df.withColumn(
        "_shard",
        F.pmod(md5_long(F.concat(c.cast("string"), F.lit(f"#shard:{seed}"))),
               F.lit(n_shards)).cast("int"),
    ).withColumn("_shuffle_key", shuffle_key(id_col, seed))
    (
        keyed.repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_shuffle_key")
        .write.mode(mode)
        .partitionBy("_shard")
        .parquet(path)
    )


def session_safe_split(
    events: DataFrame,
    user_col: str,
    ts_us_col: str,
    id_col: str,
    *,
    cutoff_us: int,
    gap_us: int,
) -> DataFrame:
    """Temporal train/eval split that assigns whole SESSIONS, never rows:
    sessionize per user (``gap_us`` inactivity, the e2 lag+cumsum shape),
    then label every event by its session's bounds — session end ≤
    ``cutoff_us`` → ``train``, session start > ``cutoff_us`` → ``eval``,
    straddling sessions → ``quarantine``.

    Row-level time splits leak: a session crossing the cutoff puts a
    user's immediate future context into train (the behavioral twin of
    sp1's near-dup leakage — same contract, the LEAKAGE UNIT is assigned
    wholly or not at all).  Quarantine is explicit rather than silently
    assigned to either side.

    Returns ``(<id_col>, <user_col>, split)``.

    Scale shape: one hash shuffle on the user key for the sessionize
    window (state bounded by one user's history per task), one exchange
    on (user, session) for the bounds window — both narrow keyed
    shuffles; the cutoff is a plain literal so the labeling is a
    scan-speed projection.  No collects, no broadcasts."""
    from pyspark.sql import Window

    if gap_us <= 0:
        raise ValueError(f"gap_us must be > 0, got {gap_us}")
    w_order = Window.partitionBy(user_col).orderBy(ts_us_col, id_col)
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = events.withColumn(
        "_prev", F.lag(ts_us_col).over(w_order)
    ).withColumn(
        "_new",
        F.when(
            F.col("_prev").isNull()
            | (F.col(ts_us_col) - F.col("_prev") > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn("_sid", F.sum("_new").over(w_cum))
    w_sess = Window.partitionBy(user_col, "_sid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    bounded = sess.withColumn("_s0", F.min(ts_us_col).over(w_sess)).withColumn(
        "_s1", F.max(ts_us_col).over(w_sess)
    )
    split = (
        F.when(F.col("_s1") <= F.lit(int(cutoff_us)), F.lit("train"))
        .when(F.col("_s0") > F.lit(int(cutoff_us)), F.lit("eval"))
        .otherwise(F.lit("quarantine"))
    )
    return bounded.select(id_col, user_col, split.alias("split"))


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    *,
    eval_permille: int = 100,
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Train/eval split whose unit is the NEAR-DUP CLUSTER, not the row.

    A per-document hash split leaks: a document and its near-duplicate
    land on opposite sides ~2·p·(1-p) of the time, and the eval set then
    scores memorization.  Here the split key is the cluster id from
    :func:`operators.dedup.dedup_clusters` (or any (id, cluster) map),
    so every member of a near-dup cluster lands on the SAME side —
    ``split`` is a pure function of ``cluster_col`` (md5 bucket <
    ``eval_permille`` → 'eval'), deterministic under retries and
    engine-portable like every md5-threshold sampler in this module.

    ``clusters`` must carry columns ``(id, <cluster_col>)`` — the
    dedup_clusters output shape; rows of ``df`` joined on
    ``id_col == id`` (inner: d6 assigns every document a cluster, so
    nothing drops).  Returns df's columns + ``cluster_col`` + ``split``.

    Scale shape: one id-key equi-join against the cluster map + per-row
    column math — no extra shuffle beyond the join, nothing collects."""
    cl = clusters.select(
        F.col("id").alias(id_col), F.col(cluster_col)
    )
    return df.join(cl, id_col).withColumn(
        "split",
        F.when(
            hash_bucket(cluster_col) < eval_permille, F.lit("eval")
        ).otherwise(F.lit("train")),
    )
