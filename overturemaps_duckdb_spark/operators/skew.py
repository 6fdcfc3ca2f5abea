"""Skew-aware aggregation: salting for hot keys (SURVEY §4 scale notes).

AQE's skew-join splitting handles joins, but a `groupBy` whose aggregate
state is heavy (collect_list/collect_set, exact distinct) still funnels a
hot key into one task.  Salting splits each key into `n_salts` subkeys,
aggregates partially per subkey, then merges — two small shuffles instead
of one task-killing shuffle.

Only algebraic (re-aggregable) functions can ride this path; the helpers
below cover the common cases (sum/count/min/max, distinct-count via set
union, collect_set)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted(
    df: DataFrame,
    n_salts: int = 16,
    salt_col: str = "_salt",
    *,
    unique_col: str | None = None,
) -> DataFrame:
    """Per-row salt without RNG.

    Preferred form: pass ``unique_col`` (any column unique per row — a
    primary key, event id, file+offset) and the salt is
    ``pmod(xxhash64(unique_col), n_salts)`` — a pure function of row
    CONTENT, so a retried/recomputed task reassigns every row the exact
    same salt no matter how the scan or an upstream shuffle reorders its
    partition, and identical-payload rows still spread (their ids differ).
    The column should be NON-NULL: ``xxhash64(NULL)`` passes the seed
    through unchanged, so every NULL-id row would share ONE constant salt
    — if the hot key's rows have NULL ids, the entire population funnels
    into a single stage-1 task, recreating exactly the hot spot this
    function exists to avoid (ADVICE r09).  NULL ids therefore fall back
    PER ROW to the position-id hash, restoring the spread at the cost of
    the SPARK-23207 recompute-stability caveat below for those rows only.

    Fallback (no ``unique_col``): xxhash64 over the row's hashable
    columns plus ``monotonically_increasing_id()``.  Two properties over
    hashing the columns alone: (1) xxhash64 rejects MapType columns
    (common in Overture schemas — names/sources), so those are skipped
    rather than erroring; (2) a hot key whose rows are IDENTICAL across
    all columns — the exact heavy-state case salting targets — would
    hash to ONE salt; the position id spreads them.  CAVEAT (the reason
    ``unique_col`` exists): the position id is ORDER-based, so if the
    input sits downstream of a shuffle whose intra-partition order is
    not stable across recomputation, a retried stage-1 task can assign
    rows different salts than the original attempt — the SPARK-23207
    class of lost/duplicated partial rows.  The fallback is therefore
    only safe on deterministic inputs (a direct file scan, or anything
    whose lineage replays in identical order); when the input has been
    shuffled, pass ``unique_col``."""
    if unique_col is not None:
        salt_src = F.when(
            F.col(unique_col).isNull(),
            F.xxhash64(F.monotonically_increasing_id()),
        ).otherwise(F.xxhash64(F.col(unique_col)))
        return df.withColumn(
            salt_col, F.pmod(salt_src, F.lit(n_salts)).cast("int")
        )
    hashable = [
        f.name
        for f in df.schema.fields
        if not f.dataType.simpleString().startswith("map<")
    ]
    return df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(*hashable, F.monotonically_increasing_id()),
            F.lit(n_salts),
        ).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    *,
    n_salts: int = 16,
    unique_col: str | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    `aggs` maps output column → (partial aggregate over raw rows, final
    re-aggregate over the partials, where the partial is exposed under the
    output name).  Example::

        salted_agg(df, ["k"], {
            "n":   (F.count("*"),      F.sum("n")),
            "mx":  (F.max("v"),        F.max("mx")),
        })

    Pass ``unique_col`` whenever the input sits downstream of a shuffle —
    see :func:`salted` for the retry-determinism caveat of the fallback.
    """
    stage1 = (
        salted(df, n_salts, unique_col=unique_col)
        .groupBy(*keys, "_salt")
        .agg(*[p.alias(name) for name, (p, _f) in aggs.items()])
    )
    return stage1.groupBy(*keys).agg(
        *[f.alias(name) for name, (_p, f) in aggs.items()]
    )


def salted_distinct_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    n_salts: int = 16,
    unique_col: str | None = None,
) -> DataFrame:
    """Exact distinct-count per key without a single-task hot spot: per-salt
    distinct first (cuts duplicates early), then a plain distinct-count over
    the pre-shrunk rows.  This path tolerates retry-salt instability better
    than salted_agg (dropDuplicates is idempotent under re-salting only if
    duplicates land together, so the same :func:`salted` caveat applies —
    pass ``unique_col`` for shuffled inputs)."""
    cols = [*keys, value_col] + (
        [unique_col] if unique_col and unique_col not in (*keys, value_col) else []
    )
    pre = (
        salted(df.select(*cols), n_salts, unique_col=unique_col)
        .select(*keys, value_col, "_salt")
        .dropDuplicates([*keys, value_col, "_salt"])
    )
    return pre.groupBy(*keys).agg(
        F.countDistinct(value_col).alias(f"n_distinct_{value_col}")
    )


def skew_report(
    df: DataFrame,
    keys: list[str],
    *,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """One-row key-distribution diagnosis for a prospective join/agg key —
    the measurement step BEFORE choosing broadcast / salting / AQE on an
    unfamiliar dataset: total rows, distinct keys, the hottest key's row
    count, exact percentiles of per-key row counts, and the skew ratio
    (max key size over mean key size — ≈1 uniform, ≫1 needs a strategy).

    Shape: one map-side-combinable count shuffle onto the keys, then a
    single-row stats pass over the per-key counts plus a TakeOrdered(1)
    for the hottest key (deterministic tie-break: max rows, then min
    key).  The counts frame is iterated twice — at 100 TB persist it (or
    write it out) if you also want the top-N offender list; the counts
    relation is |distinct keys| rows, already reduced from the data.

    Percentiles are exact (``percentile``, linear interpolation), not
    approximate — the counts relation is small by construction, and exact
    values are engine-portable for the oracle."""
    # name from the RAW percentile (dot → underscore), never rounded:
    # round(p*100) would mislabel 0.999 as p100_key_rows (a lie, not a
    # collision — the collision check can't catch it).  Fixed-point %.12f
    # with trailing zeros stripped (ADVICE r05), NOT %g: %g emits
    # exponent notation for tiny percentiles (p=1e-9 → "1e-07" → a name
    # containing '-' that needs backtick quoting in SQL consumers); .12f
    # keeps names in [A-Za-z0-9_] always, still absorbs the float-noise
    # tail of p*100 (0.07*100 → "7", 0.999*100 → "99.9"), and preserves
    # the r5 names unchanged (p99_9_key_rows, p99_999951_key_rows).
    names = [
        "p{}_key_rows".format(
            f"{p * 100:.12f}".rstrip("0").rstrip(".").replace(".", "_")
        )
        for p in percentiles
    ]
    if len(set(names)) != len(names):
        raise ValueError(f"percentiles collide after naming: {percentiles}")
    n = F.col("n")
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    stats = counts.agg(
        F.sum(n).cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max(n).cast("bigint").alias("max_key_rows"),
        *[
            F.expr(f"percentile(n, {p})").alias(name)
            for p, name in zip(percentiles, names)
        ],
    ).withColumn(
        "skew_ratio",
        F.col("max_key_rows")
        / (F.col("n_rows").cast("double") / F.col("n_keys")),
    )
    hot = (
        counts.orderBy(F.desc("n"), *[F.asc(k) for k in keys])
        .limit(1)
        .select(
            *[F.col(k).alias(f"hot_{k}") for k in keys],
            n.cast("bigint").alias("hot_rows"),
        )
    )
    return stats.crossJoin(F.broadcast(hot))


def iterate_batches(df: DataFrame, batch_size: int = 500):
    """S12 — the render sink's row-batch iteration (themes.js:181-193,
    pipelineRunner.js:120-131): yield lists of Rows without materializing
    the full result on the driver (`toLocalIterator` streams partitions)."""
    batch: list = []
    for row in df.toLocalIterator():
        batch.append(row)
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch
