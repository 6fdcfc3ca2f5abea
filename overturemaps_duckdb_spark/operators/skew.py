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


def salted(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt (hash-based, no RNG → retries/replays
    produce identical partitioning)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    `aggs` maps output column → (partial aggregate over raw rows, final
    re-aggregate over the partials, where the partial is exposed under the
    output name).  Example::

        salted_agg(df, ["k"], {
            "n":   (F.count("*"),      F.sum("n")),
            "mx":  (F.max("v"),        F.max("mx")),
        })
    """
    stage1 = (
        salted(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(*[p.alias(name) for name, (p, _f) in aggs.items()])
    )
    return stage1.groupBy(*keys).agg(
        *[f.alias(name) for name, (_p, f) in aggs.items()]
    )


def salted_distinct_count(
    df: DataFrame, keys: list[str], value_col: str, *, n_salts: int = 16
) -> DataFrame:
    """Exact distinct-count per key without a single-task hot spot: per-salt
    distinct first (cuts duplicates early), then a plain distinct-count over
    the pre-shrunk rows."""
    pre = (
        salted(df.select(*keys, value_col), n_salts)
        .select(*keys, value_col, "_salt")
        .dropDuplicates([*keys, value_col, "_salt"])
    )
    return pre.groupBy(*keys).agg(
        F.countDistinct(value_col).alias(f"n_distinct_{value_col}")
    )


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
