"""Table profiling: per-column statistics in ONE scan (the engine analog of
DuckDB's ``SUMMARIZE <table>``, which the reference's free-form SQL console
accepts like any other statement — src/react/SqlQueryPanel.jsx runs whatever
the user types).

Shape: a single aggregate computes (count, distinct, min, max) for every
column simultaneously — one pass over the data, one reduce to a single row —
then a ``stack`` pivots that row into one output row per column.  Nothing
about the profile is per-row Python; the whole thing is codegen aggregates.

Scale note: exact ``count(DISTINCT c)`` per column plans an Expand (one
duplicated stream per distinct aggregate).  At 100 TB swap
``approx_count_distinct`` in via ``exact_distinct=False`` — HyperLogLog++
partial-aggregates map-side like any algebraic agg, no Expand — and accept
±2% on the distinct column only (the driver's hash-compare oracle needs the
exact form, so that is the default here).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """(column_name, column_type, n_rows, n_null, n_distinct, min_v, max_v)
    — one row per profiled column, min/max surfaced as strings so every
    column fits one schema."""
    cols = columns or df.columns
    types = dict(df.dtypes)
    nd = F.countDistinct if exact_distinct else F.approx_count_distinct
    # Backtick-quoted references everywhere a name enters parsed text:
    # SUMMARIZE-any-table means arbitrary column names — a space, dash, or
    # dot in a name broke the generated expression (F.count('a.b')
    # resolved as struct-field access, '_cnt_min zoom' failed to parse).
    def bq(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        lit_col = F.col(bq(c))  # literal-name lookup, dots not parsed
        aggs += [
            F.count(lit_col).alias(f"_cnt_{c}"),
            nd(lit_col).alias(f"_nd_{c}"),
            F.min(lit_col).cast("string").alias(f"_min_{c}"),
            F.max(lit_col).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)

    stacked = ", ".join(
        f"'{c.replace(chr(39), chr(39) * 2)}', '{types[c]}', "
        f"_n - {bq(f'_cnt_{c}')}, {bq(f'_nd_{c}')}, "
        f"{bq(f'_min_{c}')}, {bq(f'_max_{c}')}"
        for c in cols
    )
    return row.select(
        "_n",
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(column_name, column_type, n_null, n_distinct, min_v, max_v)"
        ),
    ).select(
        "column_name",
        "column_type",
        F.col("_n").cast("bigint").alias("n_rows"),
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_v",
        "max_v",
    )
