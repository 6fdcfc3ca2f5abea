"""As-of join — the time-series operator Spark's join set lacks (the task
brief's canonical example of a custom operator; DuckDB ships it natively as
ASOF JOIN).

Semantics (direction='backward', the common case): for every left row,
attach the single right row with the greatest right timestamp ≤ the left
timestamp within the same key group — "the latest quote at or before each
trade".  Ties on the timestamp are broken by the largest `right_order`
value, so results are deterministic.

Scale shape: the naive formulations are a range theta-join (quadratic
blowup per key) or a per-row correlated subquery (driver loop).  The
distributed-correct form used here is union-merge + carry-forward:

1. tag both sides and union them on (keys, ts) — ONE shuffle, on the key;
2. a window sorted by (ts, side, order) runs `last(right_payload,
   ignorenulls=True)` so every left row sees the most recent right row
   that sorts at-or-before it;
3. filter back to left rows.

Each key group is processed in one pass of a sorted stream — the same merge
a single-node engine does, but per key partition across executors.  Skewed
keys behave like any window skew (AQE/salting applies).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    *,
    right_order: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every `left` row plus the latest-at-or-before
    `right` row's `right_cols` (NULL when no right row precedes).

    `right_order` breaks timestamp ties (defaults to the first right col);
    `direction='forward'` matches the earliest right row at-or-after
    instead (implemented by negating the sort axis).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction {direction!r}")
    order_col = right_order or right_cols[0]
    # NULL timestamps never match (DuckDB ASOF semantics): right rows with
    # NULL ts are unmatchable — drop them BEFORE the union, or they would
    # sort ahead of everything (ASC NULLS FIRST) and their payload would be
    # carried forward as a bogus match.  NULL-ts LEFT rows sort before any
    # (non-null) right row in both directions below, so they correctly get
    # a NULL match while still appearing in the output (left join).
    right = right.where(F.col(right_ts).isNotNull())
    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"),
        F.lit(None).cast(dict(right.dtypes)[order_col]).alias("_rord"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in right_cols)
            + ">"
        )
        .alias("_rpay"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_lpay"].dataType.simpleString()).alias(
            "_lpay"
        ),
        F.col(order_col).alias("_rord"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rpay"),
    )
    merged = r_tagged.unionByName(l_tagged)
    # Direction is the SORT AXIS, not a sign multiply — `ts * sign` crashed
    # on TimestampType even for backward, and casting the order column to
    # long corrupted double/string tie-breaks.  Right rows sort before left
    # rows at equal ts (side 0 < 1) → "≤"/"≥" match; among equal-ts right
    # rows, backward carries the largest order value, forward the smallest
    # (the old negate-then-asc semantics, kept).  NULLS FIRST on both axes:
    # a NULL-ts left row matches nothing; a NULL order value loses ties.
    if direction == "backward":
        ts_ord, rord_ord = F.col("_ats").asc(), F.col("_rord").asc_nulls_first()
    else:
        ts_ord = F.col("_ats").desc_nulls_first()
        rord_ord = F.col("_rord").desc_nulls_first()
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_ord, F.col("_side").asc(), rord_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1).select(
        F.col("_lpay.*"), *[F.col(f"_match.{c}").alias(f"r_{c}") for c in right_cols]
    )
    return out
