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
keys behave like any window skew for the DEFAULT ``impl='keys'`` form —
but note that salting CANNOT be applied to a carry-forward window (the
carry must see every prior row), so a LOW-cardinality ``by`` (or the
global as-of, ``by=[]``) serializes onto one task per key.  That case is
exactly ``impl='range'``: range-partition the merged stream on the full
traversal order, run the same carry-forward window per (partition, key),
and stitch the cross-partition carry with a driver-side pass over the
P×K per-partition carry-outs — the distributed-prefix-sum shape
``operators/packing.pack_sequences`` uses, applied to last-non-null
instead of a running sum.  Every data-touching stage stays parallel; only
partition-count×keys summary rows visit the driver (use it when ``by`` is
low-cardinality — with millions of keys the default hash form is already
fully parallel and the stitch collect would be the new bottleneck).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from overturemaps_duckdb_spark.operators._util import materialize


def _orderable(dt) -> bool:
    """True when the type can appear in a sort key / struct comparison
    (everything except MapType, nested included)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


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
    impl: str = "keys",
    num_partitions: int | None = None,
) -> DataFrame:
    """Left as-of join: every `left` row plus the latest-at-or-before
    `right` row's `right_cols` (NULL when no right row precedes).

    `right_order` breaks timestamp ties (defaults to the first right col);
    `direction='forward'` matches the earliest right row at-or-after
    instead (implemented by negating the sort axis).

    ``impl``: 'keys' (default) = one window partition per `by` group;
    'range' = the range-partitioned + driver-stitched form for
    low-cardinality keys / the global ``by=[]`` as-of (see module doc) —
    results identical (pytest-pinned), only the physical parallelism
    changes.  ``num_partitions`` sizes the 'range' form (defaults to
    ``sparkContext.defaultParallelism``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction {direction!r}")
    if impl not in ("keys", "range"):
        raise ValueError(f"unsupported impl {impl!r}")
    order_col = right_order or right_cols[0]
    # NULL timestamps never match (documented contract): right rows with
    # NULL ts are unmatchable — drop them BEFORE the union, or they would
    # sort ahead of everything (ASC NULLS FIRST) and their payload would be
    # carried forward as a bogus match.  Known divergence: duckdb 1.0.0's
    # native ASOF treats NULL ts as sort sentinels instead (backward
    # NULL≈+inf — a NULL left matches the LARGEST right; forward
    # NULL≈-inf), measured in test_asof_randomized_differential_vs_duckdb;
    # unmatchable-NULL is the cleaner contract and is what we pin.
    # NULL-ts LEFT rows sort before any
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
        rpay_ord = F.col("_rpay").asc_nulls_first()
    else:
        ts_ord = F.col("_ats").desc_nulls_first()
        rord_ord = F.col("_rord").desc_nulls_first()
        rpay_ord = F.col("_rpay").desc_nulls_first()
    order = [ts_ord, F.col("_side").asc(), rord_ord]
    # Full (ts, order) ties resolve deterministically by the right
    # payload's struct order (r11) — previously unspecified, like the
    # reference's bare LIMIT.  Skipped when the payload holds an
    # unorderable type (map): those fall back to arbitrary tie order.
    if _orderable(r_tagged.schema["_rpay"].dataType):
        order.append(rpay_ord)

    if impl == "range":
        return _asof_range_stitch(
            merged, by, order, direction, right_cols, num_partitions
        )

    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1).select(
        F.col("_lpay.*"), *[F.col(f"_match.{c}").alias(f"r_{c}") for c in right_cols]
    )
    return out


def _asof_range_stitch(
    merged: DataFrame,
    by: list[str],
    order: list,
    direction: str,
    right_cols: list[str],
    num_partitions: int | None,
) -> DataFrame:
    """The low-key-cardinality scale form: range-partition the merged
    stream on the FULL traversal order, carry-forward per (partition,
    key), then stitch the cross-partition carry driver-side.

    Correctness: range partitioning in traversal order means partition
    ids ascend along the traversal (equal full sort keys land in one
    partition), so partition p's carry-in for a key is the carry-OUT of
    the nearest p' < p holding a right row for that key — exactly the
    value the single-window form would have carried across that
    boundary.  The per-(partition, key) carry-out is the traversal-LAST
    right row, computed as a struct max/min whose second field
    normalizes NULL tie-break order (NULL `_rord` must LOSE ties in both
    directions, while bare struct comparison sorts NULL fields first)."""
    spark = merged.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        merged.repartitionByRange(p, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
    )
    # freeze _pid between the carry-out collect and the final pass (the
    # pack_sequences precedent); the collect below is the materializing
    # action
    ranged = materialize(ranged, eager=False)
    w_local = (
        Window.partitionBy("_pid", *by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "_match", F.last("_rpay", ignorenulls=True).over(w_local)
    )
    # per-(pid, key) carry-out: the traversal-last right row
    rights = ranged.where(F.col("_side") == 0)
    if direction == "backward":
        pick = F.max(
            F.struct(
                F.col("_ats"),
                F.col("_rord").isNotNull().cast("int"),  # non-null wins max
                F.col("_rord"),
                F.col("_rpay"),
            )
        )
    else:
        pick = F.min(
            F.struct(
                F.col("_ats"),
                F.col("_rord").isNull().cast("int"),  # non-null wins min
                F.col("_rord"),
                F.col("_rpay"),
            )
        )
    outs = rights.groupBy("_pid", *by).agg(pick.alias("_best"))
    # driver stitch: carry-in of pid = nearest smaller pid's carry-out
    rows = outs.collect()
    rows.sort(key=lambda r: r["_pid"])
    carry_in: list[tuple] = []
    running: dict[tuple, object] = {}
    by_pid: dict[int, list] = {}
    for r in rows:
        by_pid.setdefault(r["_pid"], []).append(r)
    # every pid needs a carry-in row — including trailing partitions that
    # hold only left rows (they still inherit the last right seen)
    for pid in range(p):
        for key, pay in running.items():
            carry_in.append((pid, *key, pay))
        for r in by_pid.get(pid, ()):  # update AFTER emitting carry-in
            running[tuple(r[c] for c in by)] = r["_best"]["_rpay"]
    if carry_in:
        schema = (
            local.select(
                F.col("_pid"), *[F.col(c) for c in by], F.col("_rpay").alias("_cin")
            ).schema
        )
        cin = spark.createDataFrame(carry_in, schema)
        local = local.join(
            F.broadcast(cin),
            [local["_pid"].eqNullSafe(cin["_pid"])]
            + [local[c].eqNullSafe(cin[c]) for c in by],
            "left",
        ).drop(cin["_pid"], *[cin[c] for c in by])
        match = F.coalesce(F.col("_match"), F.col("_cin"))
    else:
        match = F.col("_match")
    return local.where(F.col("_side") == 1).select(
        F.col("_lpay.*"),
        *[match.getField(c).alias(f"r_{c}") for c in right_cols],
    )
