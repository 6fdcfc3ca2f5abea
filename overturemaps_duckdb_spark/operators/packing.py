"""Sequence packing: assign documents to fixed-token-budget training
sequences — the step between a cleaned corpus and a dataloader.

Assignment rule (deterministic, order-based): documents are taken in
`order_col` order; a document whose preceding cumulative token count is
`c` lands in sequence `c // budget` at offset `c - seq_id * budget`.
(Chunked packing: a document may straddle a boundary and spill into the
next sequence — the dataloader's concat-and-split convention, as used for
GPT-style pretraining corpora.)

Scale shape — the distributed prefix sum: a single global window
(`Window.orderBy(...)` with no partition) collapses to ONE task and is the
canonical Spark anti-pattern.  Instead:

1. range-partition by the order column and sort within partitions;
2. per-partition running sums via a window PARTITIONED by
   `spark_partition_id()` (parallel, partition-local);
3. per-partition totals — one row per partition — come to the driver,
   their exclusive prefix sums go back as a tiny broadcast join.

Step 3 moves P rows (P = #partitions), never data rows; every data-touching
stage is fully parallel.  This is the same two-pass scan a GPU prefix-sum
uses, expressed as DataFrame ops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from overturemaps_duckdb_spark.operators._util import materialize


def pack_sequences(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """(all df columns) + seq_id, offset — chunked packing by weight.

    `weight_col` must be non-negative (token counts).  Output is
    independent of `num_partitions`: range boundaries only decide WHERE the
    prefix sums are stitched, not their values.

    `order_col` must be a TOTAL order (unique values — e.g. a document
    id): tied keys would make each tied row's running sum depend on the
    arbitrary within-tie ordering, so assignments would stop being
    deterministic.  `budget` must be positive (r12 review: `DIV 0`
    evaluates to NULL, which silently NULLed every seq_id instead of
    failing)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(p, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # materialize (checkpoint), not persist(): the _pid assignment must be
    # frozen between the totals collect and the final pass, but a persist
    # here was never unpersisted — the CacheManager pinned one cached plan
    # per call for the application lifetime.  Checkpoint blocks are
    # reclaimed by the ContextCleaner once the result is unreferenced.
    # eager=False: the totals collect below is the materializing action.
    local = materialize(
        ranged.withColumn("_lcum", F.sum(F.col(weight_col)).over(w)),
        eager=False,
    )
    # one row per partition → driver; exclusive prefix back as a broadcast
    totals = sorted(
        (r["_pid"], r["_tot"])
        for r in local.groupBy("_pid").agg(F.sum(F.col(weight_col)).alias("_tot")).collect()
    )
    run, offsets = 0, []
    for pid, tot in totals:
        offsets.append((pid, run))
        run += tot
    off = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _poff long")
    # integer DIV, not float division: (before / budget).cast('long')
    # routed the prefix sum through a DOUBLE, losing exactness once
    # cumulative token counts approach 2^53 (weights are non-negative, so
    # truncating DIV == floor and values below 2^53 are unchanged).
    out = (
        local.join(F.broadcast(off), "_pid")
        .withColumn(
            "_before",
            (F.col("_poff") + F.col("_lcum") - F.col(weight_col)).cast("long"),
        )
        .withColumn("seq_id", F.expr(f"_before DIV {int(budget)}"))
        .withColumn("offset", F.col("_before") - F.col("seq_id") * int(budget))
        .drop("_pid", "_lcum", "_poff", "_before")
    )
    return out
