"""Layout tests: grid partition pruning must show up in the PLAN
(PartitionFilters), bucketed joins must plan without an Exchange on the
bucketed side."""

from __future__ import annotations

import contextlib
import io
import tempfile

import pyspark.sql.functions as F

from overturemaps_duckdb_spark.sources.layout import (
    read_grid_bbox,
    write_bucketed,
    write_grid_partitioned,
)
from tests.conftest import SF_SMOKE


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue()


def test_grid_partition_pruning(spark):
    from overturemaps_duckdb_spark.queries.spatial import customer_points

    pts = customer_points(spark, SF_SMOKE).select(
        "id", "centroid_lon", "centroid_lat"
    )
    path = tempfile.mkdtemp(prefix="omds_grid_") + "/pts"
    write_grid_partitioned(pts, path, cell_deg=30.0)

    bbox = (-130.0, -60.0, -100.0, 60.0)
    df = read_grid_bbox(spark, path, bbox, cell_deg=30.0)
    plan = _explain(df)
    # the cell predicates must land in PartitionFilters (plan-time pruning),
    # not in the post-scan Filter
    assert "PartitionFilters: [" in plan
    assert "cx" in plan.split("PartitionFilters:")[1].split("]")[0]

    expected = pts.where(
        (F.col("centroid_lon") >= bbox[0]) & (F.col("centroid_lon") <= bbox[2])
        & (F.col("centroid_lat") >= bbox[1]) & (F.col("centroid_lat") <= bbox[3])
    )
    got = sorted(r["id"] for r in df.collect())
    want = sorted(r["id"] for r in expected.collect())
    assert got == want and len(got) > 0


def test_bucketed_join_avoids_shuffle(spark):
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    root = tempfile.mkdtemp(prefix="omds_bucket_")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            c, "bkt_customer", bucket_cols=["c_custkey"], n_buckets=4,
            sort_cols=["c_custkey"], path=f"{root}/c",
        )
        write_bucketed(
            o.withColumnRenamed("o_custkey", "c_custkey"), "bkt_orders",
            bucket_cols=["c_custkey"], n_buckets=4, sort_cols=["c_custkey"],
            path=f"{root}/o",
        )
        joined = spark.table("bkt_customer").join(
            spark.table("bkt_orders"), "c_custkey"
        )
        plan = _explain(joined)
        phys = plan.split("== Physical Plan ==")[1]
        # co-bucketed sort-merge join: no Exchange on either side
        assert "SortMergeJoin" in phys
        assert "Exchange hashpartitioning" not in phys
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_customer")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
