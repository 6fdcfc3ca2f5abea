"""Targeted hot-cell salting for the spatial grid join: results must be
identical with and without the salt, and the salt key must actually enter
the join so a monster cell's candidates spread across shards."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from overturemaps_duckdb_spark.operators.spatial_join import banded_join


def _skewed_frames(spark):
    """One downtown cell holding 300 of 400 points per side, the rest
    scattered — the planetary-skew shape."""
    rng = random.Random(19)
    rows_a, rows_b = [], []
    for i in range(400):
        if i < 300:  # hot cell around (10.05, 20.05) at band 0.2
            lon = 10.0 + rng.random() * 0.1
            lat = 20.0 + rng.random() * 0.1
        else:
            lon = rng.uniform(-150, 150)
            lat = rng.uniform(-60, 60)
        rows_a.append((i, lon, lat))
        if i % 7 == 0 and i >= 300:
            # leave some scattered a-rows unmatched (anti-join fodder):
            # their b twin goes to the antipode
            rows_b.append((1000 + i, -lon, -lat))
        else:
            rows_b.append((1000 + i, lon + rng.uniform(-0.05, 0.05),
                           lat + rng.uniform(-0.05, 0.05)))
    schema = "id long, centroid_lon double, centroid_lat double"
    return (
        spark.createDataFrame(rows_a, schema),
        spark.createDataFrame(rows_b, schema),
    )


@pytest.mark.parametrize("how", ["inner", "left_semi", "left_anti"])
def test_salted_matches_unsalted(spark, how):
    a, b = _skewed_frames(spark)
    plain = banded_join(a, b, band_deg=0.2, how=how)
    salted = banded_join(
        a, b, band_deg=0.2, how=how, hot_cell_threshold=50, n_salts=4
    )
    if how == "inner":
        key = lambda r: (r["id"], r[3])  # a.id, b.id (positional: both named id)
        p = sorted((r[0], r[3]) for r in plain.collect())
        s = sorted((r[0], r[3]) for r in salted.collect())
    else:
        p = sorted(r["id"] for r in plain.collect())
        s = sorted(r["id"] for r in salted.collect())
    assert s == p and len(p) > 0
    if how == "inner":
        assert len(s) == len(set(s))  # exactly-one-(cell,salt) per pair


def test_salt_key_in_join_condition(spark):
    a, b = _skewed_frames(spark)
    salted = banded_join(
        a, b, band_deg=0.2, how="inner", hot_cell_threshold=50, n_salts=4
    )
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "_asalt" in plan and "_bsalt" in plan
    # the hot-cell list is broadcast, never shuffled
    exec_plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in exec_plan
    assert "CartesianProduct" not in exec_plan


def test_semi_anti_null_id_row_roundtrips(spark):
    """r8 review fix: the matched-id re-join used plain equality, so a
    NULL-id row that spatially MATCHED was returned by the anti join
    (and dropped by semi) — NULL == NULL is never true.  eqNullSafe
    round-trips the lone NULL id correctly (unique-id precondition
    documented on spatial_join)."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.functions.geo import st_point
    from overturemaps_duckdb_spark.operators.spatial_join import spatial_join

    a = spark.createDataFrame(
        [(None, 0.0, 0.0), (1, 50.0, 50.0)], "id int, lon double, lat double"
    ).select("id", st_point("lon", "lat").alias("geometry"),
             F.col("lon").alias("centroid_lon"), F.col("lat").alias("centroid_lat"))
    b = spark.createDataFrame(
        [(100, 0.0, 0.0)], "id int, lon double, lat double"
    ).select("id", st_point("lon", "lat").alias("geometry"),
             F.col("lon").alias("centroid_lon"), F.col("lat").alias("centroid_lat"))

    semi = spatial_join(a, b, how="left_semi", distance_m=1000.0,
                        broadcast_b=True, assume_points=True)
    anti = spatial_join(a, b, how="left_anti", distance_m=1000.0,
                        broadcast_b=True, assume_points=True)
    assert [r["id"] for r in semi.collect()] == [None]  # NULL-id row matched
    assert [r["id"] for r in anti.collect()] == [1]     # far row is the miss
