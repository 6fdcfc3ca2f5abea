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
