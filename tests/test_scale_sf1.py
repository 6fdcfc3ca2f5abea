"""Opt-in 10× scale smoke (the checks that would have caught round 4's
three scale defects — BNLJ routing, LSH candidate duplication, driver
heap — automatically).

Skipped unless `benchdata/sf1` exists or SPARK_GRAFT_SCALE_TEST=1 (which
generates it via tools/make_scaled_fixture.py, ~30 s).  Run explicitly:

    SPARK_GRAFT_SCALE_TEST=1 python -m pytest tests/test_scale_sf1.py -q
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(_REPO, "benchdata", "sf1")


def _available() -> bool:
    if os.path.isdir(SF1):
        return True
    if os.environ.get("SPARK_GRAFT_SCALE_TEST"):
        subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools", "make_scaled_fixture.py")],
            check=True,
        )
        return True
    return False


pytestmark = pytest.mark.skipif(
    not _available(), reason="sf1 fixture absent (set SPARK_GRAFT_SCALE_TEST=1)"
)


@pytest.fixture(scope="module")
def q():
    from overturemaps_duckdb_spark import queries as _q

    _q.load_all()
    return _q.QUERIES


def test_spatial_routes_grid_at_sf1(spark, q):
    """At sf1 the pair product exceeds the BNLJ budget: the auto route
    must NOT plan a nested loop (the 9.7 s-vs-1.1 s defect)."""
    from overturemaps_duckdb_spark.operators.spatial_join import spatial_join
    from overturemaps_duckdb_spark.queries.spatial import (
        customer_points,
        supplier_boxes,
    )

    df = spatial_join(
        customer_points(spark, SF1), supplier_boxes(spark, SF1),
        how="inner", predicate="intersects",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_headline_queries_complete_at_sf1(spark, q):
    """A representative slice must simply finish at 10× — covers the
    candidate-duplication and heap classes of defect.  d2 itself is
    deliberately absent (minutes-scale on the 10×-dup corpus — its scale
    behavior is measured in bench/BENCH_COMPARE.md); d3 stands in for the
    dedup family here."""
    for name in (
        "q1_pricing_summary",
        "j1_spatial_intersect_join",
        "j2_semi_join_within",
        "d3_simhash_buckets",
        "e4_grouped_quantiles",
    ):
        df = q[name](spark, SF1)
        df.write.format("noop").mode("overwrite").save()
