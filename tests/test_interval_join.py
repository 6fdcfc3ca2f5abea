"""interval_band_join: the 1-D theta-join analog of the spatial grid
router — both physical forms must agree exactly, and the bucketed form
must never degenerate to a nested loop."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from overturemaps_duckdb_spark.operators.interval_join import interval_band_join


def _frames(spark):
    a = spark.createDataFrame(
        [(i, float(i) * 0.37 % 13.0) for i in range(400)], "a_id long, x double"
    )
    b = spark.createDataFrame(
        [(j, float(j) * 0.61 % 13.0) for j in range(300)], "b_id long, y double"
    )
    return a, b


@pytest.mark.parametrize("how", ["inner", "left_semi", "left_anti"])
def test_grid_matches_broadcast(spark, how):
    a, b = _frames(spark)
    kw = dict(width=0.25, how=how)
    fast = interval_band_join(a, b, "x", "y", broadcast_b=True, **kw)
    grid = interval_band_join(a, b, "x", "y", broadcast_b=False, **kw)
    key = (lambda r: (r["a_id"], r["b_id"])) if how == "inner" else (lambda r: r["a_id"])
    assert sorted(map(key, grid.collect())) == sorted(map(key, fast.collect()))
    # inner grid form must not emit duplicate pairs (each true pair
    # co-occurs in exactly one bucket)
    if how == "inner":
        rows = [key(r) for r in grid.collect()]
        assert len(rows) == len(set(rows)) and len(rows) > 0


def test_grid_plan_is_equi_join(spark):
    a, b = _frames(spark)
    plan = interval_band_join(
        a, b, "x", "y", width=0.25, broadcast_b=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_extra_cond_in_semi_predicate(spark):
    a, b = _frames(spark)
    # exclude b rows with matching parity — must be part of EXISTS, so the
    # semi result differs from filtering afterwards
    cond = (F.col("a_id") % 2) == (F.col("b_id") % 2)
    for bc in (True, False):
        out = interval_band_join(
            a, b, "x", "y", width=0.25, how="left_semi",
            extra_cond=cond, broadcast_b=bc,
        )
        plain = interval_band_join(
            a, b, "x", "y", width=0.25, how="left_semi", broadcast_b=bc
        )
        assert out.count() <= plain.count()


def test_shared_column_names_rejected(spark):
    a, _ = _frames(spark)
    with pytest.raises(ValueError):
        interval_band_join(a, a, "x", "x", width=0.1)


def test_bucket_coverage_property():
    """The ±1-neighbor-bucket expansion must cover every true pair:
    |x − y| < w ⟹ floor(y/w) ∈ {floor(x/w) − 1, .., + 1}.  Pure IEEE-754
    double math — identical rounding to the JVM columns — over widths and
    magnitudes spanning money-style and geo-style values."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    vals = st.floats(
        min_value=-1e7, max_value=1e7, allow_nan=False, allow_infinity=False
    )
    widths = st.sampled_from([0.5, 1.5, 0.25, 0.2, 0.001, 3.0, 7.25])
    deltas = st.floats(min_value=-1.0, max_value=1.0, exclude_min=True,
                       allow_nan=False, allow_infinity=False)

    @given(vals, deltas, widths)
    @settings(max_examples=2000, deadline=None)
    def check(x, frac, w):
        y = x + frac * w
        if not abs(x - y) < w:  # float rounding can push |Δ| to exactly w
            return
        bx, by = math.floor(x / w), math.floor(y / w)
        assert abs(bx - by) <= 1

    check()
