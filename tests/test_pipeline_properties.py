"""Property-based compiler check: for arbitrary bbox/limit/search inputs,
compile_pipeline's union-only output must equal an independently-built
expectation (per-source deterministic sample → union → bbox → order →
limit).  Catches mode-rule regressions the fixed pl* oracles can't."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from overturemaps_duckdb_spark.plans.pipeline import compile_pipeline
from overturemaps_duckdb_spark.queries.pipeline import SRC_C, SRC_S, catalog_cs
from tests.conftest import SF_SMOKE

lon = st.floats(min_value=-180, max_value=180, allow_nan=False)
lat = st.floats(min_value=-90, max_value=90, allow_nan=False)


@pytest.fixture(scope="module")
def ctx(spark):
    cat = catalog_cs(spark, SF_SMOKE)
    # collect both themes once; the expectation is computed in plain Python
    rows = {}
    for name in ("theme_customer", "theme_supplier"):
        rows[name] = [
            (r["id"], r["centroid_lon"], r["centroid_lat"])
            for r in cat.tables[name]
            .select("id", "centroid_lon", "centroid_lat")
            .collect()
        ]
    return cat, rows


@given(
    x1=lon, x2=lon, y1=lat, y2=lat,
    limit=st.integers(min_value=1, max_value=400),
)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_union_bbox_limit_property(ctx, x1, x2, y1, y2, limit):
    cat, rows = ctx
    xmin, xmax = sorted((x1, x2))
    ymin, ymax = sorted((y1, y2))

    df = compile_pipeline(
        cat, [SRC_C, SRC_S], bbox=(xmin, ymin, xmax, ymax), limit=limit
    )
    got = [r["id"] for r in df.select("id").collect()]

    per_source = math.ceil(limit / 2)
    expected = []
    for name, key in (("theme_customer", None), ("theme_supplier", None)):
        sample = sorted(rows[name], key=lambda r: r[0])[:per_source]
        expected.extend(
            rid for rid, lo, la in sample
            if xmin <= lo <= xmax and ymin <= la <= ymax
        )
    expected = sorted(expected)[:limit]
    assert got == expected
