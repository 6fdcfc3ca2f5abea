"""Property-based tests (hypothesis): WKB kernel roundtrips, geometry math
invariants, URL-codec identity, instrumentation ring buffer (Y3)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from overturemaps_duckdb_spark.functions import wkb
from overturemaps_duckdb_spark.state import decode_url_state, encode_url_state

finite = st.floats(
    min_value=-180.0, max_value=180.0, allow_nan=False, allow_infinity=False
)


@given(finite, finite)
@settings(max_examples=200, deadline=None)
def test_wkb_point_roundtrip(x, y):
    g = wkb.point(x, y)
    back = wkb.loads(wkb.dumps(g))
    assert back.kind == "POINT"
    bx, by = back.coords
    assert bx == x and by == y


@given(finite, finite, st.floats(min_value=0.001, max_value=10.0,
                                 allow_nan=False, allow_infinity=False))
@settings(max_examples=100, deadline=None)
def test_wkb_box_invariants(cx, cy, half):
    g = wkb.box(cx - half, cy - half, cx + half, cy + half)
    back = wkb.loads(wkb.dumps(g))
    assert wkb.geom_type(back) == "POLYGON"
    lon, lat = wkb.centroid(back)
    assert math.isclose(lon, cx, abs_tol=1e-9 * max(1, abs(cx)) + 1e-9)
    assert math.isclose(lat, cy, abs_tol=1e-9 * max(1, abs(cy)) + 1e-9)
    assert math.isclose(wkb.area(back), (2 * half) ** 2, rel_tol=1e-9)


@given(finite, finite, finite, finite)
@settings(max_examples=100, deadline=None)
def test_wkb_distance_symmetry(x1, y1, x2, y2):
    a, b = wkb.point(x1, y1), wkb.point(x2, y2)
    d1, d2 = wkb.distance(a, b), wkb.distance(b, a)
    assert d1 == d2 and d1 >= 0
    assert math.isclose(d1, math.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2),
                        rel_tol=1e-12, abs_tol=1e-12)


@given(finite, finite, st.floats(min_value=0.01, max_value=5.0,
                                 allow_nan=False, allow_infinity=False))
@settings(max_examples=100, deadline=None)
def test_point_in_box_intersects(cx, cy, half):
    boxg = wkb.box(cx - half, cy - half, cx + half, cy + half)
    inside = wkb.point(cx, cy)
    outside = wkb.point(cx + 3 * half, cy)
    assert wkb.intersects(inside, boxg)
    assert wkb.intersects(boxg, inside)  # symmetric
    assert not wkb.intersects(outside, boxg)


json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=40),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=10), children, max_size=4),
    ),
    max_leaves=12,
)


@given(st.dictionaries(st.text(max_size=12), json_values, max_size=6))
@settings(max_examples=150, deadline=None)
def test_url_codec_identity(state):
    token = encode_url_state(state)
    assert token.isascii()
    assert decode_url_state(token) == state


@given(st.text(max_size=80))
@settings(max_examples=100, deadline=None)
def test_url_codec_never_raises_on_garbage(garbage):
    out = decode_url_state(garbage)
    assert out is None or isinstance(out, dict)


def test_query_runner_ring_buffer(spark):
    """Y3 — label + 140-char preview + ms + ok/err, capped at 20
    (queryRunner.js:14-55)."""
    from overturemaps_duckdb_spark.session import HISTORY_CAP, QueryRunner

    qr = QueryRunner()
    for i in range(25):
        qr.run_sql(spark, f"SELECT {i} AS v", label=f"q{i}")
    assert len(qr.history) == HISTORY_CAP
    assert qr.history[-1].label == "q24" and qr.history[-1].ok
    long_sql = "SELECT " + ", ".join(f"{i} AS c{i}" for i in range(100))
    qr.run_sql(spark, long_sql, label="wide")
    assert len(qr.history[-1].preview) <= 140
    try:
        qr.run_sql(spark, "SELECT * FROM definitely_missing_table", label="bad")
    except Exception:
        pass
    assert not qr.history[-1].ok and qr.history[-1].error


def test_char_ngrams_shape_and_edges(spark):
    """char_ngrams must stay the zip_with-chain form: the substring-over-
    sequence form re-evaluated normalize() once PER CHARACTER inside the
    lambda (O(len²) per doc — a 187 s full-corpus fingerprint pass at the
    10× fixture vs ~18 s with this shape).  Also pin the short/empty/NULL
    edge semantics the fingerprint oracles rely on."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.functions.text import char_ngrams

    expr = str(char_ngrams(F.col("s"), 3)._jc)
    assert "zip_with" in expr
    assert "sequence(" not in expr

    rows = spark.createDataFrame(
        [("abcdef",), ("ab",), ("",), (None,)], "s string"
    ).select(char_ngrams("s", 3).alias("g")).collect()
    assert rows[0]["g"] == ["abc", "bcd", "cde", "def"]
    assert rows[1]["g"] == ["ab"]   # shorter than n → whole text
    assert rows[2]["g"] == [""]
    assert rows[3]["g"] == [None]   # NULL text → [NULL], not NULL


def test_st_point_box_null_inputs_yield_null_geometry(spark):
    """r8 review fix: np.asarray silently encoded NULL coordinates as
    NaN-coordinate WKB — a structurally valid point that passed
    `geometry IS NOT NULL` and poisoned bbox/intersects math.  NULL in →
    NULL geometry out (SQL row-level null propagation, like every other
    geo UDF); non-null rows stay byte-identical to the kernel."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.functions import wkb
    from overturemaps_duckdb_spark.functions.geo import st_box, st_point

    rows = (
        spark.createDataFrame(
            [(1.5, 2.5), (None, 2.0), (3.0, None), (None, None)],
            "lon double, lat double",
        )
        .select(
            st_point("lon", "lat").alias("p"),
            st_box("lon", "lat", F.col("lon") + 1, F.col("lat") + 1).alias("b"),
        )
        .collect()
    )
    assert bytes(rows[0]["p"]) == wkb.dumps(wkb.point(1.5, 2.5))
    assert bytes(rows[0]["b"]) == wkb.dumps(wkb.box(1.5, 2.5, 2.5, 3.5))
    for r in rows[1:]:
        assert r["p"] is None and r["b"] is None


def test_manifest_stats_fallback_column(spark, tmp_path):
    """r8 review fix: a candidate bbox column written WITHOUT parquet
    statistics must fall through to the next candidate (centroid_lon/lat),
    not abort the axis — a stats-less bbox column used to disable file
    pruning entirely."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from overturemaps_duckdb_spark.sources.manifest import file_bbox

    tbl = pa.table(
        {
            "bbox.xmin": [0.0, 1.0],
            "bbox.xmax": [2.0, 3.0],
            "bbox.ymin": [0.0, 1.0],
            "bbox.ymax": [2.0, 3.0],
            "centroid_lon": [10.0, 20.0],
            "centroid_lat": [30.0, 40.0],
        }
    )
    p = str(tmp_path / "nostats.parquet")
    # stats only on the centroid columns — the bbox.* axis candidates are
    # present in the schema but carry no min/max
    pq.write_table(tbl, p, write_statistics=["centroid_lon", "centroid_lat"])
    fb = file_bbox(p)
    assert fb is not None, "stats-less bbox column must not disable pruning"
    assert (fb.xmin, fb.xmax, fb.ymin, fb.ymax) == (10.0, 20.0, 30.0, 40.0)


def test_pack_sequences_rejects_nonpositive_budget(spark):
    """r12 review: `_before DIV 0` is NULL, so budget=0 silently NULLed
    every seq_id — must raise instead."""
    import pytest

    from overturemaps_duckdb_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(df, "doc_id", "n_tokens", 0)
