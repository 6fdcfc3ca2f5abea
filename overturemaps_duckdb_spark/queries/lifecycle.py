"""Lifecycle inventory (SURVEY §2.1 S3/S7/S8, §2.12 Y1/Y4): manifest-pruned
scans, snapview save/restore, session KV, URL codec — each driven end-to-end
inside the query and value-checked against an oracle on the same fixtures."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from overturemaps_duckdb_spark.queries import query, t
from overturemaps_duckdb_spark.queries.spatial import _C_LAT, _C_LON, customer_points
from overturemaps_duckdb_spark.sources.manifest import build_manifest, read_pruned
from overturemaps_duckdb_spark.state import (
    SessionState,
    SnapviewStore,
    decode_url_state,
    encode_url_state,
)


@query(
    "s3_manifest_pruned_scan",
    oracle=f"""
    WITH pts AS (SELECT c_custkey AS id, {_C_LON} AS lon, {_C_LAT} AS lat FROM customer)
    SELECT id, lon AS centroid_lon, lat AS centroid_lat
    FROM pts
    WHERE lon >= -130 AND lon <= -60 AND lat >= -80 AND lat <= 80
    """,
)
def s3_manifest_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — file-level bbox pruning from parquet footer stats
    (worker/index.js:133-213): write lon-banded files, build the manifest,
    scan ONLY overlapping files, then apply the exact bbox.  The result must
    equal the unpruned filter (pruning is an optimization, never a filter)."""
    from overturemaps_duckdb_spark.operators._util import staging_root

    pts = customer_points(spark, sf_dir).select("id", "centroid_lon", "centroid_lat")
    root = staging_root(spark, sf_dir, "s3")
    paths = []
    for i, (lo, hi) in enumerate([(-181, -120), (-120, -60), (-60, 0), (0, 181)]):
        part = pts.where((F.col("centroid_lon") >= lo) & (F.col("centroid_lon") < hi))
        p = os.path.join(root, f"band_{i}")
        part.coalesce(1).write.mode("overwrite").parquet(p)
        paths.extend(
            os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
        )
    manifest = build_manifest(paths)
    bbox = (-130.0, -80.0, -60.0, 80.0)
    pruned = read_pruned(spark, manifest, bbox)
    return pruned.where(
        (F.col("centroid_lon") >= bbox[0])
        & (F.col("centroid_lon") <= bbox[2])
        & (F.col("centroid_lat") >= bbox[1])
        & (F.col("centroid_lat") <= bbox[3])
    )


@query(
    "s13_grid_partitioned_scan",
    oracle=f"""
    WITH pts AS (SELECT c_custkey AS id, {_C_LON} AS lon, {_C_LAT} AS lat FROM customer)
    SELECT id, lon AS centroid_lon, lat AS centroid_lat
    FROM pts
    WHERE lon >= -95 AND lon <= -65 AND lat >= -50 AND lat <= 50
    """,
)
def s13_grid_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-partitioned layout end-to-end, produced by load_theme's OWN
    write path (themes.js:351 RTREE analog, sources/ingest.py): ingest the
    staged files with a layout_root, then bbox-read the materialized
    cx=/cy= directory partitions with plan-time partition pruning.  The
    result must equal the plain filter — layout is an optimization, never a
    filter."""
    from overturemaps_duckdb_spark.sources.ingest import load_theme
    from overturemaps_duckdb_spark.sources.layout import read_grid_bbox

    pts = customer_points(spark, sf_dir).select(
        "id", "centroid_lon", "centroid_lat"
    )
    from overturemaps_duckdb_spark.operators._util import staging_root

    root = staging_root(spark, sf_dir, "s13")
    staged = os.path.join(root, "staged")
    pts.write.mode("overwrite").parquet(staged)
    files = [
        os.path.join(staged, f)
        for f in os.listdir(staged)
        if f.endswith(".parquet")
    ]
    bbox = (-95.0, -50.0, -65.0, 50.0)
    res = load_theme(
        spark,
        table="theme_s13",
        files=files,
        bbox=bbox,
        projection=lambda raw: raw.select("id", "centroid_lon", "centroid_lat"),
        limit=10**6,
        layout_root=root,
        layout_cell_deg=30.0,
    )
    assert res.layout_path is not None  # the layout came from load_theme
    return read_grid_bbox(spark, res.layout_path, bbox, cell_deg=30.0).select(
        "id", "centroid_lon", "centroid_lat"
    )


@query(
    "s7_s8_snapview_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey % 7 = 0
    """,
)
def s7_s8_snapview_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/S8 — `COPY TO parquet` → cache → re-import (themes.js:195-242):
    a snapview saved and re-loaded must round-trip bit-exactly."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    subset = c.where(F.col("c_custkey") % 7 == 0)
    from overturemaps_duckdb_spark.operators._util import staging_root

    store = SnapviewStore(spark, staging_root(spark, sf_dir, "s7"))
    store.save("sv_roundtrip", subset, {"keys": ["customer"]})
    return store.load("sv_roundtrip")


@query(
    "y1_session_kv",
    oracle="""
    SELECT * FROM (VALUES
        ('limit', '100'),
        ('pipeline', '{"nodes": 2}')
    ) AS t(key, value)
    """,
)
def y1_session_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y1/Y2 — `_session` KV with INSERT OR REPLACE + hydration
    (sessionState.js:33-135): set, overwrite, delete, re-hydrate from the
    parquet artifact in a fresh instance."""
    from overturemaps_duckdb_spark.operators._util import staging_root

    root = staging_root(spark, sf_dir, "y1")
    s = SessionState(spark, root)
    s.set("limit", 3000)
    s.set("limit", 100)  # INSERT OR REPLACE
    s.set("bbox", [1, 2, 3, 4])
    s.delete("bbox")
    s.set("pipeline", {"nodes": 2})
    fresh = SessionState(spark, root)  # hydrate from disk
    rows = [(k, fresh._kv[k]) for k in sorted(fresh._kv)]
    return spark.createDataFrame(rows, "key string, value string")


@query(
    "y4_url_codec",
    oracle="""
    SELECT CAST(3000 AS BIGINT) AS lim, 'cafe' AS search, TRUE AS roundtrip_ok
    """,
)
def y4_url_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y4 — deflate-raw+base64url state codec (urlState.js:15-114):
    encode → decode must be identity; corrupt tokens decode to None."""
    state = {"lim": 3000, "search": "cafe"}
    decoded = decode_url_state(encode_url_state(state))
    ok = decoded == state and decode_url_state("%%%bad%%%") is None
    return spark.createDataFrame(
        [(decoded["lim"], decoded["search"], ok)],
        "lim bigint, search string, roundtrip_ok boolean",
    )
