"""Geo-kernel + spatial-join inventory (SURVEY §2.2 G1-G6, §2.4 J1-J7).

The fixture set has no geometry tables, so geometries are derived
deterministically from integer keys using only exact-binary fractions
(/16, /32): the WKB pandas-UDF kernel runs the real geometry path on the
Spark side while the DuckDB oracle states the same semantics in plain
arithmetic — every G/J operator gets an exact value-level parity check
without the DuckDB spatial extension (unavailable offline).

Derivation (identical in both dialects):
  customer point: lon = (k%360)-180 + (k%13)/16,  lat = ((k*7)%160)-80 + (k%11)/32
  supplier point: same formula on s_suppkey, shifted +1/32 on both axes
  supplier box:   ±0.125 envelope around the supplier point
Customer k and supplier k coincide to within sqrt(2)/32 ≈ 0.0442°, so
within/exclude joins at the 0.0625° threshold are non-trivially populated.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from overturemaps_duckdb_spark.functions.geo import (
    st_area,
    st_asgeojson,
    st_box,
    st_centroid_lonlat,
    st_distance,
    st_geometrytype,
    st_intersection,
    st_point,
)
from overturemaps_duckdb_spark.operators.spatial_join import banded_join, spatial_join
from overturemaps_duckdb_spark.queries import query, t

#: 0.0625° — exactly 6957.5 m under the reference's d/111320 convention
WITHIN_M = 6957.5

# ---- shared derivations ----------------------------------------------------

_C_LON = "CAST(c_custkey % 360 AS DOUBLE) - 180.0 + CAST(c_custkey % 13 AS DOUBLE) / 16.0"
_C_LAT = "CAST((c_custkey * 7) % 160 AS DOUBLE) - 80.0 + CAST(c_custkey % 11 AS DOUBLE) / 32.0"
_S_LON = (
    "CAST(s_suppkey % 360 AS DOUBLE) - 180.0 + CAST(s_suppkey % 13 AS DOUBLE) / 16.0 + 0.03125"
)
_S_LAT = (
    "CAST((s_suppkey * 7) % 160 AS DOUBLE) - 80.0 + CAST(s_suppkey % 11 AS DOUBLE) / 32.0 + 0.03125"
)

CUSTOMER_POINTS_SQL = f"SELECT c_custkey AS id, {_C_LON} AS lon, {_C_LAT} AS lat FROM customer"
SUPPLIER_POINTS_SQL = f"SELECT s_suppkey AS id, {_S_LON} AS lon, {_S_LAT} AS lat FROM supplier"


def _spread(df: DataFrame) -> DataFrame:
    """Partitioning knob for the theme builders.

    Measured at sf0.1 (local[32]): repartitioning the 1-2-partition fixture
    scans to full parallelism made every consumer SLOWER (j1 1.5→2.6 s, pl4
    3→5 s) — the extra exchange outweighs parallelizing ~16k rows of WKB
    UDF work, whose apparent serial cost was really one-time Python-worker
    startup.  Identity here; at real scale the scan width comes from the
    file layout (sources/layout.py), not a repartition."""
    return df


def _theme_cache(df: DataFrame) -> DataFrame:
    """Theme-table materialization, mirroring the reference's ingest-time
    DuckDB tables (themes.js:308-314).  Measured at sf0.1: persist() wins
    ~10% on multi-reference compiled plans (pl4 4.9→4.4 s cold) — but ONLY
    without a preceding repartition (the extra exchange made everything
    slower; see _spread).  Spark dedupes cache entries by analyzed plan, so
    repeated query calls share one materialization."""
    return df.persist()


def customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theme-cached-shaped point table: id, lon, lat, geometry(WKB),
    centroid_lon/lat (the ingest projection of query.js:35-44).

    For POINT geometries the kernel centroid is a raw f8 read of the packed
    lon/lat (functions/geo.st_centroid_lonlat fast path) — bit-identical to
    the source columns — so the theme fixtures take the coordinates
    directly and skip one pandas-UDF pass per ingest; the kernel path
    itself stays verified by the g1/g2 oracle queries."""
    c = _spread(t(spark, sf_dir, "customer"))
    pts = c.select(
        F.col("c_custkey").alias("id"),
        F.expr(_C_LON).alias("lon"),
        F.expr(_C_LAT).alias("lat"),
    ).withColumn("geometry", st_point("lon", "lat"))
    return _theme_cache(pts.withColumns(
        {"centroid_lon": F.col("lon"), "centroid_lat": F.col("lat")}
    ))


def supplier_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _spread(t(spark, sf_dir, "supplier"))
    pts = s.select(
        F.col("s_suppkey").alias("id"),
        F.expr(_S_LON).alias("lon"),
        F.expr(_S_LAT).alias("lat"),
    ).withColumn("geometry", st_point("lon", "lat"))
    return _theme_cache(pts.withColumns(
        {"centroid_lon": F.col("lon"), "centroid_lat": F.col("lat")}
    ))


def supplier_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±0.125° rectangular footprints (polygon WKB) around supplier points."""
    s = _spread(t(spark, sf_dir, "supplier"))
    base = s.select(
        F.col("s_suppkey").alias("id"),
        F.expr(_S_LON).alias("lon"),
        F.expr(_S_LAT).alias("lat"),
    )
    box = base.withColumn(
        "geometry",
        st_box(
            F.col("lon") - 0.125,
            F.col("lat") - 0.125,
            F.col("lon") + 0.125,
            F.col("lat") + 0.125,
        ),
    )
    cen = st_centroid_lonlat("geometry")
    return _theme_cache(box.withColumn("_c", cen).withColumns(
        {"centroid_lon": F.col("_c.lon"), "centroid_lat": F.col("_c.lat")}
    ).drop("_c"))


# ---------------------------------------------------------------------------
# G1/G2 — geometry type + centroid through the WKB kernel
# ---------------------------------------------------------------------------


@query(
    "g1_g2_point_type_centroid",
    oracle=f"""
    WITH pts AS ({CUSTOMER_POINTS_SQL})
    SELECT id, 'POINT' AS geom_type, lon AS centroid_lon, lat AS centroid_lat
    FROM pts
    """,
)
def g1_g2_point_type_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_GeometryType + ST_X/ST_Y(ST_Centroid(...)) at ingest
    (query.js:40-42) — point path."""
    pts = customer_points(spark, sf_dir)
    return pts.select(
        "id",
        st_geometrytype("geometry").alias("geom_type"),
        F.col("centroid_lon"),
        F.col("centroid_lat"),
    )


@query(
    "g1_g2_polygon_type_centroid_area",
    oracle=f"""
    WITH boxes AS ({SUPPLIER_POINTS_SQL})
    SELECT id, 'POLYGON' AS geom_type,
           ROUND(lon, 6) AS centroid_lon, ROUND(lat, 6) AS centroid_lat,
           0.0625 AS area
    FROM boxes
    """,
)
def g1_g2_polygon_type_centroid_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon path: type, area centroid (rounded — the kernel's shoelace sum
    carries ~1e-14 float error vs the oracle's closed form) and planar area
    (the z-order-by-area sort key, render.js:27-40)."""
    boxes = supplier_boxes(spark, sf_dir)
    return boxes.select(
        "id",
        st_geometrytype("geometry").alias("geom_type"),
        F.round("centroid_lon", 6).alias("centroid_lon"),
        F.round("centroid_lat", 6).alias("centroid_lat"),
        F.round(st_area("geometry"), 6).alias("area"),
    )


@query(
    "g3_asgeojson_point",
    oracle="""
    SELECT c_custkey AS id,
           '{"type":"Point","coordinates":[' || CAST(c_custkey % 360 - 180 AS VARCHAR)
           || ',' || CAST((c_custkey * 7) % 160 - 80 AS VARCHAR) || ']}' AS geojson
    FROM customer
    """,
)
def g3_asgeojson_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late GeoJSON materialization at the output boundary (query.js:81,
    pipeline.js:106) — integer coordinates so the text form is
    formatting-independent."""
    c = t(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (F.col("c_custkey") % 360 - 180).cast("double").alias("lon"),
        ((F.col("c_custkey") * 7) % 160 - 80).cast("double").alias("lat"),
    ).withColumn("geometry", st_point("lon", "lat"))
    return pts.select("id", st_asgeojson("geometry").alias("geojson"))


# ---------------------------------------------------------------------------
# J1 — inner spatial join (point-in-polygon via ST_Intersects)
# ---------------------------------------------------------------------------


@query(
    "j1_spatial_intersect_join",
    oracle=f"""
    WITH pts AS ({CUSTOMER_POINTS_SQL}), boxes AS ({SUPPLIER_POINTS_SQL})
    SELECT pts.id AS point_id, boxes.id AS box_id
    FROM pts JOIN boxes
      ON ABS(pts.lon - boxes.lon) <= 0.125 AND ABS(pts.lat - boxes.lat) <= 0.125
    """,
)
def j1_spatial_intersect_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`intersect` mode: band prefilter + exact ST_Intersects
    (analysisQueries.js:32-33) — customer points inside supplier boxes."""
    pts = customer_points(spark, sf_dir)
    boxes = supplier_boxes(spark, sf_dir)
    joined = spatial_join(pts, boxes, how="inner", predicate="intersects")
    return joined.select(pts["id"].alias("point_id"), boxes["id"].alias("box_id"))


@query(
    "j2_spatial_within",
    oracle=f"""
    WITH pts AS ({CUSTOMER_POINTS_SQL}), spts AS ({SUPPLIER_POINTS_SQL})
    SELECT pts.id FROM pts
    WHERE EXISTS (
        SELECT 1 FROM spts
        WHERE ABS(pts.lon - spts.lon) < 0.2 AND ABS(pts.lat - spts.lat) < 0.2
          AND SQRT((pts.lon - spts.lon) * (pts.lon - spts.lon)
                 + (pts.lat - spts.lat) * (pts.lat - spts.lat)) < 0.0625
    )
    """,
)
def j2_spatial_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`within` mode (J2): customers with ≥1 supplier within 6957.5 m
    (= 0.0625° under d/111320) — left-semi, no duplication
    (pipeline.js:141-157)."""
    pts = customer_points(spark, sf_dir)
    spts = supplier_points(spark, sf_dir)
    return spatial_join(
        pts, spts, how="left_semi", predicate="within_distance",
        distance_m=WITHIN_M, assume_points=True,
    ).select("id")


@query(
    "j3_spatial_exclude",
    oracle=f"""
    WITH pts AS ({CUSTOMER_POINTS_SQL}), spts AS ({SUPPLIER_POINTS_SQL})
    SELECT pts.id FROM pts
    WHERE NOT EXISTS (
        SELECT 1 FROM spts
        WHERE ABS(pts.lon - spts.lon) < 0.2 AND ABS(pts.lat - spts.lat) < 0.2
          AND SQRT((pts.lon - spts.lon) * (pts.lon - spts.lon)
                 + (pts.lat - spts.lat) * (pts.lat - spts.lat)) < 0.0625
    )
    """,
)
def j3_spatial_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`exclude` mode (J3): left-anti of the same condition
    (pipeline.js:159-165)."""
    pts = customer_points(spark, sf_dir)
    spts = supplier_points(spark, sf_dir)
    return spatial_join(
        pts, spts, how="left_anti", predicate="within_distance",
        distance_m=WITHIN_M, assume_points=True,
    ).select("id")


@query(
    "j4_spatial_bidirectional",
    oracle=f"""
    WITH pts AS ({CUSTOMER_POINTS_SQL}), spts AS ({SUPPLIER_POINTS_SQL})
    SELECT pts.id FROM pts
    WHERE EXISTS (
        SELECT 1 FROM spts
        WHERE ABS(pts.lon - spts.lon) < 0.2 AND ABS(pts.lat - spts.lat) < 0.2
          AND SQRT((pts.lon - spts.lon) * (pts.lon - spts.lon)
                 + (pts.lat - spts.lat) * (pts.lat - spts.lat)) < 0.0625
    )
    UNION
    SELECT spts.id FROM spts
    WHERE EXISTS (
        SELECT 1 FROM pts
        WHERE ABS(pts.lon - spts.lon) < 0.2 AND ABS(pts.lat - spts.lat) < 0.2
          AND SQRT((pts.lon - spts.lon) * (pts.lon - spts.lon)
                 + (pts.lat - spts.lat) * (pts.lat - spts.lat)) < 0.0625
    )
    """,
)
def j4_spatial_bidirectional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional matched-id union (pipeline.js:141-157) on the geo path."""
    from overturemaps_duckdb_spark.operators.spatial_join import bidirectional_match_ids

    pts = customer_points(spark, sf_dir)
    spts = supplier_points(spark, sf_dir)
    return bidirectional_match_ids(
        pts, spts, distance_m=WITHIN_M, assume_points=True
    )


@query(
    "g5_distance_pairs",
    oracle=f"""
    WITH pts AS ({CUSTOMER_POINTS_SQL}), spts AS ({SUPPLIER_POINTS_SQL})
    SELECT pts.id AS point_id, spts.id AS supp_id,
           ROUND(SQRT((pts.lon - spts.lon) * (pts.lon - spts.lon)
                    + (pts.lat - spts.lat) * (pts.lat - spts.lat)), 6) AS dist_deg
    FROM pts JOIN spts
      ON ABS(pts.lon - spts.lon) < 0.2 AND ABS(pts.lat - spts.lat) < 0.2
    """,
)
def g5_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Distance values over the banded candidate set
    (analysisQueries.js:28-29); the kernel computes sqrt(dx²+dy²) exactly as
    the oracle states it.  Candidate generation auto-routes like every
    theta join: broadcast band BNL only while the pair product fits the
    micro tier (supplier points grow with SF), grid-cell equi-join
    otherwise."""
    pts = customer_points(spark, sf_dir)
    spts = supplier_points(spark, sf_dir)
    from overturemaps_duckdb_spark.operators.spatial_join import (
        band_condition,
        banded_join,
        bnlj_affordable,
    )

    if bnlj_affordable(pts, spts):
        joined = pts.join(F.broadcast(spts), band_condition(pts, spts), "inner")
    else:
        joined = banded_join(pts, spts, how="inner")
    return joined.select(
        pts["id"].alias("point_id"),
        spts["id"].alias("supp_id"),
        F.round(st_distance(pts["geometry"], spts["geometry"]), 6).alias("dist_deg"),
    )


@query(
    "g6_intersection_area",
    oracle=f"""
    WITH c AS ({CUSTOMER_POINTS_SQL}), s AS ({SUPPLIER_POINTS_SQL})
    SELECT c.id,
           ROUND(GREATEST(0.0, LEAST(c.lon + 0.125, s.lon + 0.125) - GREATEST(c.lon - 0.125, s.lon - 0.125))
               * GREATEST(0.0, LEAST(c.lat + 0.125, s.lat + 0.125) - GREATEST(c.lat - 0.125, s.lat - 0.125)), 6)
               AS overlap_area
    FROM c JOIN s ON c.id = s.id
    """,
)
def g6_intersection_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Intersection overlay (AnalysisPanel.jsx:44-46): area of the
    intersection of the customer-k box with the supplier-k box (they overlap
    by construction — offset 1/32 within the 0.25 box size)."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.expr(_C_LON).alias("lon"),
        F.expr(_C_LAT).alias("lat"),
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.expr(_S_LON).alias("lon"),
        F.expr(_S_LAT).alias("lat"),
    )
    cb = c.withColumn(
        "geometry",
        st_box(F.col("lon") - 0.125, F.col("lat") - 0.125, F.col("lon") + 0.125, F.col("lat") + 0.125),
    ).alias("cb")
    sb = s.withColumn(
        "geometry",
        st_box(F.col("lon") - 0.125, F.col("lat") - 0.125, F.col("lon") + 0.125, F.col("lat") + 0.125),
    ).alias("sb")
    # plain equi-join on id — no forced broadcast (both sides grow with
    # SF; AQE picks broadcast-hash itself whenever stats allow)
    joined = cb.join(sb, F.col("cb.id") == F.col("sb.id"))
    inter = st_intersection(F.col("cb.geometry"), F.col("sb.geometry"))
    return joined.select(
        F.col("cb.id").alias("id"),
        F.round(F.coalesce(st_area(inter), F.lit(0.0)), 6).alias("overlap_area"),
    )


@query(
    "j8_grid_banded_join",
    oracle=f"""
    WITH pts AS ({CUSTOMER_POINTS_SQL}), spts AS ({SUPPLIER_POINTS_SQL})
    SELECT pts.id AS a_id, spts.id AS b_id
    FROM pts JOIN spts
      ON ABS(pts.lon - spts.lon) < 0.0625 AND ABS(pts.lat - spts.lat) < 0.0625
    """,
)
def j8_grid_banded_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB band-join form: grid-cell discretization turns the theta
    band condition into a co-partitioned **equi-join on cell id** (3×3
    neighbor replication on one side) — no broadcast requirement, AQE-skew
    safe.  Result is identical to the plain band join the oracle states."""
    pts = customer_points(spark, sf_dir).select(
        "id", "centroid_lon", "centroid_lat"
    )
    spts = supplier_points(spark, sf_dir).select(
        F.col("id").alias("b_id"), "centroid_lon", "centroid_lat"
    )
    joined = banded_join(pts, spts, band_deg=0.0625, how="inner")
    return joined.select(pts["id"].alias("a_id"), F.col("b_id"))
