"""Geo scalar functions as Arrow-batched pandas UDFs (SURVEY §2.2 G1-G6).

The reference calls DuckDB spatial-extension functions
(`/root/reference/src/lib/query.js:39-42`, `pipeline.js:128-137`,
`analysisQueries.js:27-46`).  Here each becomes a vectorized pandas UDF over
WKB `BinaryType` columns backed by :mod:`overturemaps_duckdb_spark.functions.wkb`.

Design notes (scale):
- UDFs are the slow path — they appear only where geometry math is
  irreducible.  Cheap prefilters (bbox / centroid band conditions) stay as
  native column expressions so Catalyst pushes them into scans and join
  conditions; the UDF then runs on the small post-filter row set.
- Everything transfers via Arrow record batches (no per-row pickling).
- ``st_point`` / ``st_box`` are constructors used by ingest to materialize
  WKB once; downstream operators keep the binary column opaque (late
  materialization, query.js:7-9).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from overturemaps_duckdb_spark.functions import wkb

#: meters → degrees conversion used throughout the reference (pipeline.js:128)
METERS_PER_DEGREE = 111320.0


@pandas_udf(StringType())
def st_geometrytype(geom: pd.Series) -> pd.Series:
    """G1 — `ST_GeometryType(geometry)` (query.js:40)."""
    return geom.map(lambda b: None if b is None else wkb.geom_type(wkb.loads(b)))


@pandas_udf(
    StructType(
        [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
    )
)
def st_centroid_lonlat(geom: pd.Series) -> pd.DataFrame:
    """G2 — `ST_X/ST_Y(ST_Centroid(geometry))` (query.js:41-42)."""
    lons, lats = [], []
    for b in geom:
        if b is None:
            lons.append(None)
            lats.append(None)
        else:
            x, y = wkb.centroid(wkb.loads(b))
            lons.append(x)
            lats.append(y)
    return pd.DataFrame({"lon": lons, "lat": lats})


@pandas_udf(StringType())
def st_asgeojson(geom: pd.Series) -> pd.Series:
    """G3 — WKB→GeoJSON at the output boundary only (query.js:81)."""
    return geom.map(lambda b: None if b is None else wkb.as_geojson(wkb.loads(b)))


@pandas_udf(BooleanType())
def st_intersects(a: pd.Series, b: pd.Series) -> pd.Series:
    """G4 — exact intersection predicate (analysisQueries.js:33)."""
    return pd.Series(
        [
            None if (x is None or y is None) else wkb.intersects(wkb.loads(x), wkb.loads(y))
            for x, y in zip(a, b)
        ],
        dtype="object",
    )


@pandas_udf(DoubleType())
def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    """G5 — planar distance in degrees (analysisQueries.js:28,35)."""
    return pd.Series(
        [
            None if (x is None or y is None) else wkb.distance(wkb.loads(x), wkb.loads(y))
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )


@pandas_udf(BinaryType())
def st_intersection(a: pd.Series, b: pd.Series) -> pd.Series:
    """G6 — intersection geometry for overlays (AnalysisPanel.jsx:44-46)."""

    def go(x, y):
        if x is None or y is None:
            return None
        g = wkb.intersection(wkb.loads(x), wkb.loads(y))
        return None if g is None else wkb.dumps(g)

    return pd.Series([go(x, y) for x, y in zip(a, b)], dtype="object")


@pandas_udf(BinaryType())
def st_point(lon: pd.Series, lat: pd.Series) -> pd.Series:
    """Constructor: (lon, lat) → WKB point (ingest-side materialization)."""
    return pd.Series(
        [
            None if (x is None or y is None) else wkb.dumps(wkb.point(float(x), float(y)))
            for x, y in zip(lon, lat)
        ],
        dtype="object",
    )


@pandas_udf(BinaryType())
def st_box(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series) -> pd.Series:
    """Constructor: envelope → WKB polygon (rectangular footprints)."""
    return pd.Series(
        [
            wkb.dumps(wkb.box(float(a), float(b), float(c), float(d)))
            for a, b, c, d in zip(xmin, ymin, xmax, ymax)
        ],
        dtype="object",
    )


@pandas_udf(DoubleType())
def st_area(geom: pd.Series) -> pd.Series:
    """Planar area — used for the z-order-by-area render sort (render.js:27-40)."""
    return geom.map(lambda b: None if b is None else wkb.area(wkb.loads(b)))


def meters_to_degrees(meters: float) -> float:
    """The reference's planar meters→degrees convention (pipeline.js:128)."""
    return meters / METERS_PER_DEGREE


def with_centroid(df, geom_col: str = "geometry"):
    """Attach `centroid_lon` / `centroid_lat` (ingest projection, query.js:41-42)."""
    c = st_centroid_lonlat(F.col(geom_col))
    return df.withColumn("_c", c).withColumns(
        {"centroid_lon": F.col("_c.lon"), "centroid_lat": F.col("_c.lat")}
    ).drop("_c")
