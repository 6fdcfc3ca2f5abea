"""Z-order (Morton) flat-file layout: key correctness vs a Python
reference, and the actual payoff — footer-stats manifest pruning excludes
most files for a small bbox on the z-ordered layout, while a hash-shuffled
layout of the same data prunes nothing (every file spans everything)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from overturemaps_duckdb_spark.queries import t
from overturemaps_duckdb_spark.sources.layout import morton_key, write_zordered
from overturemaps_duckdb_spark.sources.manifest import build_manifest, prune_files
from tests.conftest import SF_SMOKE


def _py_morton(lon: float, lat: float) -> int:
    def quant(v, lo, hi):
        q = int((v - lo) / (hi - lo) * 65535.0)
        return max(0, min(65535, q))

    def spread(x):
        x &= 0xFFFF
        x = (x | (x << 8)) & 0x00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F
        x = (x | (x << 2)) & 0x33333333
        x = (x | (x << 1)) & 0x55555555
        return x

    return spread(quant(lon, -180.0, 180.0)) | (spread(quant(lat, -90.0, 90.0)) << 1)


def _points(spark):
    from overturemaps_duckdb_spark.queries.spatial import _C_LAT, _C_LON

    return t(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("id"),
        F.expr(_C_LON).alias("centroid_lon"),
        F.expr(_C_LAT).alias("centroid_lat"),
    )


def test_morton_key_matches_reference(spark):
    pts = _points(spark).limit(200)
    rows = pts.withColumn("z", morton_key()).collect()
    for r in rows:
        assert r["z"] == _py_morton(r["centroid_lon"], r["centroid_lat"]), r


def test_zorder_locality_and_manifest_pruning(spark, tmp_path):
    pts = _points(spark)
    zdir = str(tmp_path / "z") + "/pts"
    write_zordered(pts, zdir, n_files=8)
    sdir = str(tmp_path / "s") + "/pts"
    pts.repartition(8).write.mode("overwrite").parquet(sdir)  # hash-shuffled twin

    def files(d):
        return [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]

    zfiles, sfiles = files(zdir), files(sdir)
    assert len(zfiles) == 8 and len(sfiles) == 8
    # same rows either way
    assert spark.read.parquet(zdir).count() == pts.count()

    # small query box inside the fixture's span (sf0.001 customer points
    # cover lon ≈ [-179, -30], lat ≈ [-80, 80])
    bbox = (-70.0, -20.0, -50.0, 20.0)
    z_surv = prune_files(build_manifest(zfiles), bbox)
    s_surv = prune_files(build_manifest(sfiles), bbox)
    # hash layout: every file spans the world → nothing prunes
    assert len(s_surv) == 8
    # z-order layout: tight per-file spans → most files pruned
    assert len(z_surv) < 8 / 2, f"z-order pruned only to {len(z_surv)} files"
    # and the pruned set is sufficient: reading survivors returns every
    # point in the bbox
    xmin, ymin, xmax, ymax = bbox
    in_box = (
        (F.col("centroid_lon") >= xmin) & (F.col("centroid_lon") <= xmax)
        & (F.col("centroid_lat") >= ymin) & (F.col("centroid_lat") <= ymax)
    )
    want = pts.where(in_box).count()
    got = spark.read.parquet(*z_surv).where(in_box).count()
    assert got == want
