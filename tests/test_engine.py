"""End-to-end Engine facade test: register themes → load area → pipeline →
FTS search → raw SQL → session persistence — the controller.js flow on
Spark, driven through the one public object."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from overturemaps_duckdb_spark.engine import Engine, ThemeSpec
from overturemaps_duckdb_spark.plans.pipeline import Node
from overturemaps_duckdb_spark.sources.ingest import ThemeFieldSpec
from tests.conftest import SF_SMOKE


def _stage_theme_files(spark, tmp, name, df):
    p = os.path.join(tmp, name)
    df.coalesce(2).write.mode("overwrite").parquet(p)
    return [os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")]


def test_engine_end_to_end(spark, tmp_path):
    from overturemaps_duckdb_spark.queries.spatial import _C_LAT, _C_LON

    raw = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        F.col("c_custkey").cast("string").alias("id"),
        F.col("c_name").alias("display_name"),
        "c_mktsegment",
        F.expr(_C_LON).alias("centroid_lon"),
        F.expr(_C_LAT).alias("centroid_lat"),
    )
    files = _stage_theme_files(spark, str(tmp_path), "places", raw)

    eng = Engine(spark, root=str(tmp_path / "engine"))

    def projection(batch):
        from overturemaps_duckdb_spark.functions.geo import (
            st_geometrytype,
            st_point,
        )

        proj = batch.select(
            "id",
            F.coalesce(F.col("display_name"), F.lit("")).alias("display_name"),
            F.concat_ws(" ", "display_name", "c_mktsegment").alias("search_name"),
            "centroid_lon",
            "centroid_lat",
            F.col("c_mktsegment").alias("_f0"),
        ).withColumn("geometry", st_point("centroid_lon", "centroid_lat"))
        return proj.withColumn("geom_type", st_geometrytype("geometry"))

    eng.register_theme(
        "places/customer",
        ThemeSpec(
            table="places_customer",
            files=files,
            fields=[ThemeFieldSpec("segment", "c_mktsegment")],
            projection=projection,
            build_fts=True,
        ),
    )

    # EP1: area load (bbox covers the fixture's lon range)
    results = eng.load_area(["places/customer"], bbox=(-180.0, -90.0, 0.0, 90.0))
    res = results["places/customer"]
    assert res.rows > 0 and not res.cached
    assert "places_customer" in eng.tables()

    # EP2: pipeline over the loaded table, FTS search mode
    eng.pipeline.nodes = [
        Node(id="n1", type="source", table="places_customer", key="places/customer")
    ]
    eng.pipeline.search = "machinery"
    eng.pipeline.limit = 12
    out = eng.pipeline.run_now()
    assert out.count == 12 and not out.degraded
    assert all(r["_score"] is not None for r in out.rows)  # FTS scored

    # EP3: raw DuckDB-dialect SQL against the loaded table
    df = eng.sql(
        "SELECT string_split(search_name, ' ')[1] AS w, count(*) AS c "
        "FROM places_customer GROUP BY w ORDER BY c DESC, w LIMIT 3"
    )
    assert df.count() == 3
    assert eng.instrumentation.history[-1].ok

    # session persistence round-trip
    eng.save_session()
    eng2 = Engine(spark, root=eng.root)
    restored = eng2.restore_session()
    assert restored["loaded"] == ["places/customer"]
    assert restored["pipeline"]["search"] == "machinery"

    # second load_area hits the snapview cache
    again = eng.load_area(["places/customer"], bbox=(-180.0, -90.0, 0.0, 90.0))
    assert again["places/customer"].cached

    # memoized intersection pass: same signature → no recomputation
    # (points against their own theme's boxes is degenerate but exercises
    # the signature memo; intersections.js:22-44 — release generation +
    # tables + rounded bbox)
    bbox = (-180.0, -90.0, 0.0, 90.0)
    r1 = eng.intersections("places_customer", ["places_customer"], bbox)
    assert (eng._load_gen, "places_customer", ("places_customer",),
            tuple(round(v, 3) for v in bbox)) in eng._pip_memo
    r2 = eng.intersections("places_customer", ["places_customer"], bbox)
    assert r1 is r2  # memo hit returns the same object

    # a new area load bumps the generation — the memo must miss (the
    # reference's release component of the signature, intersections.js:23)
    gen_before = eng._load_gen
    eng.load_area(["places/customer"], bbox=(-180.0, -90.0, 0.0, 90.0))
    assert eng._load_gen > gen_before
    r3 = eng.intersections("places_customer", ["places_customer"], bbox)
    assert r3 is not r1


def test_scale_scenario_grid_layout_banded_fold_no_bnlj(spark, tmp_path):
    """VERDICT r2 stretch: the 100 TB composition in one scenario at sf0.1 —
    load_theme grid-partitioned materialization + grid banded join +
    intersection_fold, with broadcast disabled so the planner must use the
    cell equi-join.  Asserts the plans, not just the rows: the layout read
    is partition-pruned and NO join in the fold degenerates to
    BroadcastNestedLoop/CartesianProduct."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.operators.spatial_join import (
        intersection_fold,
    )
    from overturemaps_duckdb_spark.queries.spatial import supplier_boxes

    sf = "/root/testdata/sf0.1"
    raw = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").cast("string").alias("id"),
        F.col("c_name").alias("display_name"),
        "c_mktsegment",
    )
    files = _stage_theme_files(spark, str(tmp_path), "places01", raw)

    eng = Engine(spark, root=str(tmp_path / "scale"))

    def projection(batch):
        from overturemaps_duckdb_spark.functions.geo import st_point
        from overturemaps_duckdb_spark.queries.spatial import _C_LAT, _C_LON

        pts = batch.select(
            "id",
            F.coalesce("display_name", F.lit("")).alias("display_name"),
            F.col("display_name").alias("search_name"),
            F.expr(_C_LON.replace("c_custkey", "CAST(id AS BIGINT)")).alias(
                "centroid_lon"
            ),
            F.expr(_C_LAT.replace("c_custkey", "CAST(id AS BIGINT)")).alias(
                "centroid_lat"
            ),
        )
        return pts.withColumn("geometry", st_point("centroid_lon", "centroid_lat"))

    eng.register_theme(
        "places/customer01",
        ThemeSpec(table="places_customer01", files=files, projection=projection),
    )
    res = eng.load_area(
        ["places/customer01"], bbox=(-180.0, -90.0, 180.0, 90.0), limit=50_000
    )["places/customer01"]
    assert res.rows > 10_000  # sf0.1 customer ≈ 15k, all in bbox

    # 1. the materialized layout exists and a cell-filtered read is
    #    partition-pruned at PLAN time (directory pruning, not row filtering)
    layout = os.path.join(eng.snapviews.root, "_layout", "places_customer01")
    assert any(d.startswith("cx=") for d in os.listdir(layout))
    pruned = spark.read.parquet(layout).where("cx = 0 AND cy = 0")
    scan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in scan and "(cx" in scan

    # 2. fold the loaded points against a polygon theme with broadcast OFF:
    #    the band join must take the grid-cell equi-join path
    polys = supplier_boxes(spark, sf)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fold = intersection_fold(
            eng.catalog.tables["places_customer01"], {"suppliers": polys}
        )
        plan = fold._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        labels = fold.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert len(labels) > 0
    assert all(r["labels"] == "suppliers" for r in labels)

    # 3. the engine-facade memoized pass over the same tables agrees
    eng.catalog.tables["suppliers"] = polys
    via_engine = eng.intersections(
        "places_customer01", ["suppliers"], (-180.0, -90.0, 180.0, 90.0)
    )
    assert {r["id"] for r in via_engine} == {r["id"] for r in labels}


def test_pip_memo_evicts_dead_generations(spark, tmp_path):
    """r9 review: the intersections memo keys embed the load generation, so
    entries from earlier generations are permanently unreachable after any
    load_area — they must be dropped, not accumulate collected row lists
    for the session's lifetime."""
    from overturemaps_duckdb_spark.engine import Engine

    eng = Engine(spark, str(tmp_path))
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.functions.geo import st_box, st_point

    pts = spark.createDataFrame(
        [(1, 0.5, 0.5)], "id int, centroid_lon double, centroid_lat double"
    ).withColumn("geometry", st_point("centroid_lon", "centroid_lat"))
    polys = spark.createDataFrame(
        [(10, 0.5, 0.5)], "id int, centroid_lon double, centroid_lat double"
    ).withColumn(
        "geometry",
        st_box(
            F.col("centroid_lon") - 1, F.col("centroid_lat") - 1,
            F.col("centroid_lon") + 1, F.col("centroid_lat") + 1,
        ),
    )
    eng.catalog.tables["pts"] = pts
    eng.catalog.tables["polys"] = polys
    bbox = (0.0, 0.0, 1.0, 1.0)
    r1 = eng.intersections("pts", ["polys"], bbox)
    assert len(eng._pip_memo) == 1
    eng._load_gen += 1  # simulate a new area load
    r2 = eng.intersections("pts", ["polys"], bbox)
    assert r2 == r1
    # the generation-0 entry is unreachable and must be gone
    assert len(eng._pip_memo) == 1
    assert all(k[0] == eng._load_gen for k in eng._pip_memo)
