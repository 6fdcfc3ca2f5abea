"""Layout tests: grid partition pruning must show up in the PLAN
(PartitionFilters), bucketed joins must plan without an Exchange on the
bucketed side."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from overturemaps_duckdb_spark.sources.layout import (
    read_grid_bbox,
    write_bucketed,
    write_grid_partitioned,
)
from tests.conftest import SF_SMOKE


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue()


def test_grid_partition_pruning(spark, tmp_path):
    from overturemaps_duckdb_spark.queries.spatial import customer_points

    pts = customer_points(spark, SF_SMOKE).select(
        "id", "centroid_lon", "centroid_lat"
    )
    path = str(tmp_path / "grid") + "/pts"
    write_grid_partitioned(pts, path, cell_deg=30.0)

    bbox = (-130.0, -60.0, -100.0, 60.0)
    df = read_grid_bbox(spark, path, bbox, cell_deg=30.0)
    plan = _explain(df)
    # the cell predicates must land in PartitionFilters (plan-time pruning),
    # not in the post-scan Filter
    assert "PartitionFilters: [" in plan
    assert "cx" in plan.split("PartitionFilters:")[1].split("]")[0]

    expected = pts.where(
        (F.col("centroid_lon") >= bbox[0]) & (F.col("centroid_lon") <= bbox[2])
        & (F.col("centroid_lat") >= bbox[1]) & (F.col("centroid_lat") <= bbox[3])
    )
    got = sorted(r["id"] for r in df.collect())
    want = sorted(r["id"] for r in expected.collect())
    assert got == want and len(got) > 0


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    root = str(tmp_path / "bucket")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            c, "bkt_customer", bucket_cols=["c_custkey"], n_buckets=4,
            sort_cols=["c_custkey"], path=f"{root}/c",
        )
        write_bucketed(
            o.withColumnRenamed("o_custkey", "c_custkey"), "bkt_orders",
            bucket_cols=["c_custkey"], n_buckets=4, sort_cols=["c_custkey"],
            path=f"{root}/o",
        )
        joined = spark.table("bkt_customer").join(
            spark.table("bkt_orders"), "c_custkey"
        )
        plan = _explain(joined)
        phys = plan.split("== Physical Plan ==")[1]
        # co-bucketed sort-merge join: no Exchange on either side
        assert "SortMergeJoin" in phys
        assert "Exchange hashpartitioning" not in phys
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_customer")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_load_theme_materializes_grid_layout(spark, tmp_path):
    """load_theme with a store must land the ingested rows grid-partitioned
    (the RTREE analog, VERDICT r1 ask #5) and re-point the registered view
    at the layout, so bbox scans get plan-time partition pruning."""
    import os

    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.queries.spatial import customer_points
    from overturemaps_duckdb_spark.sources.ingest import load_theme
    from overturemaps_duckdb_spark.state import SnapviewStore
    from tests.conftest import SF_SMOKE

    pts = customer_points(spark, SF_SMOKE).select(
        "id", "centroid_lon", "centroid_lat"
    )
    root = str(tmp_path / "lt_layout")
    staged = os.path.join(root, "staged")
    pts.write.mode("overwrite").parquet(staged)
    files = [
        os.path.join(staged, f)
        for f in os.listdir(staged)
        if f.endswith(".parquet")
    ]
    store = SnapviewStore(spark, root)
    res = load_theme(
        spark,
        table="theme_layout_t",
        files=files,
        bbox=(-180.0, -90.0, 180.0, 90.0),
        projection=lambda raw: raw.select("id", "centroid_lon", "centroid_lat"),
        limit=10**6,
        store=store,
        layout_cell_deg=30.0,
    )
    assert res.layout_path is not None and os.path.isdir(res.layout_path)
    # directory partitions exist
    assert any(d.startswith("cx=") for d in os.listdir(res.layout_path))
    # registered view reads back from the layout with the original schema
    view = spark.table("theme_layout_t")
    assert view.columns == ["id", "centroid_lon", "centroid_lat"]
    assert view.count() == res.rows == pts.count()
    # a bbox read over the layout prunes partitions at plan time
    from overturemaps_duckdb_spark.sources.layout import read_grid_bbox

    pruned = read_grid_bbox(
        spark, res.layout_path, (-95.0, -50.0, -65.0, 50.0), cell_deg=30.0
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    expected = pts.where(
        (F.col("centroid_lon") >= -95) & (F.col("centroid_lon") <= -65)
        & (F.col("centroid_lat") >= -50) & (F.col("centroid_lat") <= 50)
    ).count()
    assert pruned.count() == expected


def test_bucketed_join_no_exchange_smj(spark, tmp_path):
    """With broadcasting disabled, two tables bucketed on the join key must
    sort-merge-join AND aggregate with ZERO Exchange operators — the
    write-once/join-forever layout contract."""

    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.queries import t
    from overturemaps_duckdb_spark.sources.layout import write_bucketed
    from tests.conftest import SF_SMOKE

    root = str(tmp_path / "bkt")
    write_bucketed(
        t(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment"),
        "bkt_t_customer", bucket_cols=["c_custkey"], n_buckets=8,
        sort_cols=["c_custkey"], path=f"{root}/customer",
    )
    write_bucketed(
        t(spark, SF_SMOKE, "orders").select("o_custkey", "o_orderkey"),
        "bkt_t_orders", bucket_cols=["o_custkey"], n_buckets=8,
        sort_cols=["o_custkey"], path=f"{root}/orders",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        c = spark.table("bkt_t_customer")
        o = spark.table("bkt_t_orders")
        joined = (
            c.join(o, c["c_custkey"] == o["o_custkey"])
            .groupBy("c_custkey", "c_mktsegment")
            .agg(F.count("*").alias("n_orders"))
        )
        rows = joined.collect()  # force execution inside the conf window
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed SMJ must be shuffle-free"
        # values: spot-check against a plain join
        expected = (
            t(spark, SF_SMOKE, "customer")
            .join(
                t(spark, SF_SMOKE, "orders"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .groupBy("c_custkey")
            .count()
            .collect()
        )
        assert {(r["c_custkey"], r["n_orders"]) for r in rows} == {
            (r["c_custkey"], r["count"]) for r in expected
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q3_on_bucketed_fact_tables_shuffle_free_join(spark, tmp_path):
    """Backlog demo: TPC-H q3's heavy join (lineitem ⋈ orders on orderkey)
    on co-bucketed tables plans with NO Exchange feeding the join — the
    write-once layout that deletes the fact-side shuffle from every
    repeated orderkey join.  The small customer dim still broadcasts (that
    is the RIGHT plan; bucketing is for the two big sides)."""

    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.queries import t
    from overturemaps_duckdb_spark.sources.layout import write_bucketed
    from tests.conftest import SF_SMOKE

    root = str(tmp_path / "q3bkt")
    write_bucketed(
        t(spark, SF_SMOKE, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "bkt_q3_lineitem", bucket_cols=["l_orderkey"], n_buckets=8,
        sort_cols=["l_orderkey"], path=f"{root}/lineitem",
    )
    write_bucketed(
        t(spark, SF_SMOKE, "orders").select(
            "o_orderkey", "o_custkey", "o_orderdate"
        ),
        "bkt_q3_orders", bucket_cols=["o_orderkey"], n_buckets=8,
        sort_cols=["o_orderkey"], path=f"{root}/orders",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # big-side broadcast off so the l⋈o join must co-locate; re-enable
        # nothing — customer joins via an explicit broadcast() hint below
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.table("bkt_q3_lineitem")
        o = spark.table("bkt_q3_orders")
        c = t(spark, SF_SMOKE, "customer").where(
            F.col("c_mktsegment") == "BUILDING"
        ).select("c_custkey")
        q3ish = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .groupBy("l_orderkey")
            .agg(
                F.sum(
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                    .cast("bigint")
                ).alias("revenue_cents")
            )
            .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
            .limit(10)
        )
        rows = q3ish.collect()
        plan = q3ish._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "BroadcastHashJoin" in plan  # the dim side
        # the join subtree must be exchange-free: the only allowed exchange
        # is the final aggregation/ordering, never feeding the SMJ
        smj_prefix = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange hashpartitioning" not in smj_prefix, (
            "bucketed q3 join must not shuffle either big side"
        )
        assert len(rows) == 10
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_q3_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_q3_orders")


def test_q9_q13_on_cobucketed_facts(spark, tmp_path):
    """VERDICT r04 #2: the ACTUAL q9/q13 plans (queries/tpch.q9_plan /
    q13_plan — same code the registered queries run) over co-bucketed fact
    tables must (1) not shuffle the fact-fact edge and (2) return exactly
    the plain-parquet results."""

    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.queries import t
    from overturemaps_duckdb_spark.queries.tpch import q13_plan, q9_plan
    from overturemaps_duckdb_spark.sources.layout import write_cobucketed
    from tests.conftest import SF_SMOKE

    root = str(tmp_path / "q9bkt")
    li_b, o_b = write_cobucketed(
        spark,
        [
            (t(spark, SF_SMOKE, "lineitem"), "bkt9_lineitem", "l_orderkey"),
            (t(spark, SF_SMOKE, "orders"), "bkt9_orders", "o_orderkey"),
        ],
        root,
        n_buckets=8,
    )
    c_b, o_cb = write_cobucketed(
        spark,
        [
            (t(spark, SF_SMOKE, "customer"), "bkt13_customer", "c_custkey"),
            (t(spark, SF_SMOKE, "orders"), "bkt13_orders", "o_custkey"),
        ],
        root,
        n_buckets=8,
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # big-side broadcast off so the fact edge must co-locate (at SMOKE
        # size Catalyst would otherwise broadcast orders and hide the test).
        # The dims are passed PRE-hinted: dim()'s stat-gate goes unhinted at
        # threshold -1, but an existing broadcast hint on the input frame
        # survives — exactly the production shape (dims broadcast, the
        # fact-fact edge is the one big join).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        q9b = q9_plan(
            li_b,
            F.broadcast(t(spark, SF_SMOKE, "part")),
            F.broadcast(t(spark, SF_SMOKE, "supplier")),
            o_b,
            t(spark, SF_SMOKE, "nation"),
        )
        rows9 = {tuple(r) for r in q9b.collect()}
        # AQE plan strings append an "== Initial Plan ==" section after the
        # Final Plan — cut it off before slicing, or the pre-AQE exchanges
        # below it false-positive the assertion
        plan9 = (
            q9b._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        assert "SortMergeJoin" in plan9
        # plans print top-down: everything after the SMJ line is its input
        # subtree — the bucketed scans — where no shuffle may appear (the
        # final nation×year aggregate exchange sits above the join)
        smj_sub = plan9.split("SortMergeJoin", 1)[1]
        assert "Exchange hashpartitioning" not in smj_sub, (
            "bucketed q9 lineitem⋈orders edge must not shuffle"
        )
        assert "SelectedBucketsCount" in plan9  # reading the bucketed layout

        q13b = q13_plan(c_b, o_cb)
        rows13 = {tuple(r) for r in q13b.collect()}
        plan13 = (
            q13b._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        assert "SortMergeJoin" in plan13
        # the outer join and per-customer count inherit bucket partitioning:
        # the ONLY exchange left is the tiny c_count histogram
        assert plan13.count("Exchange hashpartitioning") <= 1, plan13
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for tbl in ("bkt9_lineitem", "bkt9_orders", "bkt13_customer", "bkt13_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    from overturemaps_duckdb_spark.queries import QUERIES, load_all

    load_all()
    plain9 = {tuple(r) for r in QUERIES["q9_product_type_profit"](spark, SF_SMOKE).collect()}
    plain13 = {tuple(r) for r in QUERIES["q13_customer_distribution"](spark, SF_SMOKE).collect()}
    assert rows9 == plain9
    assert rows13 == plain13


def test_registered_q9_q13_resolve_layout_catalog(spark, tmp_path):
    """VERDICT r06 #4: the REGISTERED q9/q13 (not just the factored plans)
    read the co-bucketed layout when one is registered for their sf_dir —
    zero Exchange on the fact keys — and fall back to plain parquet after
    unregistration (or if the metastore table vanishes), with identical
    values throughout."""

    from overturemaps_duckdb_spark.queries import QUERIES, load_all, t
    from overturemaps_duckdb_spark.sources.layout import (
        register_cobucketed,
        resolve_cobucketed,
        unregister_cobucketed,
        write_cobucketed,
    )
    from tests.conftest import SF_SMOKE

    load_all()
    q9 = QUERIES["q9_product_type_profit"]
    q13 = QUERIES["q13_customer_distribution"]

    # baseline: nothing registered → plain scans, and the values to beat
    assert resolve_cobucketed(spark, SF_SMOKE, "orders", "o_orderkey") is None
    plain9 = {tuple(r) for r in q9(spark, SF_SMOKE).collect()}
    plain13 = {tuple(r) for r in q13(spark, SF_SMOKE).collect()}

    root = str(tmp_path / "cat_bkt")
    write_cobucketed(
        spark,
        [
            (t(spark, SF_SMOKE, "lineitem"), "cat9_lineitem", "l_orderkey"),
            (t(spark, SF_SMOKE, "orders"), "cat9_orders", "o_orderkey"),
        ],
        root,
        n_buckets=8,
    )
    write_cobucketed(
        spark,
        [
            (t(spark, SF_SMOKE, "customer"), "cat13_customer", "c_custkey"),
            (t(spark, SF_SMOKE, "orders"), "cat13_orders", "o_custkey"),
        ],
        root,
        n_buckets=8,
    )
    register_cobucketed(
        SF_SMOKE,
        [
            ("lineitem", "l_orderkey", "cat9_lineitem"),
            ("orders", "o_orderkey", "cat9_orders"),
            ("customer", "c_custkey", "cat13_customer"),
            ("orders", "o_custkey", "cat13_orders"),
        ],
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # broadcast off so the fact edge must co-locate (Catalyst would
        # broadcast orders at SMOKE size and hide the claim).  The
        # registered q9's dim() hints go unhinted at threshold -1, so its
        # dim joins SMJ-shuffle on part/supp keys — the targeted pin is
        # therefore "no Exchange on the BUCKET keys", not a plan slice.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out9 = q9(spark, SF_SMOKE)
        rows9 = {tuple(r) for r in out9.collect()}
        plan9 = (
            out9._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        assert "SelectedBucketsCount" in plan9, "q9 not reading the layout"
        assert "hashpartitioning(l_orderkey" not in plan9
        assert "hashpartitioning(o_orderkey" not in plan9
        assert rows9 == plain9

        out13 = q13(spark, SF_SMOKE)
        rows13 = {tuple(r) for r in out13.collect()}
        plan13 = (
            out13._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        assert "SelectedBucketsCount" in plan13, "q13 not reading the layout"
        assert "hashpartitioning(c_custkey" not in plan13
        assert "hashpartitioning(o_custkey" not in plan13
        assert rows13 == plain13

        # a registration whose metastore table vanished falls back silently
        spark.sql("DROP TABLE IF EXISTS cat9_orders")
        assert (
            resolve_cobucketed(spark, SF_SMOKE, "orders", "o_orderkey") is None
        )
        assert {tuple(r) for r in q9(spark, SF_SMOKE).collect()} == plain9

        # ADVICE r07: q13's gate is both-or-neither like q9's — with one
        # side's table dropped the query must read BOTH sides plain (a
        # mixed bucketed/plain join would silently re-shuffle the
        # bucketed side), and values are unchanged.
        spark.sql("DROP TABLE IF EXISTS cat13_orders")
        out13p = q13(spark, SF_SMOKE)
        plan13p = (
            out13p._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        assert "SelectedBucketsCount" not in plan13p, (
            "q13 must not read a half-registered layout"
        )
        assert {tuple(r) for r in out13p.collect()} == plain13
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        unregister_cobucketed(SF_SMOKE)
        for tbl in ("cat9_lineitem", "cat9_orders", "cat13_customer", "cat13_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    # unregistered again: plain plans, same values
    assert resolve_cobucketed(spark, SF_SMOKE, "customer", "c_custkey") is None
    plan_after = (
        q9(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    )
    assert "SelectedBucketsCount" not in plan_after
