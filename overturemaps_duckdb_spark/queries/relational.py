"""Relational operator inventory — SURVEY.md §2.1-2.8 re-expressed on the
TPC-H-ish fixture tables (TESTDATA.md).

The reference's surface is SQL-string builders over DuckDB
(`/root/reference/src/lib/query.js`, `pipeline.js`, `analysisQueries.js`);
here every operator is declared with the DataFrame API so Catalyst plans it
(pushdown / pruning / join selection / partial aggs are automatic).

Determinism: money doubles are cents-precision → aggregate through
``CAST(ROUND(x*100) AS BIGINT)`` (exact int math, immune to partial-agg
ordering); every LIMIT has a total ORDER BY with a unique tiebreaker.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from overturemaps_duckdb_spark.operators.interval_join import interval_band_join
from overturemaps_duckdb_spark.plans.hints import dim
from overturemaps_duckdb_spark.queries import query, t


def cents(col: str | F.Column) -> F.Column:
    """Exact int64 cents of a 2-decimal money double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


# ---------------------------------------------------------------------------
# §2.1 scans / sources
# ---------------------------------------------------------------------------


@query(
    "s1_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem WHERE l_quantity >= 45.0 AND l_returnflag = 'R'
    """,
)
def s1_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-file parquet scan with predicate+projection pushdown.

    Ref: read_parquet + bbox WHERE + minimal SELECT (themes.js:308-314,
    query.js:35-44).  Catalyst pushes both the filter and the 4-column
    projection into the parquet scan (PushedFilters / ReadSchema).
    """
    return (
        t(spark, sf_dir, "lineitem")
        .where((F.col("l_quantity") >= 45.0) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@query(
    "s5_ctas_ingest_budget",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_orderkey LIMIT 1000
    """,
)
def s5_ctas_ingest_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted CTAS ingest: SELECT proj FROM scan WHERE pred LIMIT n.

    Ref: themes.js:308-314 (CTAS with bbox pushdown and a row budget).
    ORDER BY added for oracle determinism (FIXTURES.md rule 1).
    """
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(1000)
    )


@query(
    "s6_incremental_append",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 1500
    """,
)
def s6_incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental append with a shrinking row budget: batch-1 LIMIT 1000,
    then INSERT of the next 500 — union of the two == first 1500.

    Ref: themes.js:317-330 (INSERT INTO ... LIMIT remaining, progressive
    OFFSET reads).  Spark: limit + offset().limit() unioned.
    """
    base = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
    batch1 = base.limit(1000)
    batch2 = base.offset(1000).limit(500)
    return batch1.unionAll(batch2)


@query(
    "s11_count_probe",
    oracle="SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem",
)
def s11_count_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-count probe (themes.js:251-252,465-467)."""
    return t(spark, sf_dir, "lineitem").agg(F.count("*").alias("c"))


# ---------------------------------------------------------------------------
# §2.2 projections / scalar expressions
# ---------------------------------------------------------------------------


@query(
    "p2_struct_field_access",
    oracle="""
    SELECT c_custkey,
           struct_extract({'primary': c_name}, 'primary') AS display_name
    FROM customer
    """,
)
def p2_struct_field_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct field access `names.primary` (query.js:12).

    The fixtures are flat, so the struct is built in-query and accessed back
    via dot syntax — the same Catalyst path (ExtractValue) used on real
    nested Overture parquet.
    """
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.struct(F.col("c_name").alias("primary")).alias("names"),
    ).select("c_custkey", F.col("names.primary").alias("display_name"))


@query(
    "p3_array_index_1based",
    oracle="""
    SELECT c_custkey,
           string_split(c_name, '#')[1] AS head_part,
           string_split(c_name, '#')[2] AS tail_part
    FROM customer
    """,
)
def p3_array_index_1based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-based array indexing `arr[1]` (constants.js:28,31) →
    `element_at(col, 1)` (also 1-based; **not** `col[0]`)."""
    c = t(spark, sf_dir, "customer")
    parts = F.split(F.col("c_name"), "#")
    # try_element_at, not element_at: under ANSI (this session's default)
    # element_at THROWS on an out-of-bounds index, while the oracle's
    # string_split(...)[2] yields NULL for a name with no '#' — the shim's
    # own NULL-parity convention (r8 review fix; latent on today's
    # all-'Customer#NNN' fixture)
    return c.select(
        "c_custkey",
        F.try_element_at(parts, F.lit(1)).alias("head_part"),
        F.try_element_at(parts, F.lit(2)).alias("tail_part"),
    )


@query(
    "p4_coalesce_cast_empty",
    oracle="""
    SELECT o_orderkey,
           COALESCE(CAST(nullif(o_orderstatus, 'O') AS VARCHAR), '') AS status_name
    FROM orders
    """,
)
def p4_coalesce_cast_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`COALESCE(CAST(x AS VARCHAR), '')` name-fallback chain (query.js:11-13)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")).cast("string"), F.lit("")
        ).alias("status_name"),
    )


@query(
    "p6_concat_ws_search_name",
    oracle="""
    SELECT c_custkey, CONCAT_WS(' ', c_name, c_mktsegment) AS search_name
    FROM customer
    """,
)
def p6_concat_ws_search_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_name composition `CONCAT_WS(' ', name, fields...)`
    (query.js:31-33); CONCAT_WS skips NULLs in both engines."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws(" ", F.col("c_name"), F.col("c_mktsegment")).alias("search_name"),
    )


@query(
    "p7_round",
    oracle="""
    SELECT c_custkey, ROUND(c_acctbal, 1) AS bal_r1 FROM customer
    """,
)
def p7_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ROUND(confidence, 2)`-style rounding (constants.js:27,36)."""
    return t(spark, sf_dir, "customer").select(
        "c_custkey", F.round("c_acctbal", 1).alias("bal_r1")
    )


@query(
    "p8_regexp_replace",
    oracle=r"""
    SELECT o_orderkey, regexp_replace(o_orderpriority, '^[0-9]-', '') AS prio
    FROM orders
    """,
)
def p8_regexp_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`regexp_replace(sources[1].record_id, '@.*', '')` (constants.js:100)."""
    return t(spark, sf_dir, "orders").select(
        "o_orderkey", F.regexp_replace("o_orderpriority", r"^[0-9]-", "").alias("prio")
    )


@query(
    "p9_p10_length_abs",
    oracle="""
    SELECT c_custkey, length(c_name) AS name_len,
           ABS(c_acctbal - 5000.0) AS bal_dist
    FROM customer
    """,
)
def p9_p10_length_abs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`length(search_name)` rank (fts.js:107) + `ABS(Δ)` band term
    (analysisQueries.js:29)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.length("c_name").alias("name_len"),
        F.abs(F.col("c_acctbal") - 5000.0).alias("bal_dist"),
    )


@query(
    "p11_literal_source_tag",
    oracle="""
    SELECT s_suppkey AS id, 'supplier' AS _source,
           CAST(NULL AS VARCHAR) AS _f1, CAST(NULL AS DOUBLE) AS _score
    FROM supplier
    """,
)
def p11_literal_source_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal/source tagging + NULL column padding
    (analysisQueries.js:20, pipeline.js:63,91)."""
    s = t(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").alias("id"),
        F.lit("supplier").alias("_source"),
        F.lit(None).cast("string").alias("_f1"),
        F.lit(None).cast("double").alias("_score"),
    )


@query(
    "p13_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def p13_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string payload column — the Spark-side
    equivalent of DuckDB's JSON functions (extension surface; the `events`
    fixture carries a JSON `props` column)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


# ---------------------------------------------------------------------------
# §2.3 filters / predicates
# ---------------------------------------------------------------------------


@query(
    "f1_interval_overlap",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_quantity <= 20.0 AND l_quantity + l_linenumber >= 18.0
    """,
)
def f1_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bbox interval-overlap test `xmax>=q.xmin AND xmin<=q.xmax`
    (query.js:3-5) as a pair of range predicates Catalyst pushes to the scan."""
    li = t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") <= 20.0)
        & (F.col("l_quantity") + F.col("l_linenumber") >= 18.0)
    ).select("l_orderkey", "l_linenumber")


@query(
    "f3_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity BETWEEN 20.0 AND 30.0
    """,
)
def f3_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`BETWEEN` viewport clip (intersections.js:91-94)."""
    li = t(spark, sf_dir, "lineitem")
    return li.where(F.col("l_quantity").between(20.0, 30.0)).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "f4_ilike_substring",
    oracle="""
    SELECT p_partkey, p_type FROM part WHERE p_type ILIKE '%econ%'
    """,
)
def f4_ilike_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring search `ILIKE '%q%'` (fts.js:24,106);
    native ILIKE in Spark ≥3.3.  The lowercase pattern against the
    fixture's uppercase p_type values makes the case fold load-bearing
    (the r3 '%brass%' pattern certified on 0 = 0 rows — vacuous)."""
    return (
        t(spark, sf_dir, "part")
        .where(F.col("p_type").ilike("%econ%"))
        .select("p_partkey", "p_type")
    )


@query(
    "f5_is_not_null",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'F') AS open_status
    FROM orders WHERE nullif(o_orderstatus, 'F') IS NOT NULL
    """,
)
def f5_is_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`_score IS NOT NULL` FTS-match filter (fts.js:88, pipeline.js:78)."""
    o = t(spark, sf_dir, "orders")
    open_status = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return o.select("o_orderkey", open_status.alias("open_status")).where(
        F.col("open_status").isNotNull()
    )


@query(
    "f8_in_subquery_semi",
    oracle="""
    SELECT c_custkey, c_nationkey FROM customer
    WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%')
    )
    """,
)
def f8_in_subquery_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`id IN (subquery)` membership (pipeline.js:157) — expressed as the
    left-semi joins Catalyst rewrites IN-subqueries to.  Both dims are tiny →
    broadcast."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name").like("A%"))
    asian_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi"
    )
    return c.join(
        F.broadcast(asian_nations), c.c_nationkey == asian_nations.n_nationkey, "left_semi"
    ).select("c_custkey", "c_nationkey")


# ---------------------------------------------------------------------------
# §2.4 joins
# ---------------------------------------------------------------------------
# The reference's joins are all theta joins: cheap band prefilter + exact
# predicate (analysisQueries.js:28-37).  The band condition is kept as an
# explicit join condition so Spark can plan it (broadcast-NL with a cheap
# residual here; range-join at scale), never a bare cartesian.


@query(
    "j1_inner_band_theta_join",
    oracle="""
    SELECT c.c_custkey, s.s_suppkey, c.c_acctbal, s.s_acctbal
    FROM customer c JOIN supplier s
      ON ABS(c.c_acctbal - s.s_acctbal) < 1.5 AND c.c_custkey <> s.s_suppkey
    """,
)
def j1_inner_band_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner theta join: band condition + self-exclusion
    (analysisQueries.js:29-33, pipeline.js:130-132).  Routed through
    operators/interval_join.interval_band_join: broadcast BNL only while
    the pair product fits the micro tier (supplier grows with SF — a
    forced broadcast would OOM at the 100 TB target), the value-bucket
    equi-join otherwise."""
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    return interval_band_join(
        c, s, "c_acctbal", "s_acctbal", width=1.5,
        extra_cond=F.col("c_custkey") != F.col("s_suppkey"),
    ).select("c_custkey", "s_suppkey", "c_acctbal", "s_acctbal")


@query(
    "j2_semi_join_within",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM supplier s
        WHERE ABS(c.c_acctbal - s.s_acctbal) < 0.5
    )
    """,
)
def j2_semi_join_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`within` mode: EXISTS(band AND dist<d) → left-semi join, no row
    duplication (analysisQueries.js:34-35, pipeline.js:141-157); auto-routed
    interval band join (see j1)."""
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    return interval_band_join(
        c, s, "c_acctbal", "s_acctbal", width=0.5, how="left_semi"
    ).select("c_custkey")


@query(
    "j3_anti_join_exclude",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM supplier s
        WHERE ABS(c.c_acctbal - s.s_acctbal) < 0.5
    )
    """,
)
def j3_anti_join_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`exclude` mode: NOT EXISTS → left-anti join
    (analysisQueries.js:36-37, pipeline.js:159-165); auto-routed interval
    band join (see j1)."""
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    return interval_band_join(
        c, s, "c_acctbal", "s_acctbal", width=0.5, how="left_anti"
    ).select("c_custkey")


@query(
    "j4_bidirectional_match",
    oracle="""
    SELECT id FROM (
        SELECT c.c_custkey AS id FROM customer c
        WHERE EXISTS (SELECT 1 FROM supplier s WHERE ABS(c.c_acctbal - s.s_acctbal) < 0.5)
        UNION
        SELECT s.s_suppkey AS id FROM supplier s
        WHERE EXISTS (SELECT 1 FROM customer c WHERE ABS(c.c_acctbal - s.s_acctbal) < 0.5)
    )
    """,
)
def j4_bidirectional_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional matched-id set: ids of base rows hitting B UNION ids of
    B rows hit by base (pipeline.js:141-157).

    The band predicate is SYMMETRIC, so both directions' hit sets are the
    two endpoint projections of ONE matched pair set — the heavy band-join
    subtree is built once and its exchanges reuse across the union, the
    same single-pair-set form the spatial twin measured ~2.1→~1.4 s from
    (operators/spatial_join.bidirectional_match_ids; r8 review fix — this
    used to run the interval band join twice, once per direction)."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    pairs = interval_band_join(c, s, "c_acctbal", "s_acctbal", width=0.5)
    return (
        pairs.select(F.col("c_custkey").alias("id"))
        .union(pairs.select(F.col("s_suppkey").alias("id")))
        .distinct()
    )


@query(
    "j5_join_distinct_matched_b",
    oracle="""
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM customer c JOIN supplier s ON ABS(c.c_acctbal - s.s_acctbal) < 0.5
    """,
)
def j5_join_distinct_matched_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched-B overlay `SELECT DISTINCT b.* FROM A JOIN B ON ...`
    (analysisQueries.js:43-56); auto-routed interval band join (see j1)."""
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    return (
        interval_band_join(c, s, "c_acctbal", "s_acctbal", width=0.5)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "j6_pip_fold_collect",
    oracle="""
    SELECT n.n_nationkey AS pid,
           string_agg(DISTINCT r.r_name, ',' ORDER BY r.r_name) AS labels
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_nationkey
    """,
)
def j6_pip_fold_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon hit-map fold: per-pair join results folded into
    `{id → labels}` (intersections.js:74-109) — in Spark the fold belongs in
    the engine: groupBy + collect_set, rendered as a sorted CSV for parity."""
    n = t(spark, sf_dir, "nation").alias("n")
    r = t(spark, sf_dir, "region").alias("r")
    joined = n.join(F.broadcast(r), F.col("n.n_regionkey") == F.col("r.r_regionkey"))
    return joined.groupBy(F.col("n.n_nationkey").alias("pid")).agg(
        F.array_join(F.sort_array(F.collect_set("r.r_name")), ",").alias("labels")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue_cents DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join chain + agg + top-k (TPC-H Q3 shape) — the hash-join surface
    the reference lacks (SURVEY §2.4 note) but the engine must have.
    customer is the small side after the segment filter, but grows with
    scale factor → stat-gated broadcast (plans.hints.dim), so the plan
    degrades to a shuffle join instead of OOMing past the threshold."""
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING").alias("c")
    o = t(spark, sf_dir, "orders").alias("o")
    li = t(spark, sf_dir, "lineitem").alias("l")
    rev = cents(F.col("l.l_extendedprice") * (1 - F.col("l.l_discount")))
    return (
        li.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(dim(c), F.col("c.c_custkey") == F.col("o.o_custkey"))
        .groupBy("l.l_orderkey", "o.o_orderdate")
        .agg(F.sum(rev).alias("revenue_cents"))
        .select(
            "l_orderkey",
            "revenue_cents",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_nation_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name LIKE 'A%'
    GROUP BY n.n_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join + group-agg (TPC-H Q5 shape).  Constant dims
    (nation/region) broadcast; SF-proportional customer/supplier are
    stat-gated; the orders⋈lineitem fact join shuffles on the order key."""
    c = t(spark, sf_dir, "customer").alias("c")
    o = t(spark, sf_dir, "orders").alias("o")
    li = t(spark, sf_dir, "lineitem").alias("l")
    s = t(spark, sf_dir, "supplier").alias("s")
    n = t(spark, sf_dir, "nation").alias("n")
    r = t(spark, sf_dir, "region").where(F.col("r_name").like("A%")).alias("r")
    rev = cents(F.col("l.l_extendedprice") * (1 - F.col("l.l_discount")))
    return (
        li.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(dim(c), F.col("c.c_custkey") == F.col("o.o_custkey"))
        .join(
            dim(s),
            (F.col("l.l_suppkey") == F.col("s.s_suppkey"))
            & (F.col("s.s_nationkey") == F.col("c.c_nationkey")),
        )
        .join(F.broadcast(n), F.col("c.c_nationkey") == F.col("n.n_nationkey"))
        .join(F.broadcast(r), F.col("n.n_regionkey") == F.col("r.r_regionkey"))
        .groupBy("n.n_name")
        .agg(F.sum(rev).alias("revenue_cents"))
    )


@query(
    "q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 21000
    )
    SELECT o.o_orderkey, o.o_custkey,
           CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS total_qty_cents
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY o.o_orderkey, o.o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-HAVING subquery → semi join → re-aggregate.
    The HAVING aggregate and the final aggregate share the l_orderkey
    shuffle key, so AQE plans the semi join without a second fact shuffle."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    qty = cents("l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_tq"))
        .where(F.col("_tq") > 21000)
        # fresh exprId: big shares lineage with the fact side of the join
        .select(F.col("l_orderkey").alias("_bok"))
    )
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(big, o["o_orderkey"] == big["_bok"], "left_semi")
        .groupBy(o["o_orderkey"], o["o_custkey"])
        .agg(F.sum(qty).alias("total_qty_cents"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT))
                AS BIGINT) AS revenue_tenthousandths,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan→filter→scalar-agg — every predicate reaches
    the parquet scan (PushedFilters) and the aggregate is a two-phase
    partial/final with no grouping shuffle at all."""
    li = t(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000).cast(
        "bigint"
    )
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.02, 0.09))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(rev).alias("revenue_tenthousandths"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# §2.5 aggregations
# ---------------------------------------------------------------------------


@query(
    "a2_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def a2_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT dedup (analysisQueries.js:50-52)."""
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "a3_groupby_source",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           min(value) AS min_value,
           max(value) AS max_value,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def a3_groupby_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by-source aggregation — the reference does this client-side
    (pipelineRunner.js:108-116); in Spark it belongs in the engine where the
    partial aggregation is map-side combined before the shuffle."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(cents("value")).alias("value_cents"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (F.sum(cents("value")) / 100.0 / F.count("*")).alias("avg_value"),
    )


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) AS BIGINT)) AS BIGINT) AS sum_charge_tenthcents,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_price,
           CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary — scan → pushed filter → 8-agg
    group-by on two low-cardinality keys.  Partial aggregation (map-side
    combine) reduces 100 TB of lineitem to `2×#partitions` rows before the
    shuffle; the charge expression stays in whole-stage codegen."""
    li = t(spark, sf_dir, "lineitem")
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents("l_quantity")).alias("sum_qty_cents"),
            F.sum(cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_cents"
            ),
            F.sum(F.round(charge * 10000).cast("bigint")).alias("sum_charge_tenthcents"),
            (F.sum(cents("l_quantity")) / 100.0 / F.count("*")).alias("avg_qty"),
            (F.sum(cents("l_extendedprice")) / 100.0 / F.count("*")).alias("avg_price"),
            (F.sum(cents("l_discount")) / 100.0 / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "a6_count_distinct",
    oracle="""
    SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a6_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group (two-phase partial dedup in Spark)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
    )


def approx_distinct_by(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    *,
    rsd: float = 0.02,
    out_name: str = "approx_n",
    certify: bool = False,
) -> DataFrame:
    """Per-group HyperLogLog++ cardinality — the PRODUCTION form is
    sketch-only (``certify=False``): one hash aggregation whose state is
    a constant-size HLL++ buffer per group, the constant-memory scale
    path a 100 TB cardinality probe needs (an exact COUNT(DISTINCT)
    shuffles every distinct (group, value) pair instead).

    ``certify=True`` is the driver-oracle variant (used by the
    registered ``a7``): it ADDITIONALLY computes the exact distinct
    count and a bounded-error check column — deliberately paying the
    exact count-distinct expand so the engine-portable oracle can
    hash-compare the exact values plus a literal-TRUE error band
    (ADVICE r06: the registered query buys certifiability, THIS flag
    keeps the production plan sketch-only)."""
    approx = F.approx_count_distinct(col, rsd=rsd)
    if not certify:
        return df.groupBy(*group_cols).agg(approx.alias(out_name))
    exact = F.count_distinct(F.col(col)).cast("bigint")
    return df.groupBy(*group_cols).agg(
        exact.alias(out_name),
        (
            F.abs(approx - exact).cast("double")
            <= F.greatest(F.lit(1.0), F.lit(5 * rsd) * exact)
        ).alias("approx_within_5rsd"),
    )


@query(
    "a7_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           TRUE AS approx_within_5rsd
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a7_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count — the scale path for 100 TB cardinality
    probes (constant memory per group vs exact dedup's shuffle).

    Sketch estimates differ across engines, so raw values cannot
    hash-match; the bounded-error oracle (VERDICT r05 #3) instead: the
    CERTIFY variant of :func:`approx_distinct_by` computes BOTH the
    sketch and the exact count and emits ``approx_within_5rsd`` =
    |approx − exact| ≤ max(1, 5·rsd·exact) — 5 standard deviations at
    rsd=0.02, i.e. a 10% band the HLL++ guarantee puts astronomically
    far from violating.  The oracle asserts the same exact counts and a
    literal TRUE, so the driver's hash compare certifies the sketch's
    error bound, not its exact value.  The sketch-only production form
    is ``approx_distinct_by(..., certify=False)`` — a single
    constant-memory aggregation, plan-pinned in tests."""
    return approx_distinct_by(
        t(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        "l_partkey",
        rsd=0.02,
        out_name="n_parts",
        certify=True,
    )


@query(
    "a8_rollup",
    oracle="""
    SELECT COALESCE(r_name, '(all)') AS region_name,
           CAST(count(*) AS BIGINT) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name)
    """,
)
def a8_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets aggregation (Spark builtin; SURVEY §2.5 notes the
    reference lacks it — part of opening the full SQL surface)."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup("r_name")
        .agg(F.count("*").alias("n_nations"))
        .select(F.coalesce("r_name", F.lit("(all)")).alias("region_name"), "n_nations")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_cents DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer — the returnflag
    filter is pushed into the lineitem scan, nation broadcast, customer
    stat-gated (SF-proportional), top-20 via TakeOrderedAndProject (never a
    full sort)."""
    c = t(spark, sf_dir, "customer").alias("c")
    o = t(spark, sf_dir, "orders").alias("o")
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").alias("l")
    n = t(spark, sf_dir, "nation").alias("n")
    rev = cents(F.col("l.l_extendedprice") * (1 - F.col("l.l_discount")))
    return (
        li.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(dim(c), F.col("c.c_custkey") == F.col("o.o_custkey"))
        .join(F.broadcast(n), F.col("c.c_nationkey") == F.col("n.n_nationkey"))
        .groupBy("c.c_custkey", "c.c_name", "n.n_name")
        .agg(F.sum(rev).alias("revenue_cents"))
        .select("c_custkey", "c_name", "revenue_cents", "n_name")
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48
    )
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join →
    group count (Catalyst's RewritePredicateSubquery does the decorrelation
    the reference's hand-built EXISTS strings rely on DuckDB for)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 48)
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q14_promo_revenue_ratio",
    oracle="""
    SELECT ROUND(
        100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                    THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                    ELSE 0 END)
        / SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)),
        6) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-sum ratio over a stat-gated dim join —
    one scalar from one pass, cents-exact numerator and denominator."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    joined = li.join(dim(p), li["l_partkey"] == p["p_partkey"])
    return joined.agg(
        F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct")
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_quantity >= 30
    GROUP BY l.l_linestatus
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional CASE aggregation after a fact join —
    both counts come out of one pass (no per-branch scans)."""
    o = t(spark, sf_dir, "orders").alias("o")
    li = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 30).alias("l")
    high = F.col("o.o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o.o_orderkey") == F.col("l.l_orderkey"))
        .groupBy("l.l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "a9_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a9_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all four grouping sets in one pass
    (Expand + single shuffle, not four scans)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# §2.6 window functions (extension surface — none in the reference)
# ---------------------------------------------------------------------------


@query(
    "w1_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number — the distributed form of the
    reference's client-side per-source bucketing (pipelineRunner.js:108-116).
    Partitioned by a high-cardinality key so no single window partition can
    hot-spot an executor at scale."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


@query(
    "w2_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS running_cents
    FROM orders
    """,
)
def w2_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with an explicit rows frame."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.sum(cents("o_totalprice")).over(w).alias("running_cents")
    )


@query(
    "w3_rank_dense_rank",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_size) AS size_rank,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_dense_rank
    FROM part
    """,
)
def w3_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank with ties (deterministic values under ties)."""
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size")
    return p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(w).alias("size_rank"),
        F.dense_rank().over(w).alias("size_dense_rank"),
    )


# ---------------------------------------------------------------------------
# §2.7 sorts / limits / top-k
# ---------------------------------------------------------------------------


@query(
    "o1_topk_order_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def o1_topk_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k `ORDER BY _score DESC LIMIT k` (fts.js:89-91) — Spark plans
    TakeOrderedAndProject: per-partition heaps, no global sort."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


@query(
    "o4_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def o4_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT+OFFSET pagination (themes.js:326-330)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


@query(
    "o5_balanced_union_limit",
    oracle="""
    SELECT * FROM (
        (SELECT c_custkey AS id, c_name AS name, 'customer' AS _source
         FROM customer ORDER BY c_custkey LIMIT 10)
        UNION ALL
        (SELECT s_suppkey AS id, s_name AS name, 'supplier' AS _source
         FROM supplier ORDER BY s_suppkey LIMIT 10)
    ) ORDER BY _source, id LIMIT 20
    """,
)
def o5_balanced_union_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source balanced limit: union-only pipelines push
    `LIMIT ceil(limit/nSources)` into each source branch (pipeline.js:51-53,99);
    spatial pipelines must NOT (tested in tests/test_pipeline_compiler.py)."""
    c = (
        t(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))
        .orderBy("id")
        .limit(10)
        .withColumn("_source", F.lit("customer"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("id"), F.col("s_name").alias("name"))
        .orderBy("id")
        .limit(10)
        .withColumn("_source", F.lit("supplier"))
    )
    return c.unionByName(s).orderBy("_source", "id").limit(20)


@query(
    "o6_nulls_last_sort",
    oracle="""
    SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
    FROM customer
    ORDER BY seg ASC NULLS LAST, c_custkey LIMIT 50
    """,
)
def o6_nulls_last_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS-LAST multi-key sort (TablePanel.jsx:62-74 semantics, in-engine).
    Spark defaults to nulls-first ASC — explicit asc_nulls_last required."""
    c = t(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"))
        .orderBy(F.col("seg").asc_nulls_last(), F.col("c_custkey"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# §2.8 set operations
# ---------------------------------------------------------------------------


@query(
    "u1_union_all_aligned",
    oracle="""
    SELECT c_custkey AS id, c_name AS display_name, c_mktsegment AS _f0,
           'customer' AS _source
    FROM customer
    UNION ALL
    SELECT s_suppkey AS id, s_name AS display_name, CAST(NULL AS VARCHAR) AS _f0,
           'supplier' AS _source
    FROM supplier
    """,
)
def u1_union_all_aligned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous UNION ALL with NULL `_f` padding + `_source` tag
    (pipeline.js:47-49,62-64; analysisQueries.js:8-23) — idiomatically
    `unionByName(allowMissingColumns=True)`."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("display_name"),
        F.col("c_mktsegment").alias("_f0"),
        F.lit("customer").alias("_source"),
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("display_name"),
        F.lit("supplier").alias("_source"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@query(
    "u2_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of id sets (pipeline.js:148)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "u3_intersect_except",
    oracle="""
    SELECT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    )
    EXCEPT
    SELECT n_nationkey AS nationkey FROM nation WHERE n_regionkey = 0
    """,
)
def u3_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set ops (Spark builtins; absent in the reference —
    SURVEY §2.8)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    n0 = (
        t(spark, sf_dir, "nation")
        .where(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").alias("nationkey"))
    )
    return c.intersect(s).exceptAll(n0.distinct())


_A10_ACC = 1000


@query(
    "a10_approx_quantile_band",
    oracle="""
    SELECT l_returnflag,
           CAST(count(l_extendedprice) AS BIGINT) AS nn,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS q50_exact,
           ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS q95_exact,
           TRUE AS band_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a10_approx_quantile_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch certification (the a7/n3 bounded-error pattern):
    DuckDB cannot reproduce Spark's ``approx_percentile`` sketch, but it
    CAN reproduce the exact quantiles and assert the sketch's published
    guarantee.  Per group: the exact q50/q95 (Spark ``percentile`` —
    same linear interpolation as DuckDB ``quantile_cont``, value-hashed)
    and ``band_ok`` = the approx value's RANK INTERVAL (count <, count ≤
    — duplicates give the value a rank span) intersects the target rank
    ± nn/accuracy + 2, the sketch's ε·n contract with slack for the
    rank-definition off-by-ones.  The rank probe is one broadcast join
    of the 3-row approx frame back to the data — an aggregate pass, no
    sort, no UDF."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").alias("_v")
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count("_v").alias("nn"),
        F.round(F.expr("percentile(_v, 0.5)"), 6).alias("q50_exact"),
        F.round(F.expr("percentile(_v, 0.95)"), 6).alias("q95_exact"),
        F.expr(f"approx_percentile(_v, array(0.5D, 0.95D), {_A10_ACC})").alias(
            "_ap"
        ),
    )
    ap = agg.select(
        "l_returnflag", "nn", "q50_exact", "q95_exact",
        F.col("_ap")[0].alias("_a50"), F.col("_ap")[1].alias("_a95"),
    )
    ranks = (
        li.join(F.broadcast(ap.select("l_returnflag", "_a50", "_a95")),
                "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("_v") < F.col("_a50"), 1).otherwise(0)).alias("_lo50"),
            F.sum(F.when(F.col("_v") <= F.col("_a50"), 1).otherwise(0)).alias("_hi50"),
            F.sum(F.when(F.col("_v") < F.col("_a95"), 1).otherwise(0)).alias("_lo95"),
            F.sum(F.when(F.col("_v") <= F.col("_a95"), 1).otherwise(0)).alias("_hi95"),
        )
    )

    def _ok(lo, hi, p):
        target = F.lit(p) * (F.col("nn") - 1).cast("double") + 1.0
        tol = F.col("nn").cast("double") / _A10_ACC + 2.0
        return ~(
            (F.col(hi).cast("double") < target - tol)
            | (F.col(lo).cast("double") + 1.0 > target + tol)
        )

    return (
        ap.join(ranks, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("nn").cast("bigint").alias("nn"),
            "q50_exact",
            "q95_exact",
            (_ok("_lo50", "_hi50", 0.5) & _ok("_lo95", "_hi95", 0.95)).alias(
                "band_ok"
            ),
        )
    )
