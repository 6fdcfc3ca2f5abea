"""TPC-H breadth — the remaining query shapes (Q2/Q7/Q8/Q9/Q11/Q13/Q15/Q16/
Q17/Q19/Q20/Q21/Q22) adapted to the fixture schema (TESTDATA.md).

The fixtures have no ``partsupp`` table and no comment/commit/receipt
columns, so each query keeps its canonical TPC-H *plan shape* (correlated
min, disjunctive OR pushdown, EXISTS/NOT-EXISTS double self-join, scalar
subquery threshold, outer-join histogram, ...) re-targeted at columns that
exist; ``lineitem`` stands in for ``partsupp`` as the part↔supplier link.

These are the hash/semi/anti-join and scalar-subquery surfaces the reference
engine reaches through raw DuckDB SQL (`/root/reference/src/react/
SqlQueryPanel.jsx:103-124` accepts arbitrary SQL); here each is a Catalyst
plan with explicit broadcast/shuffle choices that survive a 1000-executor
scale-up: dims broadcast, facts shuffle once on their join key, scalar
thresholds travel as broadcast 1-row crosses, and every EXISTS is a
semi/anti join (never a collected list).

Determinism follows the registry rules: money through exact int cents,
threshold comparisons as cross-multiplied integer inequalities (never a
double multiply at the boundary), and no LIMIT without a total ORDER BY.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from overturemaps_duckdb_spark.queries import query, t
from overturemaps_duckdb_spark.plans.hints import dim
from overturemaps_duckdb_spark.queries.relational import cents

_REV_CENTS_SQL = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def _rev_cents(prefix: str = "") -> F.Column:
    p = f"{prefix}." if prefix else ""
    return cents(F.col(f"{p}l_extendedprice") * (1 - F.col(f"{p}l_discount")))


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH mn AS (
        SELECT l_partkey,
               MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS min_price_cents
        FROM lineitem GROUP BY l_partkey
    )
    SELECT DISTINCT p.p_partkey, p.p_brand, s.s_name, n.n_name, mn.min_price_cents
    FROM part p
    JOIN mn ON mn.l_partkey = p.p_partkey
    JOIN lineitem l ON l.l_partkey = p.p_partkey
     AND CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) = mn.min_price_cents
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE' AND p.p_size = 15
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-MIN subquery → join-back on the min.

    ``lineitem`` plays partsupp; the grouped min and the join-back share the
    l_partkey shuffle key so AQE reuses one exchange.  part/supplier/nation/
    region are dims → broadcast; the only fact shuffle is the partkey agg.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_size") == 15)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    mn = li.groupBy(F.col("l_partkey").alias("_mk")).agg(
        F.min(cents("l_extendedprice")).alias("min_price_cents")
    )
    return (
        li.join(mn, (li["l_partkey"] == mn["_mk"])
                & (cents("l_extendedprice") == F.col("min_price_cents")))
        .join(dim(p), li["l_partkey"] == p["p_partkey"])
        .join(dim(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("p_partkey", "p_brand", "s_name", "n_name", "min_price_cents")
        .distinct()
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation trade volume by year.

    The nation-pair disjunction is applied AFTER both dim joins (it spans
    both sides); nation joins are broadcasts so the disjunction never forces
    a fact-fact shuffle beyond the one orders⋈lineitem exchange.
    """
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).alias("l")
    o = t(spark, sf_dir, "orders").alias("o")
    c = t(spark, sf_dir, "customer").alias("c")
    s = t(spark, sf_dir, "supplier").alias("s")
    n1 = t(spark, sf_dir, "nation").alias("n1")
    n2 = t(spark, sf_dir, "nation").alias("n2")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(dim(c), F.col("c.c_custkey") == F.col("o.o_custkey"))
        .join(dim(s), F.col("s.s_suppkey") == F.col("l.l_suppkey"))
        .join(F.broadcast(n1), F.col("n1.n_nationkey") == F.col("s.s_nationkey"))
        .join(F.broadcast(n2), F.col("n2.n_nationkey") == F.col("c.c_nationkey"))
        .select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l.l_shipdate").cast("int").alias("l_year"),
            _rev_cents("l").alias("_rev"),
        )
        .where(pair)
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("_rev").alias("revenue_cents"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               {_REV_CENTS_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} AS rev_cents,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_cents ELSE 0 END)
                AS BIGINT) AS nation_cents,
           CAST(SUM(rev_cents) AS BIGINT) AS total_cents
    FROM vol GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share within a region per year.

    Share surfaces as the exact (nation_cents, total_cents) integer pair
    rather than a division — bit-stable across partial-agg orderings; the
    consumer divides.  Single fact shuffle (orders⋈lineitem); all dims
    broadcast; the conditional sum is a map-side partial agg.
    """
    li = t(spark, sf_dir, "lineitem").alias("l")
    p = t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").alias("p")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).alias("o")
    c = t(spark, sf_dir, "customer").alias("c")
    s = t(spark, sf_dir, "supplier").alias("s")
    n1 = t(spark, sf_dir, "nation").alias("n1")
    n2 = t(spark, sf_dir, "nation").alias("n2")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA").alias("r")
    rev = _rev_cents("l")
    return (
        li.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(dim(p), F.col("p.p_partkey") == F.col("l.l_partkey"))
        .join(dim(c), F.col("c.c_custkey") == F.col("o.o_custkey"))
        .join(dim(s), F.col("s.s_suppkey") == F.col("l.l_suppkey"))
        .join(F.broadcast(n1), F.col("n1.n_nationkey") == F.col("c.c_nationkey"))
        .join(F.broadcast(r), F.col("r.r_regionkey") == F.col("n1.n_regionkey"))
        .join(F.broadcast(n2), F.col("n2.n_nationkey") == F.col("s.s_nationkey"))
        .select(
            F.year("o.o_orderdate").cast("int").alias("o_year"),
            rev.alias("_rev"),
            F.col("n2.n_name").alias("_sn"),
        )
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("_sn") == "NATION_3", F.col("_rev")).otherwise(F.lit(0)))
            .alias("nation_cents"),
            F.sum("_rev").alias("total_cents"),
        )
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                  - CAST(ROUND(p.p_retailprice * l.l_quantity * 100) AS BIGINT))
                AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × year over a part filter.

    ``p_retailprice * l_quantity`` stands in for ps_supplycost; both profit
    terms are exact-cents BEFORE the subtraction so the sum is order-stable.

    The fact tables resolve through the layout catalog: when a
    co-bucketed lineitem/orders(orderkey) layout is registered for
    ``sf_dir`` the fact-fact join reads co-located buckets with no
    Exchange (and runs FIRST, so a non-broadcast dim join can't destroy
    the bucket partitioning before it's consumed); otherwise plain
    parquet (the driver/oracle path).
    """
    from overturemaps_duckdb_spark.sources.layout import resolve_cobucketed

    li_b = resolve_cobucketed(spark, sf_dir, "lineitem", "l_orderkey")
    o_b = resolve_cobucketed(spark, sf_dir, "orders", "o_orderkey")
    bucketed = li_b is not None and o_b is not None
    return q9_plan(
        li_b if bucketed else t(spark, sf_dir, "lineitem"),
        t(spark, sf_dir, "part"),
        t(spark, sf_dir, "supplier"),
        o_b if bucketed else t(spark, sf_dir, "orders"),
        t(spark, sf_dir, "nation"),
        fact_first=bucketed,
    )


def q9_plan(
    li: DataFrame,
    p: DataFrame,
    s: DataFrame,
    o: DataFrame,
    n: DataFrame,
    *,
    fact_first: bool = False,
) -> DataFrame:
    """Q9's plan over caller-supplied frames — the registered query passes
    plain parquet reads; the bucketed variant (layout catalog, bench
    extras, test_layout) passes lineitem/orders bucketed on the orderkey,
    which deletes the one fact-fact Exchange (the repeated l_orderkey
    shuffle VERDICT r04 flagged) while the dim joins stay broadcast.

    ``fact_first`` joins lineitem⋈orders BEFORE the dim joins: on the
    co-bucketed layout the bucket partitioning must be consumed before
    any non-broadcast dim join re-shuffles lineitem on a dim key and
    destroys it.  Plain-path callers keep the default (selective dim
    joins first shrink lineitem before the big fact shuffle)."""
    li, p, s, o, n = (
        li.alias("l"),
        p.where(F.col("p_type") == "ECONOMY").alias("p"),
        s.alias("s"),
        o.alias("o"),
        n.alias("n"),
    )
    profit = _rev_cents("l") - cents(F.col("p.p_retailprice") * F.col("l.l_quantity"))
    if fact_first:
        joined = (
            li.join(o, F.col("o.o_orderkey") == F.col("l.l_orderkey"))
            .join(dim(p), F.col("p.p_partkey") == F.col("l.l_partkey"))
            .join(dim(s), F.col("s.s_suppkey") == F.col("l.l_suppkey"))
        )
    else:
        joined = (
            li.join(dim(p), F.col("p.p_partkey") == F.col("l.l_partkey"))
            .join(dim(s), F.col("s.s_suppkey") == F.col("l.l_suppkey"))
            .join(o, F.col("o.o_orderkey") == F.col("l.l_orderkey"))
        )
    return (
        joined.join(
            F.broadcast(n), F.col("n.n_nationkey") == F.col("s.s_nationkey")
        )
        .groupBy(
            F.col("n.n_name").alias("nation"),
            F.year("o.o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).alias("profit_cents"))
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH v AS (
        SELECT l.l_partkey,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, value_cents FROM v
    WHERE value_cents * 1000 > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM v)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a scalar fraction-of-total subquery.

    The threshold compare is cross-multiplied integers (value*1000 > total) —
    no double at the boundary.  The scalar total travels as a broadcast
    1-row cross join, and the grouped frame is computed once and reused for
    both sides (shared shuffle under AQE).
    """
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    v = (
        li.join(dim(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("l_partkey")
        .agg(F.sum(cents("l_extendedprice")).alias("value_cents"))
    )
    total = v.agg(F.sum("value_cents").alias("_total"))
    return (
        v.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") * 1000 > F.col("_total"))
        .select("l_partkey", "value_cents")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer-join order counts → count histogram.

    The join predicate filter lives IN the left-join condition (not a WHERE,
    which would drop zero-order customers).  count("o_orderkey") counts
    non-null matches only — the outer-join null row contributes 0.

    Facts resolve through the layout catalog (see q9): with a
    customer/orders(custkey) co-bucketed layout registered, the outer
    join AND the per-customer count are Exchange-free.  The gate is
    both-or-neither like q9's (ADVICE r07): a partial registration (one
    side's metastore table dropped) would otherwise plan a mixed
    bucketed/plain join that silently re-shuffles the bucketed side —
    values identical, Exchange-free claim quietly lost.
    """
    from overturemaps_duckdb_spark.sources.layout import resolve_cobucketed

    c_b = resolve_cobucketed(spark, sf_dir, "customer", "c_custkey")
    o_b = resolve_cobucketed(spark, sf_dir, "orders", "o_custkey")
    bucketed = c_b is not None and o_b is not None
    return q13_plan(
        c_b if bucketed else t(spark, sf_dir, "customer"),
        o_b if bucketed else t(spark, sf_dir, "orders"),
    )


def q13_plan(c: DataFrame, o: DataFrame) -> DataFrame:
    """Q13's plan over caller-supplied frames — the bucketed variant passes
    customer/orders bucketed on the customer key, making the outer join AND
    the per-customer count Exchange-free (they inherit the bucket
    partitioning); only the tiny c_count histogram still shuffles."""
    o = o.where(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts with a NOT-IN exclusion.

    The NOT IN compiles to a broadcast anti join against the (tiny) filtered
    supplier keys — never a collected list; negative-balance suppliers play
    the 'customer complaints' exclusion.

    NULL-semantics note (r9 review, accepted divergence): ANSI ``NOT IN``
    returns UNKNOWN for every row when the subquery yields ANY NULL (the
    whole result empties), and drops NULL probe keys; a left-anti join
    keeps both.  Here both sides are primary/foreign KEYS — non-null by
    schema contract in TPC-H and in the fixtures — so the forms are
    equivalent; apply the anti-join rewrite to nullable columns only with
    an explicit null guard on both sides.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("_bad_sk"))
    )
    return (
        li.join(dim(bad), li["l_suppkey"] == F.col("_bad_sk"), "left_anti")
        .join(dim(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH avgq AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qc,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
    JOIN avgq a ON a.l_partkey = l.l_partkey
    WHERE CAST(ROUND(l.l_quantity * 100) AS BIGINT) * a.n * 5 < a.sum_qc
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines below 20% of their part's average quantity.

    ``qty < 0.2 * avg`` is cross-multiplied to ``qty_cents * n * 5 < sum_qc``
    — exact integer math at the boundary in both engines.  The per-part
    average and the probe share the l_partkey shuffle key.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    avgq = li.groupBy(F.col("l_partkey").alias("_ak")).agg(
        F.sum(cents("l_quantity")).alias("_sum_qc"),
        F.count("*").alias("_n"),
    )
    return (
        li.join(dim(p), li["l_partkey"] == p["p_partkey"])
        .join(avgq, li["l_partkey"] == F.col("_ak"))
        .where(cents("l_quantity") * F.col("_n") * 5 < F.col("_sum_qc"))
        .agg(
            F.sum(cents("l_extendedprice")).alias("revenue_cents"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(SUM({_REV_CENTS_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three-branch OR spanning both join sides.

    Catalyst extracts the common single-side conjuncts (brand∈{...},
    size≤15, quantity ranges) below the join and keeps the cross-side OR as
    the post-join filter — the classic Q19 pushdown test.
    """
    li = t(spark, sf_dir, "lineitem").alias("l")
    p = t(spark, sf_dir, "part").alias("p")
    b = lambda brand, szhi, qlo, qhi: (  # noqa: E731
        (F.col("p.p_brand") == brand)
        & F.col("p.p_size").between(1, szhi)
        & F.col("l.l_quantity").between(qlo, qhi)
    )
    cond = b("Brand#12", 5, 1, 11) | b("Brand#23", 10, 10, 20) | b("Brand#33", 15, 20, 30)
    return (
        li.join(dim(p), F.col("p.p_partkey") == F.col("l.l_partkey"))
        .where(cond)
        .agg(
            F.sum(_rev_cents("l")).alias("revenue_cents"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q20_excess_inventory",
    oracle="""
    WITH pq AS (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) > 5000
    )
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_4', 'NATION_7')
      AND s.s_suppkey IN (SELECT l_suppkey FROM pq)
    """,
)
def q20_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved >50 units of some filtered part.

    The HAVING-filtered (suppkey, partkey) aggregate reduces to a distinct
    suppkey set that semi-joins the (tiny) supplier dim — at scale the heavy
    side is the aggregate, and it shuffles once on its own group key.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_4", "NATION_7")
    )
    pq = (
        li.join(dim(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(cents("l_quantity")).alias("_qc"))
        .where(F.col("_qc") > 5000)
        .select(F.col("l_suppkey").alias("_pk"))
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(pq, s["s_suppkey"] == F.col("_pk"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey AND l1.l_returnflag = 'R'
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
    )
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT-EXISTS double self-join, rewritten as
    ONE per-order distinct-supplier aggregate.

    Adapted: returnflag='R' stands in for late receipt — the sole-returning
    supplier in multi-supplier 'F' orders.  The classic decorrelation: for
    l1's order, EXISTS(other supplier) ⟺ countDistinct(suppkey) ≥ 2 (l1's
    own supplier is counted), and NOT EXISTS(other RETURNING supplier) ⟺
    countDistinct(R-suppkey) = 1 (l1 itself is R, so exactly-one means
    l1 alone).  Two lineitem shuffles total (the per-orderkey aggregate +
    the orderkey equi-join back to l1) replace the r3 plan's three passes
    with semi/anti inequality-residual joins — ~2× at sf1 and strictly
    fewer exchanges at any scale.
    """
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l1 = li.where(F.col("l_returnflag") == "R")
    per_order = li.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("_n_s"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_n_r"),
    )
    return (
        l1.join(o, l1["l_orderkey"] == o["o_orderkey"])
        .join(per_order, l1["l_orderkey"] == F.col("_ok"))
        .where((F.col("_n_s") >= 2) & (F.col("_n_r") == 1))
        .join(dim(s), l1["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q22_dormant_customers",
    oracle="""
    WITH pos AS (
        SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS tot,
               CAST(count(*) AS BIGINT) AS n
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c.c_nationkey % 5 AS INTEGER) AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS totacctbal_cents
    FROM customer c, pos
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.tot
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY cntrycode
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers dormant since 1999.

    ``acctbal > avg(positive acctbal)`` is cross-multiplied to
    ``acctbal_cents * n > tot`` (exact ints).  The nationkey%5 bucket plays
    Q22's phone-prefix country code; the order probe is a shuffled anti join
    on custkey (the scale-correct form — never an IN-list collect), with the
    dormancy date filter pushed into the probe-side scan.
    """
    c = t(spark, sf_dir, "customer")
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
        .select(F.col("o_custkey").alias("_oc"))
    )
    pos = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(F.sum(cents("c_acctbal")).alias("_tot"), F.count("*").alias("_n"))
    )
    return (
        c.join(o, c["c_custkey"] == F.col("_oc"), "left_anti")
        .crossJoin(F.broadcast(pos))
        .where(cents("c_acctbal") * F.col("_n") > F.col("_tot"))
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(cents("c_acctbal")).alias("totacctbal_cents"),
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS total_revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue "view" per supplier over a quarter, then the
    supplier(s) hitting the global max.

    The revenue aggregate is computed ONCE and reused for both the max
    threshold and the join-back (Catalyst reuses the exchange under AQE);
    the 1-row max crosses as a broadcast, supplier is a broadcast dim — the
    only fact shuffle is the suppkey aggregation.  Revenue is exact int
    cents, so the max-equality join is deterministic (no double compare).
    """
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_cents()).alias("total_revenue_cents")
    )
    mx = revenue.agg(F.max("total_revenue_cents").alias("_mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue_cents") == F.col("_mx"))
        .join(dim(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_cents")
        .orderBy("s_suppkey")
    )
