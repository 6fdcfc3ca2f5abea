"""Salted-aggregation equivalence + render-batch iteration tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from overturemaps_duckdb_spark.operators.skew import (
    iterate_batches,
    salted_agg,
    salted_distinct_count,
)
from tests.conftest import SF_SMOKE


def test_salted_agg_equals_plain(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    plain = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("cents"),
        F.max("l_quantity").alias("mx"),
    )
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {
            "n": (F.count("*"), F.sum("n")),
            "cents": (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")),
                F.sum("cents"),
            ),
            "mx": (F.max("l_quantity"), F.max("mx")),
        },
    )
    p = {r["l_returnflag"]: (r["n"], r["cents"], r["mx"]) for r in plain.collect()}
    s = {r["l_returnflag"]: (r["n"], r["cents"], r["mx"]) for r in salted.collect()}
    assert p == s


def test_salted_distinct_count_equals_plain(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    plain = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    salted = {
        r["o_orderstatus"]: r["n_distinct_o_custkey"]
        for r in salted_distinct_count(o, ["o_orderstatus"], "o_custkey").collect()
    }
    assert plain == salted


def test_iterate_batches(spark):
    df = spark.range(1234).select(F.col("id"))
    sizes = [len(b) for b in iterate_batches(df, batch_size=500)]
    assert sum(sizes) == 1234
    assert max(sizes) <= 500
    assert sizes[:-1] == [500, 500]  # full batches first, remainder last
