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


def test_skew_report_planted_hotkey(spark):
    """A planted 10×-hot key must surface as hot key, max, and ratio."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.operators.skew import skew_report

    # keys 0..9 with 5 rows each, key 7 with 50
    base = spark.range(50).select((F.col("id") % 10).alias("k"))
    hot = spark.range(45).select(F.lit(7).alias("k"))
    r = skew_report(base.union(hot), ["k"]).collect()[0]
    assert r["n_rows"] == 95
    assert r["n_keys"] == 10
    assert r["max_key_rows"] == 50
    assert r["hot_k"] == 7
    assert r["hot_rows"] == 50
    assert abs(r["skew_ratio"] - 50 / 9.5) < 1e-9
    assert r["p50_key_rows"] == 5.0


def test_skew_report_tiebreak_min_key(spark):
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.operators.skew import skew_report

    df = spark.range(20).select((F.col("id") % 4).alias("k"))  # all equal
    r = skew_report(df, ["k"]).collect()[0]
    assert r["hot_k"] == 0 and r["hot_rows"] == 5
    assert abs(r["skew_ratio"] - 1.0) < 1e-9


def test_skew_report_fractional_percentile_names(spark):
    """ADVICE r04: 0.999 must label as p99_9_key_rows, never the lie
    p100_key_rows (round(p*100) mislabeled it)."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.operators.skew import skew_report

    df = spark.range(100).select((F.col("id") % 10).alias("k"))
    out = skew_report(df, ["k"], percentiles=(0.5, 0.999))
    assert "p99_9_key_rows" in out.columns
    assert "p100_key_rows" not in out.columns
    r = out.collect()[0]
    assert r["p50_key_rows"] == 10.0 and r["p99_9_key_rows"] == 10.0


def test_skew_report_tiny_percentile_names_sql_safe(spark):
    """ADVICE r05: tiny percentiles must never name via exponent notation
    (%g gave p=1e-9 the column p1e-07_key_rows — '-' needs backtick
    quoting downstream).  Fixed-point, trailing zeros stripped, and every
    name stays in [A-Za-z0-9_]."""
    import re

    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.operators.skew import skew_report

    df = spark.range(100).select((F.col("id") % 10).alias("k"))
    out = skew_report(df, ["k"], percentiles=(1e-9, 0.5, 0.99999951))
    assert "p0_0000001_key_rows" in out.columns
    assert "p99_999951_key_rows" in out.columns
    for c in out.columns:
        assert re.fullmatch(r"[A-Za-z0-9_]+", c), c


def test_salted_handles_map_columns_and_identical_rows(spark):
    """r8 review fix: xxhash64 rejects MapType columns (Overture
    names/sources), and a hot key whose rows are identical across all
    columns hashed to ONE salt — the exact heavy-state case salting
    targets.  Maps are skipped and position enters the hash, so identical
    rows spread."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.operators.skew import salted, salted_agg

    df = spark.range(0, 1000).select(
        F.lit("hot").alias("k"),
        F.lit(1).alias("v"),
        F.create_map(F.lit("a"), F.lit("b")).alias("m"),  # MapType column
    )
    s = salted(df, n_salts=8)
    n_salt_values = s.select("_salt").distinct().count()
    assert n_salt_values > 1  # identical rows no longer funnel into one salt

    out = salted_agg(
        df, ["k"], {"n": (F.count("*"), F.sum("n")), "s": (F.sum("v"), F.sum("s"))}
    ).collect()
    assert len(out) == 1 and out[0]["n"] == 1000 and out[0]["s"] == 1000


def test_salted_unique_col_is_content_derived(spark):
    """r9 ADVICE fix: the position-based fallback salt can reassign salts
    on task retry when the input's intra-partition order is unstable
    (SPARK-23207 class).  With unique_col the salt is a pure function of
    row CONTENT: recomputation under any reordering yields the same
    per-row salt, and identical-payload rows still spread (ids differ)."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.operators.skew import salted, salted_agg

    df = spark.range(0, 1000).select(
        F.col("id").alias("uid"),
        F.lit("hot").alias("k"),
        F.lit(1).alias("v"),
    )
    a = {r["uid"]: r["_salt"] for r in salted(df, 8, unique_col="uid").collect()}
    # same rows, deliberately re-ordered and re-partitioned: salts identical
    shuffled = df.repartition(13, "v").sortWithinPartitions(F.desc("uid"))
    b = {
        r["uid"]: r["_salt"]
        for r in salted(shuffled, 8, unique_col="uid").collect()
    }
    assert a == b
    assert len(set(a.values())) > 1  # identical-payload rows still spread

    out = salted_agg(
        df,
        ["k"],
        {"n": (F.count("*"), F.sum("n")), "s": (F.sum("v"), F.sum("s"))},
        unique_col="uid",
    ).collect()
    assert len(out) == 1 and out[0]["n"] == 1000 and out[0]["s"] == 1000


def test_salted_unique_col_null_ids_still_spread(spark):
    """ADVICE r09: xxhash64(NULL) passes the seed through, so every
    NULL-id row used to share ONE constant salt — the exact funnel
    salting exists to avoid.  NULL ids now fall back per-row to the
    position-id hash; non-null ids keep the pure-content salt."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.operators.skew import salted

    df = spark.range(0, 1000).select(
        F.when(F.col("id") < 500, F.col("id")).alias("uid"),
        F.lit("hot").alias("k"),
    )
    rows = salted(df, 8, unique_col="uid").collect()
    null_salts = {r["_salt"] for r in rows if r["uid"] is None}
    assert len(null_salts) > 1, "500 NULL-id rows funneled into one salt"
    # non-null rows are unaffected: still the content-derived salt
    nn = {r["uid"]: r["_salt"] for r in rows if r["uid"] is not None}
    base = {
        r["uid"]: r["_salt"]
        for r in salted(
            df.where(F.col("uid").isNotNull()), 8, unique_col="uid"
        ).collect()
    }
    assert nn == base
