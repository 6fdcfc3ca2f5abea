"""r8 review-fix regressions for sampling/profile/fts edge paths."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_mixture_rates_null_token_stratum(spark):
    """A stratum whose token column is entirely NULL summed to NULL; the
    NULL division skipped through F.least and the rate came out 1000
    (keep all) even for an UNLISTED stratum — violating the
    explicit-mixture contract.  NULL tokens ≡ zero tokens now."""
    from overturemaps_duckdb_spark.operators.sampling import mixture_rates

    df = spark.createDataFrame(
        [("web", 100), ("web", 300), ("ghost", None), ("code", None)],
        "src string, toks int",
    )
    rates = {
        r["src"]: r["rate_pm"]
        for r in mixture_rates(
            df, "src", "toks", {"web": 500, "code": 500}, budget_tokens=400
        ).collect()
    }
    assert rates["ghost"] == 0  # unlisted + NULL tokens: drop, not keep-all
    assert rates["code"] == 1000  # listed but no tokens: keep all (budget unmeetable)
    assert rates["web"] == 500  # 0.5*400/400 = 0.5 → 500 pm


def test_profile_table_hostile_column_names(spark):
    """profile_table interpolated raw names into expr()/stack() — a space
    or dot in a column name failed to parse or resolved as struct access."""
    from overturemaps_duckdb_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "x", 2.0), (2, None, 4.0)], ["min zoom", "addr-name", "a.b"]
    )
    rows = {r["column_name"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"min zoom", "addr-name", "a.b"}
    assert rows["min zoom"]["n_null"] == 0 and rows["min zoom"]["n_distinct"] == 2
    assert rows["addr-name"]["n_null"] == 1
    assert rows["a.b"]["min_v"] == "2.0" and rows["a.b"]["max_v"] == "4.0"


def test_search_all_tables_string_keyed_ids_survive(spark):
    """search_all_tables force-cast every id to long, so string-keyed
    tables (Overture GERS ids) merged with ALL-NULL ids.  Same-typed
    tables keep their type; mixed types widen to string."""
    from overturemaps_duckdb_spark.operators.fts import search_all_tables

    a = spark.createDataFrame(
        [("08f2a5b", "machinery depot"), ("08f2a5c", "quiet cafe")],
        "gid string, txt string",
    )
    b = spark.createDataFrame(
        [("08fffff", "machinery warehouse")], "gid string, txt string"
    )
    out = search_all_tables(
        {"ta": (a, "gid", "txt"), "tb": (b, "gid", "txt")}, "machinery", limit=5
    ).collect()
    ids = {r["id"] for r in out}
    assert None not in ids and ids == {"08f2a5b", "08fffff"}


def test_leakage_safe_split_cluster_coherent(spark):
    """Near-dup cluster members always land on the same side; split is a
    pure function of cluster_id (md5 bucket), fractions are sane."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.operators.sampling import (
        hash_bucket,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    # clusters: pairs (2k, 2k+1) share a cluster labeled by the even id
    clusters = spark.createDataFrame(
        [(i, i - (i % 2)) for i in range(200)], "id long, cluster_id long"
    )
    out = leakage_safe_split(
        docs, "doc_id", clusters, eval_permille=300
    ).collect()
    assert len(out) == 200
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())  # coherent
    n_eval = sum(1 for r in out if r["split"] == "eval")
    assert 0 < n_eval < 200  # both sides populated at 30%
    # function-of-cluster check against the module's own bucket expr
    want = {
        r["cluster_id"]: "eval" if r["b"] < 300 else "train"
        for r in clusters.select(
            "cluster_id", hash_bucket("cluster_id").alias("b")
        ).collect()
    }
    assert all(want[r["cluster_id"]] == r["split"] for r in out)


def test_leakage_safe_split_keeps_df_columns(spark):
    from overturemaps_duckdb_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(1, "a", 7), (2, "b", 9)], "doc_id long, text string, extra int"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "id long, cluster_id long"
    )
    out = leakage_safe_split(docs, "doc_id", clusters)
    assert out.columns == ["doc_id", "text", "extra", "cluster_id", "split"]
