"""Product quantization: ADC numpy parity, rerank==exact when the
shortlist saturates, rejection guards, UDF-free scoring plan."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from overturemaps_duckdb_spark.operators.similarity import (
    cosine_topk,
    pq_adc_topk,
    pq_encode,
    pq_topk_rerank,
    pq_train,
)


def _corpus(spark, n=64, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, dim))
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        X,
    )


def test_adc_matches_numpy_reference(spark):
    df, X = _corpus(spark)
    books = pq_train(df, m=4, n_codes=8, seed=1)
    codes_df = pq_encode(df, books)
    q = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"]): r["adc_score"]
        for r in pq_adc_topk(codes_df, books, q, k=64).collect()
    }
    # reference: float32-roundtripped corpus (parquet-free fixture still
    # passes through array<float>), normalized, encoded, LUT-summed
    Xf = X.astype(np.float32).astype(np.float64)
    Xn = Xf / np.sqrt((Xf * Xf).sum(axis=1, keepdims=True))
    B = np.asarray(books)
    m, k_, sub = B.shape
    codes = np.empty((len(Xn), m), dtype=int)
    for j in range(m):
        d2 = ((Xn[:, None, j * sub : (j + 1) * sub] - B[None, j]) ** 2).sum(
            axis=2
        )
        codes[:, j] = d2.argmin(axis=1)
    for qid in (0, 1):
        qv = Xn[qid]
        lut = np.array(
            [
                [float(np.dot(qv[j * sub : (j + 1) * sub], B[j, c])) for c in range(k_)]
                for j in range(m)
            ]
        )
        for vid in range(len(Xn)):
            want = round(sum(lut[j, codes[vid, j]] for j in range(m)), 6)
            assert got[(qid, vid)] == pytest.approx(want, abs=2e-6)


def test_rerank_equals_exact_when_shortlist_saturates(spark):
    df, _ = _corpus(spark, n=40)
    books = pq_train(df, m=4, n_codes=8, seed=1)
    codes_df = pq_encode(df, books)
    q = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        tuple(r)
        for r in pq_topk_rerank(
            codes_df, books, df, q, k=5, shortlist=40
        ).collect()
    )
    want = sorted(tuple(r) for r in cosine_topk(df, q, k=5).collect())
    assert got == want


def test_encode_rejects_bad_vectors(spark):
    df, _ = _corpus(spark)
    books = pq_train(df, m=4, n_codes=8, seed=1)
    bad_zero = spark.createDataFrame(
        [(0, [0.0] * 16)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="zero-norm"):
        pq_encode(bad_zero, books).collect()
    bad_dim = spark.createDataFrame(
        [(0, [1.0] * 7)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="dim"):
        pq_encode(bad_dim, books).collect()
    bad_null = spark.createDataFrame(
        [(0, [1.0, None] + [1.0] * 14)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="NULL"):
        pq_encode(bad_null, books).collect()


def test_train_guards_and_determinism(spark):
    df, _ = _corpus(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=5, n_codes=8)
    b1 = pq_train(df, m=4, n_codes=8, seed=7)
    b2 = pq_train(df, m=4, n_codes=8, seed=7)
    assert np.array_equal(np.asarray(b1), np.asarray(b2))


def test_adc_scoring_plan_is_udf_free(spark):
    """The 100 TB property: ADC scoring over a materialized code table
    must be pure column math — no Python/Arrow eval node in the plan."""
    df, _ = _corpus(spark)
    books = pq_train(df, m=4, n_codes=8, seed=1)
    codes_rows = pq_encode(df, books).collect()  # materialize codes
    codes_df = spark.createDataFrame(codes_rows, "id long, codes array<int>")
    q = df.where(F.col("vec_id") < 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = (
        pq_adc_topk(codes_df, books, q, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_ivf_pq_store_roundtrip_pruning_and_parity(spark, tmp_path):
    """Composed store: codebooks round-trip, probes prune partitions at
    plan time, probe-all equals the flat ADC+rerank path, and the default
    probe keeps planted-neighbor recall."""
    from overturemaps_duckdb_spark.operators.similarity import (
        ivf_build,
        ivf_pq_topk,
        ivf_pq_write,
        read_pq_codebooks,
    )

    df, _ = _corpus(spark, n=120, dim=16, seed=5)
    books = pq_train(df, m=4, n_codes=16, seed=1)
    assigned, cents = ivf_build(
        df, id_col="vec_id", vec_col="embedding", n_lists=4, seed=42
    )
    path = str(tmp_path / "ivfpq")
    ivf_pq_write(assigned, books, path, centroids=cents)
    assert np.array_equal(read_pq_codebooks(spark, path), np.asarray(books))

    q = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # probe ALL lists → identical to the flat ADC+rerank over all codes
    got = sorted(
        tuple(r)
        for r in ivf_pq_topk(
            spark, path, cents, books, df, q, n_probe=4, k=5, shortlist=120
        ).collect()
    )
    codes_df = pq_encode(df, books)
    want = sorted(
        tuple(r)
        for r in pq_topk_rerank(
            codes_df, books, df, q, k=5, shortlist=120
        ).collect()
    )
    assert got == want

    # pruned probe: the scan's PartitionFilters must carry the _list INSET
    probe = ivf_pq_topk(spark, path, cents, books, df, q, n_probe=2, k=5)
    plan = probe._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    import re

    msource = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert msource and "_list" in msource.group(1)
    # pruned probe still returns k rows per query
    by_q = {}
    for r in probe.collect():
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert all(len(v) == 5 for v in by_q.values())


def test_ivf_pq_append_equals_one_shot(spark, tmp_path):
    """Append-grown store probes identically to a one-shot build from
    the union (same centroids + codebooks ⇒ same codes + lists)."""
    from overturemaps_duckdb_spark.operators.similarity import (
        ivf_build,
        ivf_pq_append,
        ivf_pq_topk,
        ivf_pq_write,
    )

    full, _ = _corpus(spark, n=100, dim=16, seed=9)
    base = full.where(F.col("vec_id") < 70)
    inc = full.where(F.col("vec_id") >= 70)
    books = pq_train(base, m=4, n_codes=16, seed=1)
    assigned, cents = ivf_build(
        base, id_col="vec_id", vec_col="embedding", n_lists=4, seed=42
    )
    grown = str(tmp_path / "grown")
    ivf_pq_write(assigned, books, grown, centroids=cents)
    ivf_pq_append(spark, grown, inc)

    oneshot = str(tmp_path / "oneshot")
    from overturemaps_duckdb_spark.operators.similarity import centroid_assign

    all_assigned = centroid_assign(full, cents)
    ivf_pq_write(all_assigned, books, oneshot, centroids=cents)

    q = full.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        tuple(r)
        for r in ivf_pq_topk(
            spark, grown, cents, books, full, q, n_probe=2, k=5
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivf_pq_topk(
            spark, oneshot, cents, books, full, q, n_probe=2, k=5
        ).collect()
    )
    assert got == want


def test_ivf_pq_all_defaults_recall_floor(spark, tmp_path):
    """End-to-end all-defaults pin for the COMPOSED store (the r11 IVF
    precedent): pq_train + ivf_build + ivf_pq_write + ivf_pq_topk with
    NOTHING overridden must keep mean recall@10 ≥ 0.3 on the fixture
    (measured means 0.52-0.54 across sf0.001/0.01/0.1 — the floor sits
    ≥40% below each).  Guards the coupled defaults (auto n_lists, auto
    n_probe, m=8/n_codes=16 books, shortlist=max(50,5k)) as one path."""
    from overturemaps_duckdb_spark.operators.similarity import (
        ivf_build,
        ivf_pq_topk,
        ivf_pq_write,
    )
    from overturemaps_duckdb_spark.queries import t as _t

    e = _t(spark, "/root/testdata/sf0.01", "embeddings")
    books = pq_train(e, seed=42)
    assigned, cents = ivf_build(
        e, id_col="vec_id", vec_col="embedding", seed=42
    )
    root = str(tmp_path / "store")
    ivf_pq_write(assigned, books, root, centroids=cents)
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pq = ivf_pq_topk(spark, root, cents, books, e, q, k=10)
    exact = cosine_topk(e, q, k=10)
    ex, got = {}, {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in pq.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    rs = [len(ex[k] & got.get(k, set())) / len(ex[k]) for k in ex]
    assert sum(rs) / len(rs) >= 0.3, rs


def test_pq_paths_preserve_string_query_ids(spark):
    """ADVICE-r05 contract shared with the IVF probes: a string-keyed
    query frame must work on the PQ paths too (the id type follows the
    query frame's schema, never a hardcoded long)."""
    df, _ = _corpus(spark, n=30)
    books = pq_train(df, m=4, n_codes=8, seed=1)
    codes_df = pq_encode(df, books)
    q = df.where(F.col("vec_id") < 2).select(
        F.concat(F.lit("q"), F.col("vec_id").cast("string")).alias(
            "query_id"
        ),
        "embedding",
    )
    out = pq_adc_topk(codes_df, books, q, k=3).collect()
    assert {r["query_id"] for r in out} == {"q0", "q1"}
    out2 = pq_topk_rerank(codes_df, books, df, q, k=3, shortlist=30).collect()
    assert {r["query_id"] for r in out2} == {"q0", "q1"}


def test_pq_adc_rejects_bad_query_vectors(spark):
    df, _ = _corpus(spark, n=20)
    books = pq_train(df, m=4, n_codes=8, seed=1)
    codes_df = pq_encode(df, books)
    bad = spark.createDataFrame(
        [(0, [1.0] * 5)], "query_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="non-16-dim"):
        pq_adc_topk(codes_df, books, bad, k=3)
