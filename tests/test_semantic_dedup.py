"""semantic_dedup (SemDeDup) — brute-force parity on a planted fixture,
survivor complement, plan shape (no cartesian), seed/edge guards."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from overturemaps_duckdb_spark.operators.similarity import (
    centroid_assign,
    seed_centroids,
    semantic_dedup,
    semantic_survivors,
)


def _planted(spark):
    """12 vectors in 3 planted directions + noise: ids 0/1/2 are the
    (orthogonal) cluster anchors; each direction carries two near-copies
    (cos≈1) and one mid-similarity member."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = np.eye(3, 8)  # 3 orthogonal anchors in 8 dims
    rows = []
    vid = 0
    for c in range(3):
        anchor = base[c]
        rows.append((vid, [float(x) for x in anchor]))
        vid += 1
    for c in range(3):
        anchor = base[c]
        for jitter in (0.01, 0.02, 0.45):
            v = anchor + jitter * rng.standard_normal(8)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _brute_removed(df, centroids, threshold):
    """Reference removal set computed row-at-a-time in Python."""
    rows = [(r["vec_id"], list(r["embedding"])) for r in df.collect()]

    def d2(v, c):
        return round(sum((float(x) - y) * (float(x) - y) for x, y in zip(v, c)), 6)

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return round(dot / (na * nb), 6)

    assign = {}
    for vid, v in rows:
        ds = [d2(v, c) for c in centroids]
        assign[vid] = ds.index(min(ds))
    removed = {}
    for aid, av in rows:
        for bid, bv in rows:
            if aid >= bid or assign[aid] != assign[bid]:
                continue
            if cos(av, bv) >= threshold and (
                bid not in removed or aid < removed[bid][0]
            ):
                removed[bid] = (aid, cos(av, bv), assign[bid])
    return {
        bid: (assign[bid], aid, c) for bid, (aid, c, _) in removed.items()
    }


def test_semantic_dedup_matches_bruteforce(spark):
    df = _planted(spark)
    cents = seed_centroids(df, 3)
    # the 3 lowest ids ARE the anchors, so clusters = planted directions
    got = {
        r["vec_id"]: (r["cluster"], r["dup_of"], r["cosine"])
        for r in semantic_dedup(df, cents, threshold=0.8, round_d2=6).collect()
    }
    want = _brute_removed(df, cents, 0.8)
    assert got == pytest.approx(want)
    # near-copies (jitter 0.01/0.02) must be removed; anchors survive
    assert all(k >= 3 for k in got)
    assert len(got) >= 3


def test_survivors_complement(spark):
    df = _planted(spark)
    cents = seed_centroids(df, 3)
    removed = {
        r["vec_id"]
        for r in semantic_dedup(df, cents, threshold=0.8, round_d2=6).collect()
    }
    kept = {
        r["vec_id"]
        for r in semantic_survivors(
            df, cents, threshold=0.8, round_d2=6
        ).collect()
    }
    allids = {r["vec_id"] for r in df.collect()}
    assert removed | kept == allids
    assert removed & kept == set()
    # survivors keep the original schema
    surv = semantic_survivors(df, cents, threshold=0.8, round_d2=6)
    assert surv.columns == df.columns


def test_no_cartesian_in_plan(spark):
    df = _planted(spark)
    cents = seed_centroids(df, 3)
    plan = semantic_dedup(df, cents, threshold=0.8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_round_d2_tiebreak_first_index(spark):
    # a vector exactly equidistant from two centroids lands in the FIRST
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    got = {
        r["id"]: r["_list"]
        for r in centroid_assign(df, cents, round_d2=6).collect()
    }
    assert got[2] == 0


def test_seed_centroids_guard(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="only 1"):
        seed_centroids(df, 4)


def test_threshold_one_keeps_exact_dups_only(spark):
    # two bit-identical vectors + one distinct: only the higher id of the
    # identical pair is removed at threshold 1.0
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0]), (2, [-3.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 2.0], [-3.0, 1.0]]
    got = semantic_dedup(df, cents, threshold=1.0, round_d2=6).collect()
    assert [(r["vec_id"], r["dup_of"], r["cosine"]) for r in got] == [
        (1, 0, 1.0)
    ]


def test_collapse_exact_row_identical_on_duplicated_corpus(spark):
    """10×-duplicated corpus: collapse mode must return EXACTLY the
    direct form's removal report (ids, clusters, dup_of, cosines)."""
    base = _planted(spark)
    dup = base
    for k in range(1, 4):
        dup = dup.unionByName(
            base.select(
                (F.col("vec_id") + 100 * k).alias("vec_id"), "embedding"
            )
        )
    cents = seed_centroids(dup, 3)
    want = sorted(
        tuple(r) for r in semantic_dedup(
            dup, cents, threshold=0.8, round_d2=6, collapse_exact=False
        ).collect()
    )
    got = sorted(
        tuple(r) for r in semantic_dedup(
            dup, cents, threshold=0.8, round_d2=6, collapse_exact=True
        ).collect()
    )
    assert got == want
    # every replica beyond the first is removed (cos(v,v)=1 ≥ 0.8), so
    # the report covers at least 3/4 of the corpus
    assert len(got) >= 36


def test_randomized_differential_vs_python_bruteforce(spark):
    """Random corpora (NULL-free, mixed scales, duplicate vectors, random
    centroid counts/thresholds): the operator must equal the row-at-a-time
    Python reference exactly — both collapse modes."""
    import numpy as np

    rng = np.random.default_rng(20260816)
    for trial in range(4):
        n = int(rng.integers(20, 60))
        dim = int(rng.choice([4, 8]))
        n_cents = int(rng.integers(2, 6))
        thr = float(rng.choice([0.2, 0.5, 0.8]))
        X = rng.standard_normal((n, dim)) * rng.choice([0.1, 1.0, 10.0])
        # plant exact duplicates to exercise the collapse path
        for _ in range(int(rng.integers(1, 6))):
            X[int(rng.integers(0, n))] = X[int(rng.integers(0, n))]
        rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cents = seed_centroids(df, n_cents)
        want = {
            bid: (cl, aid, cos)
            for bid, (cl, aid, cos) in _brute_removed(df, cents, thr).items()
        }
        for collapse in (False, True):
            got = {
                r["vec_id"]: (r["cluster"], r["dup_of"], r["cosine"])
                for r in semantic_dedup(
                    df, cents, threshold=thr, round_d2=6,
                    collapse_exact=collapse,
                ).collect()
            }
            assert got.keys() == want.keys(), (trial, collapse)
            for k in got:
                assert got[k][0] == want[k][0], (trial, collapse, k)
                assert got[k][1] == want[k][1], (trial, collapse, k)
                assert got[k][2] == pytest.approx(want[k][2], abs=2e-6), (
                    trial, collapse, k,
                )
