"""Round-4 d2 scale features.

Exact-duplicate collapse is output-equivalent by construction (identical
inputs → identical signatures/buckets; these tests pin it).  The
signature-agreement pre-verify gate is a DOCUMENTED bounded recall
tradeoff, not an equivalence: a pair whose exact Jaccard sits at the
threshold has ≈2 % probability (binomial tail on the unconstrained
hashes) of estimating > margin below it and being dropped pre-verify —
the oracle applies the identical gate, so both engines agree on the
result.  The corpora here sit far from the boundary, so gated and
ungated outputs coincide and the tests can pin set equality."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from overturemaps_duckdb_spark.operators.dedup import (
    _sig_gate_k,
    cross_corpus_minhash_pairs,
    minhash_lsh_pairs,
)


def _corpus(spark, replicas: int = 3):
    """20 base docs (2 of them a true near-dup pair), each replicated
    `replicas` times with distinct ids — exact-dup groups AND cross-group
    near-dups, the shape collapse_exact exists for."""
    rng = random.Random(11)
    base = []
    for i in range(18):
        body = " ".join(
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
            for _ in range(10)
        )
        base.append(body)
    near = "the quick brown fox jumps over the lazy dog again and again"
    base.append(near)
    base.append(near + " once more")
    rows = []
    for rep in range(replicas):
        for i, text in enumerate(base):
            rows.append((rep * 1000 + i, text))
    return spark.createDataFrame(rows, "id long, text string")


def _pairs(df, **kw):
    return {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in minhash_lsh_pairs(df, "id", "text", **kw).collect()
    }


def test_collapse_matches_doc_level(spark):
    """collapse_exact=True must reproduce the per-document pipeline's pairs
    and values exactly on a duplicated corpus: intra-group Jaccard-1.0
    pairs, cross-group near-dups at the representatives' score, and
    nothing else."""
    df = _corpus(spark)
    collapsed = _pairs(df, collapse_exact=True)
    doc_level = _pairs(df, collapse_exact=False)
    assert collapsed == doc_level
    # structure sanity: every doc has 3 exact copies -> C(3,2)*20 intra
    # pairs at jaccard 1.0, plus the near-dup pair across all 3x3 replicas
    ones = {(a, b) for a, b, j in collapsed if j == 1.0}
    assert len(ones) == 3 * 20
    cross = {(a, b) for a, b, j in collapsed if j < 1.0}
    assert len(cross) == 9  # 3 copies of doc 18 x 3 copies of doc 19


def test_collapse_unique_corpus_identity(spark):
    """On an all-unique corpus the collapse path degenerates to the
    doc-level result (all groups singleton, no intra pairs)."""
    df = _corpus(spark, replicas=1)
    assert _pairs(df, collapse_exact=True) == _pairs(df, collapse_exact=False)


def test_sig_gate_never_drops_band_guaranteed(spark):
    """Gate at or below one band's row count is vacuous and must be
    skipped; an active gate keeps every pair whose signatures agree."""
    assert _sig_gate_k(0.5, 0.0625, 16, 4) == 7
    assert _sig_gate_k(0.5, None, 16, 4) is None
    # threshold - margin at or below rows/n_hashes -> gate can never fire
    assert _sig_gate_k(0.25, 0.0625, 16, 4) is None
    df = _corpus(spark, replicas=2)
    gated = _pairs(df, sig_gate_margin=0.0625)
    ungated = _pairs(df, sig_gate_margin=None)
    # exact dups agree on 16/16 hashes; the true near-dup pair here is far
    # above threshold - the gate must not change this corpus's output
    assert gated == ungated


def test_cross_corpus_gate_matches_ungated(spark):
    df = _corpus(spark, replicas=2)
    corpus = df.where(F.col("id") < 1000)
    probe = df.where(F.col("id") >= 1000)

    def run(margin):
        return {
            (r["a_id"], r["b_id"], r["jaccard"])
            for r in cross_corpus_minhash_pairs(
                corpus, probe, "id", "text", sig_gate_margin=margin
            ).collect()
        }

    gated, ungated = run(0.0625), run(None)
    assert gated == ungated and len(gated) >= 20


def test_embedding_collapse_matches_doc_level(spark):
    """d5's vector collapse: identical embeddings grouped before LSH must
    reproduce the per-vector pipeline exactly (intra pairs at cosine(v,v),
    cross pairs at the representatives' score)."""
    import math
    import random

    from overturemaps_duckdb_spark.operators.dedup import embedding_neardup_pairs

    rng = random.Random(3)
    base = []
    for _ in range(30):
        v = [rng.gauss(0, 1) for _ in range(16)]
        n = math.sqrt(sum(x * x for x in v))
        base.append([x / n for x in v])
    rows = []
    vid = 0
    for rep in range(3):  # replicate every vector bit-identically
        for v in base:
            rows.append((vid, v))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def run(ce):
        return sorted(
            (r["a_id"], r["b_id"], r["cosine"])
            for r in embedding_neardup_pairs(
                df, "vec_id", "embedding", threshold=0.3, dim=16,
                collapse_exact=ce,
            ).collect()
        )

    a, b = run(True), run(False)
    assert a == b and len(a) >= 3 * 30  # at least every intra pair


def test_cross_corpus_collapse_matches_doc_level(spark):
    from overturemaps_duckdb_spark.operators.dedup import cross_corpus_minhash_pairs

    df = _corpus(spark, replicas=3)
    corpus = df.where(F.col("id") < 2000)
    probe = df.where(F.col("id") >= 2000)

    def run(ce):
        return sorted(
            (r["a_id"], r["b_id"], r["jaccard"])
            for r in cross_corpus_minhash_pairs(
                corpus, probe, "id", "text", collapse_exact=ce
            ).collect()
        )

    a, b = run(True), run(False)
    assert a == b and len(a) >= 20


def test_streamed_pair_explode_matches_reference_construction(spark):
    """r8 scale fix: every intra/in-bucket pair expansion now streams
    through `_explode_ordered_pairs` (two-stage posexplode + tail-slice)
    instead of exploding the C(n,2)-struct array `_ordered_pair_structs`
    builds inside one value (69 s vs 0.9 s for the 2M fixture's 999M
    intra pairs).  Pin the two constructions pair-for-pair equal on
    randomized ragged groups, including payload carry-through and the
    degenerate 1-member/empty shapes."""
    import random

    from overturemaps_duckdb_spark.operators.dedup import (
        _explode_ordered_pairs,
        _ordered_pair_structs,
    )

    rng = random.Random(7)
    rows = []
    for g in range(40):
        n = rng.choice([0, 1, 2, 3, 7, 25])
        ids = sorted(rng.sample(range(10_000), n))
        rows.append((g, ids, float(g) / 10.0))
    df = spark.createDataFrame(rows, "g int, gids array<int>, pay double")

    ref = (
        df.select("pay", F.explode(_ordered_pair_structs(F.col("gids"))).alias("p"))
        .select("p.a_id", "p.b_id", "pay")
    )
    streamed = _explode_ordered_pairs(df, "gids", ["pay"]).select(
        "a_id", "b_id", "pay"
    )
    key = lambda r: (r["a_id"], r["b_id"], r["pay"])
    assert sorted(map(key, streamed.collect())) == sorted(map(key, ref.collect()))
    # sanity: C(n,2) totals for the generated sizes
    import math

    expected = sum(math.comb(len(r[1]), 2) for r in rows)
    assert streamed.count() == expected


def test_dedup_clusters_string_ids(spark):
    """r8 review fix: cluster ids were cast('long'), so string/UUID doc
    ids NULLed out, the neighbor join never matched, and the sum-based
    convergence probe compared None == None — all-(NULL, NULL)
    assignments with no error.  Ids now keep their own (orderable)
    type."""
    from overturemaps_duckdb_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [("doc-a",), ("doc-b",), ("doc-c",), ("doc-z",)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("doc-a", "doc-b"), ("doc-b", "doc-c")], "a_id string, b_id string"
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in dedup_clusters(docs, "doc_id", pairs).collect()
    }
    assert got == {
        "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a", "doc-z": "doc-z"
    }


def test_dedup_clusters_nonconvergence_raises(spark):
    """r8 review fix: hitting max_iter without a fixpoint used to return
    silently-wrong split clusters; it must fail loudly.  A monotone chain
    converges in ONE contraction round (and max_iter=1 must ACCEPT it —
    the empty-edge check runs after every contraction, not only at the
    next iteration's top; review off-by-one), so the loud path needs a
    genuinely 2-round topology: the path 1-4-3-2, whose hooking forms two
    local-minimum trees ({1,4}→1, {2,3}→2) with one inter-tree edge left."""
    import pytest

    from overturemaps_duckdb_spark.operators.dedup import dedup_clusters

    chain_docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "a_id long, b_id long"
    )
    got = dedup_clusters(chain_docs, "doc_id", chain, max_iter=1)
    assert {r["cluster_id"] for r in got.collect()} == {0}

    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 4), (4, 3), (3, 2)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(docs, "doc_id", pairs, max_iter=1)
    got = dedup_clusters(docs, "doc_id", pairs, max_iter=2)
    assert {r["cluster_id"] for r in got.collect()} == {1}


def test_band_keys_rejects_non_dividing_bands(spark):
    """r8 review fix: 16 hashes / 3 bands silently banded positions 1..15
    and dropped #16 from every band."""
    import pytest

    from overturemaps_duckdb_spark.operators.dedup import minhash_lsh_pairs

    d = spark.createDataFrame([(1, "some text")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(d, "doc_id", "text", n_hashes=16, bands=3)


def test_dedup_clusters_pointer_jump_chain(spark):
    """r12: Boruvka hook/jump/contract — a 200-link chain (diameter far
    beyond the default max_iter=25 under the old min-label loop, which
    needed one round per hop) converges in ONE contraction round: hooking
    builds the chain as a single parent path rooted at 0 and pointer
    doubling on that FOREST resolves it in ~8 jump rounds.  Every node
    must land on cluster 0."""
    from overturemaps_duckdb_spark.operators.dedup import dedup_clusters

    n = 200
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    got = dedup_clusters(docs, "doc_id", pairs)  # default max_iter
    assert {r["cluster_id"] for r in got.collect()} == {0}


def test_dedup_clusters_jump_path_matches_union_find(spark):
    """Value differential on a random multi-component graph deep enough
    to need several jump rounds and (with broken chains + chords) more
    than one contraction round: the distributed labels must equal a
    driver-side union-find ground truth.  This test killed the first r12
    attempt (composing min-LABELS as comp(comp) — which does not double
    reach and failed to converge in 25 rounds)."""
    import random

    from overturemaps_duckdb_spark.operators.dedup import dedup_clusters

    rng = random.Random(7)
    n = 400
    # several long paths + random chords: multiple components, deep trees
    edges = [(i, i + 1) for i in range(0, n - 1) if i % 37 != 0]
    edges += [(rng.randrange(n), rng.randrange(n)) for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # ground truth: min node id per component
    comp_min: dict[int, int] = {}
    for i in range(n):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    truth = {i: comp_min[find(i)] for i in range(n)}

    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {
        r["id"]: r["cluster_id"]
        for r in dedup_clusters(docs, "doc_id", pairs).collect()
    }
    assert got == truth


def test_dedup_clusters_unknown_pair_ids_do_not_leak(spark):
    """Contract guard (r12 review): a pair table referencing ids absent
    from df (stale pairs, superset corpus) must neither leak those ids in
    as cluster labels nor connect df documents through them."""
    from overturemaps_duckdb_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame([(5,), (6,), (7,)], "doc_id long")
    pairs = spark.createDataFrame(
        # (5,2): 2 unknown — must not become 5's label; (6,1),(1,7):
        # 1 unknown — must not bridge 6 and 7 either (the edge itself is
        # outside the corpus)
        [(5, 2), (6, 1), (1, 7), (6, 7)],
        "a_id long, b_id long",
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in dedup_clusters(docs, "doc_id", pairs).collect()
    }
    assert got == {5: 5, 6: 6, 7: 6}
