"""ct1 / x18 operator tests: shingle containment (asymmetric near-dup)
and the add-1-smoothed bigram LM cross-entropy."""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F

from overturemaps_duckdb_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from overturemaps_duckdb_spark.operators.textprep import bigram_logprob


def _shingles(text: str, k: int = 5) -> set[str]:
    import re

    norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    if len(norm) <= k:
        return {norm}
    return {norm[i : i + k] for i in range(len(norm) - k + 1)}


# ---------------------------------------------------------------------------
# containment
# ---------------------------------------------------------------------------


def test_containment_catches_quote_jaccard_misses(spark):
    """A short doc verbatim inside a much longer page: containment ≈ 1,
    Jaccard small — the asymmetric case this operator exists for."""
    quote = "the quick brown fox jumps over the lazy dog"
    rng = random.Random(11)
    filler = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(7))
        for _ in range(120)
    )
    df = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler[::-1])],
        "id long, text string",
    )
    cont = ngram_containment_pairs(df, "id", "text", threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row["a_id"], row["b_id"], row["contained_id"]) == (1, 2, 1)
    assert row["containment"] >= 0.99
    jac = ngram_jaccard_pairs(df, "id", "text", threshold=0.3).collect()
    assert jac == []  # symmetric similarity is blind to the quote


def test_containment_matches_python_reference(spark):
    rng = random.Random(23)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 12))))
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r["a_id"], r["b_id"]): (r["containment"], r["contained_id"])
        for r in ngram_containment_pairs(df, "id", "text", threshold=0.5).collect()
    }
    want = {}
    sets = {i: _shingles(t) for i, t in rows}
    for a in range(25):
        for b in range(a + 1, 25):
            c = len(sets[a] & sets[b])
            denom = min(len(sets[a]), len(sets[b]))
            cont = round(c / denom, 6)
            if cont >= 0.5:
                if len(sets[a]) < len(sets[b]):
                    contained = a
                elif len(sets[b]) < len(sets[a]):
                    contained = b
                else:
                    contained = a
                want[(a, b)] = (cont, contained)
    assert got == want


def test_containment_cap_preserves_exact_values(spark):
    """stop_df_cap: unhit cap is a no-op; a low cap only drops pairs,
    surviving values stay exact (full-set verification)."""
    rng = random.Random(7)
    boiler = "all rights reserved contact us"
    rows = []
    for i in range(20):
        body = " ".join(
            "".join(rng.choice("abcdefghij") for _ in range(6)) for _ in range(6)
        )
        rows.append((i, body + " " + boiler))
    rows.append((100, "unique quoted passage about spark"))
    rows.append((101, "prefix words unique quoted passage about spark suffix tail"))
    df = spark.createDataFrame(rows, "id long, text string")
    plain = {
        (r["a_id"], r["b_id"]): (r["containment"], r["contained_id"])
        for r in ngram_containment_pairs(df, "id", "text", threshold=0.4).collect()
    }
    nocap = {
        (r["a_id"], r["b_id"]): (r["containment"], r["contained_id"])
        for r in ngram_containment_pairs(
            df, "id", "text", threshold=0.4, stop_df_cap=10_000
        ).collect()
    }
    assert nocap == plain
    capped = {
        (r["a_id"], r["b_id"]): (r["containment"], r["contained_id"])
        for r in ngram_containment_pairs(
            df, "id", "text", threshold=0.4, stop_df_cap=5
        ).collect()
    }
    assert set(capped) <= set(plain)
    for pair, val in capped.items():
        assert val == plain[pair]
    assert (100, 101) in capped and capped[(100, 101)][1] == 100


def test_containment_collapse_identical_to_plain(spark):
    """collapse_exact on a duplicated corpus is row-identical to the
    per-document path — intra 1.0 pairs, inherited cross values, and the
    contained_id side/tie resolution all line up."""
    rng = random.Random(31)
    words = ["red", "green", "blue", "cyan", "teal", "plum"]
    base = [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 10)))
        for _ in range(12)
    ]
    rows = []
    rid = 0
    for text in base:
        for _ in range(rng.randint(1, 4)):  # exact duplicates, mixed counts
            rows.append((rid, text))
            rid += 1
    rows.append((500, None))  # NULL text drops out of both paths
    df = spark.createDataFrame(rows, "id long, text string")
    kw = dict(shingle_k=5, threshold=0.5)
    plain = {
        (r["a_id"], r["b_id"], r["containment"], r["contained_id"])
        for r in ngram_containment_pairs(
            df, "id", "text", collapse_exact=False, **kw
        ).collect()
    }
    collapsed = {
        (r["a_id"], r["b_id"], r["containment"], r["contained_id"])
        for r in ngram_containment_pairs(
            df, "id", "text", collapse_exact=True, **kw
        ).collect()
    }
    assert collapsed == plain
    assert any(c == 1.0 for _, _, c, _ in plain)  # the dup pairs are present


def test_cross_corpus_containment_quote_attribution(spark):
    """A benchmark item quoted whole inside a long train doc scores 1.0
    against THAT train doc; partial quotes score their exact gram share;
    empty-normalized bench docs are excluded."""
    from overturemaps_duckdb_spark.operators.textprep import (
        cross_corpus_containment,
    )

    bench_text = "what is the capital of france and when was it founded"
    # bench doc 1: 11 tokens -> 4 distinct 8-grams
    filler = " ".join(f"w{i}" for i in range(60))
    rows_train = [
        (100, filler + " " + bench_text + " " + filler),  # full quote
        (101, "what is the capital of france and when here it stops"),  # 1 of 4 grams
        (102, filler),  # no overlap
    ]
    rows_bench = [(1, bench_text), (2, "!!! ...")]  # 2 normalizes empty
    train = spark.createDataFrame(rows_train, "id long, text string")
    bench = spark.createDataFrame(rows_bench, "id long, text string")
    out = {
        (r["a_id"], r["b_id"]): (r["containment"], r["n_shared"])
        for r in cross_corpus_containment(
            train, bench, "id", "text", n=8, threshold=0.1
        ).collect()
    }
    assert out[(100, 1)] == (1.0, 4)
    assert out[(101, 1)] == (0.25, 1)
    assert (102, 1) not in out
    assert not any(b == 2 for _, b in out)


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------


def _bigram_reference(rows: list[tuple[int, str]], alpha: float = 1.0):
    import re

    toks = {
        i: [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split(" ") if w]
        for i, t in rows
    }
    vocab = {w for ws in toks.values() for w in ws}
    cb: dict[tuple[str, str], int] = {}
    for ws in toks.values():
        for l, r in zip(ws, ws[1:]):
            cb[(l, r)] = cb.get((l, r), 0) + 1
    cl: dict[str, int] = {}
    for (l, _), c in cb.items():
        cl[l] = cl.get(l, 0) + c
    out = {}
    for i, ws in toks.items():
        if len(ws) < 2:
            continue
        s = 0
        n = 0
        per_pair: dict[tuple[str, str], int] = {}
        for l, r in zip(ws, ws[1:]):
            per_pair[(l, r)] = per_pair.get((l, r), 0) + 1
        for (l, r), tf in per_pair.items():
            p = (cb[(l, r)] + alpha) / (cl[l] + alpha * len(vocab))
            s += math.floor(-tf * math.log(p) * 1e6 + 0.5)
            n += tf
        micro = (2 * s + n) // (2 * n)
        out[i] = (n, micro / 1e6)
    return out


def test_bigram_logprob_matches_python_reference(spark):
    rng = random.Random(41)
    words = ["aa", "bb", "cc", "dd", "ee"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 9))))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["n_bigrams"], r["nll"])
        for r in bigram_logprob(df, "id", "text").collect()
    }
    want = _bigram_reference(rows)
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0]
        assert got[i][1] == want[i][1], f"doc {i}: {got[i][1]} != {want[i][1]}"


def test_bigram_logprob_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "two tokens"), (4, None)],
        "id long, text string",
    )
    rows = {r["id"]: r for r in bigram_logprob(df, "id", "text").collect()}
    assert set(rows) == {3}
    assert rows[3]["n_bigrams"] == 1


def test_doc_novelty_extremes_and_reference(spark):
    """Exact duplicates score 0.0, fully unique prose scores 1.0, and the
    general case matches a python reference over the hashed gram space."""
    from overturemaps_duckdb_spark.operators.textprep import doc_novelty

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "completely different words live here in this document body"),
        (4, "short doc"),  # < n tokens → whole-doc gram, unique → 1.0
        (5, ""),  # no tokens → excluded
        (6, None),  # NULL → excluded
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in doc_novelty(df, "id", "text", n=8).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[3]["novelty"] == 1.0
    assert out[4]["novelty"] == 1.0 and out[4]["n_grams"] == 1

    # python reference on a random corpus
    import re

    rng = random.Random(19)
    words = ["aa", "bb", "cc", "dd"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 12))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["n_grams"], r["novelty"])
        for r in doc_novelty(df, "id", "text", n=3).collect()
    }
    grams = {}
    for i, t in rows:
        tk = [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split() if w]
        gs = {
            " ".join(tk[j : j + 3])
            for j in range(max(len(tk) - 2, 1))
        }
        grams[i] = gs
    dfreq: dict[str, int] = {}
    for gs in grams.values():
        for g in gs:
            dfreq[g] = dfreq.get(g, 0) + 1
    for i, gs in grams.items():
        u = sum(1 for g in gs if dfreq[g] == 1)
        assert got[i] == (len(gs), round(u / len(gs), 6)), i


def test_bigram_logprob_partition_invariant(spark):
    rows = [
        (i, f"tok{i % 3} tok{(i + 1) % 4} tok{(i + 2) % 3} tok{i % 5}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    base = {
        (r["id"], r["n_bigrams"], r["nll"])
        for r in bigram_logprob(df, "id", "text").collect()
    }
    shuffled = {
        (r["id"], r["n_bigrams"], r["nll"])
        for r in bigram_logprob(
            df.repartition(7, F.col("id")), "id", "text"
        ).collect()
    }
    assert base == shuffled


def test_perplexity_buckets_tercile_contract(spark):
    """Terciles are ordered (head ⇒ lowest nll), cover every scored doc,
    and are balanced within interpolation slack."""
    import sys

    sys.path.insert(0, "/root/repo")
    from overturemaps_duckdb_spark import queries as q

    q.load_all()
    rows = q.QUERIES["x20_perplexity_buckets"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by = {"head": [], "middle": [], "tail": []}
    for r in rows:
        by[r["bucket"]].append(r["nll"])
    assert all(by.values())
    assert max(by["head"]) <= min(by["middle"]) or not by["middle"]
    assert max(by["middle"]) <= min(by["tail"]) or not by["tail"]
    n = len(rows)
    for b in by.values():
        assert abs(len(b) - n / 3) <= max(3, 0.1 * n)
