"""End-to-end QUALITY controls for co-defined operator families (VERDICT
r08 next-round #5).

The engine and its DuckDB oracle share the formula for these operators
(declared lockstep policy), so parity rows certify agreement, not
quality — the r8 LSH plane degeneracy stayed parity-green for seven
rounds.  Each family therefore needs a control whose expected answer
comes from OUTSIDE the shared formula: a labeled fixture, an
independently-coded reference implementation, or a statistical estimate
vs ground truth.  The LSH plane family's control lives in
test_lsh_recall_pin.py; this file covers the rest of the inventory
(COVERAGE.md "Quality-compensating controls"):

- lang_id: labeled multilingual sentences, 100% accuracy required;
- quality_score: curated prose must separate cleanly from curated junk;
- MinHash: signature agreement must estimate TRUE Jaccard within
  statistical tolerance on planted-overlap sets;
- SimHash: hamming distance must separate one-token edits from
  unrelated documents;
- BM25: ranking must match an independently-coded Okapi BM25 and
  exhibit the qualitative IDF/tf/length properties.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

# ---------------------------------------------------------------------------
# lang_id — labeled fixture
# ---------------------------------------------------------------------------

LABELED_SENTENCES = [
    # English: common stopwords (the/of/and/is/that/it/for/in/a)
    ("the quick brown fox jumps over the lazy dog and it is happy", "en"),
    ("this is the report that was written for the board of directors", "en"),
    ("a summary of the results is given in the final section", "en"),
    ("it was the best of times and it was the worst of times", "en"),
    ("the data pipeline is running and the results are ready for review", "en"),
    # German: der/die/das/und/ist/nicht/mit/ein
    ("der hund und die katze sind nicht mit dem auto gefahren", "de"),
    ("das wetter ist heute schoen und die sonne scheint nicht", "de"),
    ("ein mann ist mit der bahn in die stadt gefahren", "de"),
    ("die kinder spielen mit dem ball und der hund ist dabei", "de"),
    ("das buch ist nicht mit der post gekommen und der brief fehlt", "de"),
    # French: le/la/les/de/et/est/que/pour
    ("le chat et le chien sont dans la maison pour la nuit", "fr"),
    ("la réponse est que les résultats sont prêts pour les clients", "fr"),
    ("les enfants jouent dans le jardin et la mère est contente", "fr"),
    ("le train est parti de la gare et les passagers sont arrivés", "fr"),
    ("la lettre est pour le directeur et les documents sont prêts", "fr"),
    # Undetermined: no stopword hits in any language
    ("zzz qqq xxx yyy", "und"),
    ("1234 5678 90", "und"),
    ("", "und"),
]


def test_lang_id_labeled_fixture(spark):
    """Every curated sentence must classify to its true language — an
    end-to-end accuracy control the per-edge pins (ties, empty, NULL)
    never provided.  The fixture uses ordinary prose built from each
    language's everyday function words, not adversarial minimal pairs, so
    100% is the correct bar for a stopword classifier."""
    from overturemaps_duckdb_spark.functions.text import lang_id

    df = spark.createDataFrame(LABELED_SENTENCES, "text string, label string")
    rows = df.select("label", lang_id("text").alias("got")).collect()
    wrong = [(r["label"], r["got"]) for r in rows if r["got"] != r["label"]]
    assert not wrong, f"lang_id misclassified: {wrong}"


# ---------------------------------------------------------------------------
# quality_score — separation fixture
# ---------------------------------------------------------------------------

GOOD_PROSE = [
    "The committee reviewed the proposal in detail and concluded that the "
    "project should continue with additional funding for the next year.",
    "Researchers at the university published a study showing that regular "
    "exercise improves both memory and concentration in older adults.",
    "The new library opened its doors to the public last week and offers "
    "a wide selection of books for readers of all ages and interests.",
]

#: In-scope junk only: quality_score is alpha-ratio + stopword-density +
#: length windows — token REPETITION ("buy buy buy…" scores 0.46) and
#: fluent-looking gibberish are deliberately out of its scope, covered by
#: the separate x7_repetition_signals / x3_lang_id operators.
JUNK_TEXTS = [
    "",  # empty
    "!!! ### $$$ %%% @@@ ^^^ &&& *** ((( )))",  # pure punctuation
    "a b c d e f g h i j k l m n o p",  # 1-char tokens (mean len < 3)
    "x" * 30000,  # over the length window, one giant token
    "9283 7461 1038 5521 8474 0021 6655 3321",  # numeric noise
]


def test_quality_score_separates_prose_from_junk(spark):
    """Absolute-threshold consumers (x11's percentile filter, Gopher-style
    rules) need the score to MEAN something: curated clean prose must
    clear 0.9 and in-scope junk must stay at or under 0.4, with a wide
    gap between the worst prose and the best junk (measured: prose
    0.92-0.94, junk 0.0-0.4)."""
    from overturemaps_duckdb_spark.functions.text import quality_score

    df = spark.createDataFrame(
        [(t, "good") for t in GOOD_PROSE] + [(t, "junk") for t in JUNK_TEXTS],
        "text string, label string",
    )
    rows = df.select("label", quality_score("text").alias("q")).collect()
    good = [r["q"] for r in rows if r["label"] == "good"]
    junk = [r["q"] for r in rows if r["label"] == "junk"]
    assert min(good) >= 0.9, f"prose scored too low: {sorted(good)}"
    assert max(junk) <= 0.4, f"junk scored too high: {sorted(junk)}"
    assert min(good) > max(junk) + 0.45  # clean separation margin


# ---------------------------------------------------------------------------
# MinHash — agreement estimates true Jaccard
# ---------------------------------------------------------------------------


def test_minhash_agreement_estimates_true_jaccard(spark):
    """The whole LSH stack rests on Pr[minhash agree] = Jaccard.  Planted
    integer-hash sets with EXACT known overlap: the 64-hash signature
    agreement must track true Jaccard within 0.15 (> 3σ of the binomial
    std √(J(1−J)/64) ≈ 0.06).  A systematic bias — e.g. correlated
    coefficients, a broken universal-hash mod — shows up here long before
    any parity row could see it."""
    from overturemaps_duckdb_spark.operators.dedup import (
        minhash_signature_from_hashes,
    )

    n_hashes = 64
    # element values mimic hashed_shingles' 30-bit range (the universal
    # hash (h·a+b) mod P assumes h < P ≈ 2³¹; larger values overflow the
    # int64 multiply under ANSI) — disjoint strided ranges per set
    def hset(block: int, n: int) -> list[int]:
        return [(block * 20_000_000 + 577 * i + 13) % (1 << 30) for i in range(n)]

    cases = []  # (a_elems, b_elems, true_jaccard)
    base = hset(1, 120)
    for idx, shared in enumerate((20, 60, 100)):
        other = hset(10 + idx, 120 - shared)
        a = base
        b = base[:shared] + other
        inter, union = shared, 240 - shared
        cases.append((a, b, inter / union))

    rows = [(i, a, b) for i, (a, b, _) in enumerate(cases)]
    df = spark.createDataFrame(
        rows, "case_id int, a array<bigint>, b array<bigint>"
    )
    got = df.select(
        "case_id",
        minhash_signature_from_hashes(F.col("a"), n_hashes=n_hashes).alias("sa"),
        minhash_signature_from_hashes(F.col("b"), n_hashes=n_hashes).alias("sb"),
    ).collect()
    for r in got:
        true_j = cases[r["case_id"]][2]
        agree = sum(x == y for x, y in zip(r["sa"], r["sb"])) / n_hashes
        assert abs(agree - true_j) <= 0.15, (
            f"case {r['case_id']}: agreement {agree:.3f} vs true J {true_j:.3f}"
        )


# ---------------------------------------------------------------------------
# SimHash — hamming separation
# ---------------------------------------------------------------------------


def test_simhash_hamming_separates_edits_from_unrelated(spark):
    """SimHash quality = near-identical docs land at small hamming
    distance, unrelated docs far: a one-token edit of a 40-token doc must
    stay within 3/16 bits, while unrelated random-vocabulary docs must
    average ≥ 4 bits apart (16-bit simhash: unrelated expectation is 8)."""
    from overturemaps_duckdb_spark.operators.dedup import simhash

    def doc(seed: int, n: int = 40) -> str:
        return " ".join(f"w{(seed * 37 + i * seed + i * i) % 9973}" for i in range(n))

    originals = [doc(s) for s in range(2, 10)]
    edited = [d.rsplit(" ", 1)[0] + " zedit" for d in originals]
    rows = (
        [(f"o{i}", d) for i, d in enumerate(originals)]
        + [(f"e{i}", d) for i, d in enumerate(edited)]
    )
    df = spark.createDataFrame(rows, "id string, text string")
    # explicit bits=16: this control certifies the 16-bit TIER the d3
    # contract uses (the operator default widened to the scale-safe 60
    # bits in r10 — a one-token edit proportionally shifts ~4× the bits
    # there, which is the same relative locality, not a regression)
    h = {
        r["id"]: r["h"]
        for r in df.select("id", simhash("text", bits=16).alias("h")).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    edit_d = [ham(h[f"o{i}"], h[f"e{i}"]) for i in range(len(originals))]
    cross_d = [
        ham(h[f"o{i}"], h[f"o{j}"])
        for i in range(len(originals))
        for j in range(i + 1, len(originals))
    ]
    assert max(edit_d) <= 3, f"one-token edits drifted: {edit_d}"
    mean_cross = sum(cross_d) / len(cross_d)
    assert mean_cross >= 4.0, f"unrelated docs too close: mean {mean_cross:.2f}"
    assert max(edit_d) < mean_cross


# ---------------------------------------------------------------------------
# BM25 — independently-coded Okapi reference
# ---------------------------------------------------------------------------


def _ref_bm25(corpus: dict[int, list[str]], terms: list[str], k1=1.2, b=0.75):
    """BM25 coded in the test from the published formula, independent of
    operators/fts.py and of the SQL oracle text.  Variant choices match
    the engine's documented ones: Lucene-style tf part WITHOUT the
    rank-neutral (k1+1) numerator, and the +1-inside-log idf (both
    published, both rank-equivalent to classic Okapi)."""
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    df = {t: sum(1 for v in corpus.values() if t in v) for t in terms}
    scores = {}
    for doc_id, toks in corpus.items():
        s = 0.0
        for t in terms:
            if df[t] == 0 or t not in toks:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            tf = toks.count(t)
            s += idf * tf / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            scores[doc_id] = round(s, 6)
    return scores


def test_bm25_ranking_matches_independent_reference(spark):
    from overturemaps_duckdb_spark.functions.text import tokens
    from overturemaps_duckdb_spark.operators.fts import bm25_topk, build_fts_index

    texts = {
        1: "merge sort is a stable sort",                      # rare term once
        2: "table table table table scan",                     # tf saturation
        3: "table scan",                                       # short doc, both terms
        4: "the quick brown fox avoids all of it",             # no query terms
        5: "scan the table then scan the index then merge",    # all three terms
        6: "a very long document about many things with one table mention "
           "somewhere deep inside the body text of the document itself",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    idx = build_fts_index(df, "doc_id", "text")
    got = [
        (r["doc_id"], r["_score"])
        for r in bm25_topk(idx, df, "doc_id", "table scan merge", limit=6)
        .select("doc_id", "_score")
        .collect()
    ]
    tok_rows = df.select("doc_id", tokens("text").alias("tk")).collect()
    corpus = {r["doc_id"]: list(r["tk"]) for r in tok_rows}
    ref = _ref_bm25(corpus, ["table", "scan", "merge"])
    want = sorted(ref.items(), key=lambda x: (-x[1], x[0]))
    assert [d for d, _ in got] == [d for d, _ in want], (got, want)
    for (d1, s1), (d2, s2) in zip(got, want):
        assert abs(s1 - s2) < 2e-6, (d1, s1, s2)
    # qualitative IDF property: doc 5 (all terms) outranks doc 2
    # (single common term repeated) — tf saturation + idf weighting
    rank = {d: i for i, (d, _) in enumerate(got)}
    assert rank[5] < rank[2]
    assert 4 not in rank  # no-term doc never scored


# ---------------------------------------------------------------------------
# x7 repetition_signals — planted repetitive vs clean separation
# ---------------------------------------------------------------------------

#: The two repetition shapes Gopher-style filters actually prune: a short
#: phrase looped verbatim (spam/boilerplate) and a whole paragraph
#: duplicated inside one document (scraper artifacts).
REPETITIVE_DOCS = [
    "click here to win a free prize now " * 12,          # looped line
    (GOOD_PROSE[0] + " ") * 3,                           # duplicated paragraph
    "buy cheap buy cheap buy cheap buy cheap buy cheap " * 8,
]


def test_repetition_signals_separate_looped_from_clean(spark):
    """VERDICT r09 #4: the last co-defined text family without a
    non-parity control.  quality_score's fixture explicitly defers
    repetition junk to x7's scope — so x7's signals must actually
    SEPARATE the classes, not merely match the oracle restating the same
    formula.  The n-gram fractions are the separators: clean prose
    repeats function WORDS (dup_token_frac is meaningless as a
    threshold) but almost never repeats word 2-/3-grams, while looped or
    duplicated text repeats both heavily."""
    from overturemaps_duckdb_spark.operators.textprep import (
        repetition_signals,
    )

    df = spark.createDataFrame(
        [(f"rep{i}", t, "rep") for i, t in enumerate(REPETITIVE_DOCS)]
        + [(f"ok{i}", t, "ok") for i, t in enumerate(GOOD_PROSE)],
        "doc_id string, text string, label string",
    )
    sig = repetition_signals(df, "doc_id", "text")
    rows = {
        r["id"]: (r["dup_2gram_frac"], r["dup_3gram_frac"])
        for r in sig.collect()
    }
    rep2 = [rows[f"rep{i}"][0] for i in range(len(REPETITIVE_DOCS))]
    rep3 = [rows[f"rep{i}"][1] for i in range(len(REPETITIVE_DOCS))]
    ok2 = [rows[f"ok{i}"][0] for i in range(len(GOOD_PROSE))]
    ok3 = [rows[f"ok{i}"][1] for i in range(len(GOOD_PROSE))]
    assert min(rep2) >= 0.5, f"repetitive 2-gram frac too low: {rep2}"
    assert min(rep3) >= 0.5, f"repetitive 3-gram frac too low: {rep3}"
    assert max(ok2) <= 0.15, f"clean 2-gram frac too high: {ok2}"
    assert max(ok3) <= 0.1, f"clean 3-gram frac too high: {ok3}"
    # wide margin: worst repetitive doc vs best clean doc on BOTH signals
    assert min(rep2) > max(ok2) + 0.35
    assert min(rep3) > max(ok3) + 0.4


def test_simhash_width_default_scale_safe_and_refining(spark):
    """r10: SimHash width is a scale parameter — expected random
    hamming-0 collisions are ~n²/2^(bits+1), so the 16-bit default
    flooded buckets with unrelated pairs past ~10k docs.  The default is
    now the full 60-bit portable hash; 16-bit remains the certified d3
    contract.  Structural pin: bit i is computed identically at every
    width, so a 60-bit hash REFINES a 16-bit hash (equal-60 ⇒ equal-16)
    — the wide default can only split 16-bit buckets, never merge."""
    import inspect

    from overturemaps_duckdb_spark.operators.dedup import (
        simhash,
        simhash_dedup_buckets,
    )

    assert inspect.signature(simhash).parameters["bits"].default == 60
    assert (
        inspect.signature(simhash_dedup_buckets).parameters["bits"].default
        == 60
    )

    from tests.conftest import SF_SMOKE

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(300)
    both = d.select(
        "doc_id",
        simhash("text", bits=16).alias("h16"),
        simhash("text").alias("h60"),
    ).collect()
    by60 = {}
    for r in both:
        by60.setdefault(r["h60"], set()).add(r["h16"])
    for h60, h16s in by60.items():
        assert len(h16s) == 1, f"equal-60 docs split across 16-bit hashes: {h60}"
    # low-16 projection: the 16-bit hash IS the low 16 bits' per-bit vote
    for r in both:
        assert (r["h60"] & 0xFFFF) == r["h16"]
