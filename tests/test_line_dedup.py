"""Behavioral pins for operators/textprep.line_corpus_dedup (the C4 /
RefinedWeb line-level boilerplate pass)."""

from __future__ import annotations

from overturemaps_duckdb_spark.operators.textprep import line_corpus_dedup


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, text string")
    out = line_corpus_dedup(df, "id", "text", **kw)
    return {r["id"]: (r["clean_text"], r["n_kept"], r["n_dropped"]) for r in out.collect()}


def test_threshold_is_distinct_doc_count(spark):
    """A line in exactly min_docs distinct docs is dropped; min_docs-1 is
    kept; within-doc repetition does NOT count toward the threshold."""
    rows = [
        (1, "HOT\nunique one"),
        (2, "HOT\nunique two"),
        (3, "HOT\nunique three"),
        # WARM appears in 2 docs only (below min_docs=3) — kept; doc 4
        # repeats it internally, which must not inflate the doc count.
        (4, "WARM\nWARM\nbody four"),
        (5, "WARM\nbody five"),
    ]
    got = _run(spark, rows, min_docs=3)
    assert got[1] == ("unique one", 1, 1)
    assert got[2] == ("unique two", 1, 1)
    assert got[3] == ("unique three", 1, 1)
    assert got[4] == ("WARM\nWARM\nbody four", 3, 0)
    assert got[5] == ("WARM\nbody five", 2, 0)


def test_order_preserved_and_all_occurrences_dropped(spark):
    """Surviving lines keep original order; every occurrence of a hot line
    goes, including repeats inside one document."""
    rows = [
        (1, "a\nFOOT\nb\nFOOT\nc"),
        (2, "FOOT\nx"),
        (3, "y\nFOOT"),
    ]
    got = _run(spark, rows, min_docs=3)
    assert got[1] == ("a\nb\nc", 3, 2)
    assert got[2] == ("x", 1, 1)
    assert got[3] == ("y", 1, 1)


def test_fully_boilerplate_doc_empties(spark):
    rows = [
        (1, "FOOT"),
        (2, "FOOT"),
        (3, "FOOT"),
        (4, "real content"),
    ]
    got = _run(spark, rows, min_docs=3)
    assert got[1] == ("", 0, 1)
    assert got[4] == ("real content", 1, 0)


def test_no_hot_lines_is_identity(spark):
    rows = [(1, "a\nb"), (2, "c"), (3, "d\ne\nf")]
    got = _run(spark, rows, min_docs=2)
    assert got == {
        1: ("a\nb", 2, 0),
        2: ("c", 1, 0),
        3: ("d\ne\nf", 3, 0),
    }


def test_custom_delimiter_is_literal(spark):
    rows = [(1, "p| q| BP"), (2, "r| BP"), (3, "BP| s")]
    got = _run(spark, rows, min_docs=3, delim="| ")
    assert got[1] == ("p| q", 2, 1)
    assert got[3] == ("s", 1, 1)


def test_plan_has_no_sort_or_posexplode(spark):
    """The reassembly-free shape: filter over the split array, no
    positional sort anywhere in the optimized plan."""
    df = spark.createDataFrame([(1, "a\nb")], "id long, text string")
    plan = line_corpus_dedup(df, "id", "text")._jdf.queryExecution().optimizedPlan().toString()
    assert "Sort" not in plan
    assert "PosExplode" not in plan and "posexplode" not in plan


def test_randomized_against_python_reference(spark):
    """Seeded random corpora vs a brute-force Python implementation of the
    same contract (drop lines in >= min_docs distinct docs, keep order)."""
    import random
    from collections import defaultdict

    for seed, min_docs in ((7, 2), (11, 3), (13, 4)):
        rng = random.Random(seed)
        vocab = [f"L{i}" for i in range(12)] + ["", " ", "x y"]
        rows = [
            (i, "\n".join(rng.choice(vocab) for _ in range(rng.randint(1, 8))))
            for i in range(40)
        ]
        docs_of = defaultdict(set)
        for i, text in rows:
            for ln in text.split("\n"):
                docs_of[ln].add(i)
        hot = {ln for ln, d in docs_of.items() if len(d) >= min_docs}
        want = {}
        for i, text in rows:
            ls = text.split("\n")
            kept = [x for x in ls if x not in hot]
            want[i] = ("\n".join(kept), len(kept), len(ls) - len(kept))

        got = _run(spark, rows, min_docs=min_docs)
        assert got == want, f"mismatch at seed={seed} min_docs={min_docs}"


def test_null_text_propagates_null(spark):
    """NULL document → (NULL, NULL, NULL), matching DuckDB list-function
    semantics (string_split(NULL) is NULL) — never an empty document."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "a")], "id long, text string"
    )
    got = {
        r["id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in line_corpus_dedup(df, "id", "text", min_docs=3).collect()
    }
    assert got[2] == (None, None, None)
    assert got[1] == ("", 0, 1)  # genuinely emptied stays ''


def test_incremental_counts_equal_full_rebuild(spark, tmp_path):
    """write_line_counts over two disjoint batches + line_dedup_from_counts
    == one-shot line_corpus_dedup of the full corpus; hotness may only be
    reachable ACROSS batches (the additive-merge property under test)."""
    from overturemaps_duckdb_spark.operators.textprep import (
        line_dedup_from_counts,
        write_line_counts,
    )

    # FOOT: 2 docs in batch1 + 1 in batch2 → hot only after the merge.
    b1 = spark.createDataFrame(
        [(1, "a\nFOOT"), (2, "FOOT\nb"), (3, "c")], "id long, text string"
    )
    b2 = spark.createDataFrame(
        [(4, "d\nFOOT"), (5, "e")], "id long, text string"
    )
    store = str(tmp_path / "line_counts")
    write_line_counts(b1, "id", "text", store)
    write_line_counts(b2, "id", "text", store)

    full = b1.unionByName(b2)
    got = sorted(
        map(tuple, line_dedup_from_counts(
            spark, store, full, "id", "text", min_docs=3
        ).collect())
    )
    want = sorted(
        map(tuple, line_corpus_dedup(full, "id", "text", min_docs=3).collect())
    )
    assert got == want
    # and FOOT really went hot across batches
    assert (1, "a", 1, 1) in got and (4, "d", 1, 1) in got


def test_intra_doc_line_dedup_order_and_nulls(spark):
    """First-occurrence order preserved; NULL text passes through NULL."""
    from overturemaps_duckdb_spark.operators.textprep import (
        intra_doc_line_dedup,
    )

    df = spark.createDataFrame(
        [
            (1, "nav\nbody one\nnav\nbody two\nbody one\nfooter"),
            (2, "single"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in intra_doc_line_dedup(df, "doc_id", "text").collect()}
    assert out[1]["text"] == "nav\nbody one\nbody two\nfooter"
    assert (out[1]["n_before"], out[1]["n_after"]) == (6, 4)
    assert out[2]["text"] == "single" and out[2]["n_after"] == 1
    assert out[3]["text"] is None and out[3]["n_before"] is None


def test_hot_span_removal_basic_and_edges(spark):
    """r12: corpus-hot n-gram SPAN removal — overlapping spans union,
    short docs are exempt from hotness, NULL text passes through as
    (NULL, NULL, NULL), and a fully-covered doc empties to '' (not
    NULL)."""
    from overturemaps_duckdb_spark.operators.textprep import (
        hot_ngram_span_removal,
    )

    boiler = "all rights reserved by the example site inc"  # 8 tokens
    rows = [
        (1, f"alpha beta {boiler} gamma delta"),
        (2, f"{boiler} unique two text here body"),
        (3, f"prefix words {boiler} and suffix stuff"),
        (4, "completely unrelated document with enough tokens to clear n"),
        (5, boiler),                # exactly the hot 8-gram, nothing else
        (6, "short doc"),           # < n tokens: exempt, untouched
        (7, None),                  # NULL text
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in hot_ngram_span_removal(
            df, "doc_id", "text", n=8, min_docs=3
        ).collect()
    }
    # the boilerplate 8-gram occurs in docs 1,2,3,5 (≥3) → hot
    assert out[1] == ("alpha beta gamma delta", 12, 8)
    assert out[2] == ("unique two text here body", 13, 8)
    assert out[3] == ("prefix words and suffix stuff", 13, 8)
    assert out[4][2] == 0 and out[4][0].startswith("completely")
    assert out[5] == ("", 8, 8)            # emptied, not NULL
    assert out[6] == ("short doc", 2, 0)   # exempt from hotness
    assert out[7] == (None, None, None)


def test_hot_span_removal_overlapping_spans_union(spark):
    """Two hot 3-grams overlapping by one token remove the UNION of their
    spans — the shared token is not double-counted or resurrected."""
    from overturemaps_duckdb_spark.operators.textprep import (
        hot_ngram_span_removal,
    )

    # hot grams (n=3): 'a b c' and 'c d e' — overlap on 'c' when adjacent
    rows = [
        (1, "x a b c d e y"),
        (2, "a b c one thing"),
        (3, "a b c two thing"),
        (4, "c d e one here"),
        (5, "c d e two here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in hot_ngram_span_removal(
            df, "doc_id", "text", n=3, min_docs=3
        ).collect()
    }
    assert out[1] == ("x y", 5)  # a b c d e all covered, x/y survive


def test_hot_span_removal_collapse_matches_per_doc(spark):
    """collapse_exact=True (distinct-text pipeline + weighted frequency +
    member fan-out) must be row-identical to the per-document form on a
    randomized corpus with heavy exact duplication, NULLs, empties, and
    short docs."""
    import random

    from overturemaps_duckdb_spark.operators.textprep import (
        hot_ngram_span_removal,
    )

    rng = random.Random(55)
    vocab = [f"w{i}" for i in range(30)]
    boiler = " ".join(vocab[:4])
    texts = []
    for _ in range(25):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 14)))
        t = f"{body} {boiler}" if rng.random() < 0.5 else body
        texts.append(t.strip())
    rows = []
    for i in range(120):
        r = rng.random()
        rows.append(
            (i, None if r < 0.08 else ("" if r < 0.14 else rng.choice(texts)))
        )
    df = spark.createDataFrame(rows, "doc_id int, text string")

    def rowset(collapse):
        return sorted(
            tuple(r)
            for r in hot_ngram_span_removal(
                df, "doc_id", "text", n=4, min_docs=3,
                collapse_exact=collapse,
            ).collect()
        )

    assert rowset(True) == rowset(False)


def test_decontaminate_spans_edges(spark):
    """r12: span-level decontamination — only bench-covered spans go,
    overlaps union, short bench docs contribute no gram, NULL text and
    fully-contaminated docs follow the span-removal contract, and both
    collapse modes agree."""
    from overturemaps_duckdb_spark.operators.textprep import (
        decontaminate_spans,
    )

    bench_gram = "the quick brown fox"          # 4 tokens
    train = spark.createDataFrame(
        [
            (1, f"intro words {bench_gram} outro words"),
            (2, bench_gram),                    # fully contaminated → ''
            (3, "clean document with enough tokens"),
            (4, None),
            (5, f"{bench_gram} and quick brown fox trailing"),  # overlap
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"prefix {bench_gram} suffix"), (101, "tiny")],
        "doc_id int, text string",
    )
    for collapse in (True, False):
        out = {
            r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
            for r in decontaminate_spans(
                train, bench, "doc_id", "text", n=4, collapse_exact=collapse
            ).collect()
        }
        assert out[1] == ("intro words outro words", 8, 4), collapse
        assert out[2] == ("", 4, 4), collapse
        assert out[3][2] == 0, collapse
        assert out[4] == (None, None, None), collapse
        # doc 5: 'the quick brown fox and quick brown fox trailing' — only
        # the bench 4-gram span [1,5) matches ('quick brown fox trailing'
        # is not a bench gram; 'and quick brown fox' is not either)
        assert out[5] == ("and quick brown fox trailing", 9, 4), collapse
