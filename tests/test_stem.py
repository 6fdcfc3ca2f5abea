"""Porter stemmer: paper vectors, kernel-vs-SQL differential, index
round-trip.

The two implementations (functions/stem.py kernel; queries/_sql.porter_ctes
DuckDB CTE chain) share the rule TABLES but nothing else — the
differential is the certification that the two evaluation engines agree,
which is what lets the t6 oracle value-check stemmed BM25 scores.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from overturemaps_duckdb_spark.functions.stem import (
    porter_stem,
    porter_stem_series,
)
from overturemaps_duckdb_spark.queries._sql import porter_ctes

# Full-pipeline outputs (the paper's per-step tables show intermediate
# states; these are end-to-end results, cross-checked against the
# published sample vocabulary: e.g. agreed → agre, relational → relat).
FULL_VECTORS = {
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "motoring": "motor",
    "sing": "sing",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "happy": "happi",
    "sky": "sky",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "adjustable": "adjust",
    "replacement": "replac",
    "adoption": "adopt",
    "cement": "cement",  # step-4 'ement' single-attempt: m('c')=0 blocks
    "controll": "control",
    "roll": "roll",
    # the stemming-parity motivators (SURVEY §7 risk 2)
    "cafes": "cafe",
    "cafe": "cafe",
    "tables": "tabl",
    "table": "tabl",
    "scanning": "scan",
    "scan": "scan",
    "merges": "merg",
    "merge": "merg",
    "queries": "queri",
    "query": "queri",
    # length ≤ 2 early-out
    "is": "is",
    "a": "a",
    "": "",
}


def test_porter_vectors():
    for w, want in FULL_VECTORS.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_porter_idempotent_on_short_and_stable():
    # stemming is deterministic and never grows short words
    for w in ("ox", "by", "go", "it"):
        assert porter_stem(w) == w


def _sql_stems(words: list[str]) -> list[str]:
    frag, final = porter_ctes("u", "w", ["i"])
    vals = ", ".join(f"({i}, '{w}')" for i, w in enumerate(words))
    sql = (
        f"WITH u(i, w) AS (VALUES {vals}){frag} "
        f"SELECT stem FROM {final} ORDER BY i"
    )
    con = duckdb.connect()
    try:
        return [r[0] for r in con.execute(sql).fetchall()]
    finally:
        con.close()


def test_kernel_vs_sql_differential_fixed():
    words = sorted(w for w in FULL_VECTORS if w)
    assert _sql_stems(words) == [porter_stem(w) for w in words]


def test_kernel_vs_sql_differential_fuzz():
    """Random lowercase words (plus digit-bearing tokens, y-clusters and
    the letter-v marker-collision class) — both sides must agree on every
    input the tokenizer can produce."""
    rng = random.Random(12)
    alpha = string.ascii_lowercase + string.digits
    words = set()
    for _ in range(400):
        n = rng.randint(1, 12)
        words.add("".join(rng.choice(alpha) for _ in range(n)))
    # targeted classes: v/c marker collision, y runs, classic suffixes
    for suf in ("ed", "ing", "s", "ies", "ational", "fulness", "ement",
                "ion", "iti", "e", "ll"):
        for stem in ("viv", "yy", "cy", "activ", "rel", "vil", "tr", "x1"):
            words.add(stem + suf)
    words = sorted(words)
    got = _sql_stems(words)
    bad = [
        (w, g, porter_stem(w))
        for w, g in zip(words, got)
        if g != porter_stem(w)
    ]
    assert not bad, bad[:10]


def test_stemmed_query_terms_pin():
    """The literal STEMMED_QUERY_TERMS the t2/t5/pl6 oracles embed must
    equal the runtime tokenizer's output for QUERY_TEXT."""
    from overturemaps_duckdb_spark.operators.fts import tokenize_query
    from overturemaps_duckdb_spark.queries.fts import (
        QUERY_TEXT,
        STEMMED_QUERY_TERMS,
    )

    assert tokenize_query(QUERY_TEXT, stemmer="porter") == STEMMED_QUERY_TERMS


def test_porter_series_memo():
    import pandas as pd

    s = pd.Series(["tables", "tables", None, "scanning"])
    assert list(porter_stem_series(s)) == ["tabl", "tabl", None, "scan"]


@pytest.mark.usefixtures("spark")
def test_stemmed_index_roundtrip(spark, tmp_path):
    """stemmer mode survives write→read; a reopened porter store stems
    query terms (the silent-miss failure mode the stats column guards)."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.operators.fts import (
        bm25_topk,
        build_fts_index,
        read_fts_index,
        write_fts_index,
    )

    df = spark.createDataFrame(
        [(1, "tables are scanned"), (2, "the merge of queries"),
         (3, "nothing relevant here")],
        "id long, text string",
    )
    idx = build_fts_index(df, "id", "text", stemmer="porter")
    assert idx.stemmer == "porter"
    # inflected query only matches through stemming
    hits = bm25_topk(idx, df, "id", "table scanning", limit=5)
    assert sorted(r["id"] for r in hits.collect()) == [1]

    root = str(tmp_path / "fts")
    write_fts_index(idx, root)
    reopened = read_fts_index(spark, root)
    assert reopened.stemmer == "porter"
    assert "stemmer" not in reopened.stats.columns
    hits2 = bm25_topk(reopened, df, "id", "table scanning", limit=5)
    assert [r["id"] for r in hits2.collect()] == [1]

    # raw-token opt-out round-trips as None (porter is the DEFAULT
    # since the r12 flip — matching DuckDB create_fts_index defaults)
    plain = build_fts_index(df, "id", "text", stemmer=None)
    root2 = str(tmp_path / "fts_plain")
    write_fts_index(plain, root2)
    assert read_fts_index(spark, root2).stemmer is None
    assert build_fts_index(df, "id", "text").stemmer == "porter"

    # postings term column is stemmed (tf merges inflections)
    terms = {
        r["term"]
        for r in idx.postings.where(F.col("id") == 1).collect()
    }
    assert "tabl" in terms and "scan" in terms
    assert "tables" not in terms

    with pytest.raises(ValueError):
        build_fts_index(df, "id", "text", stemmer="snowball")
