"""shingle_fingerprint bind-once equivalence (r6): the bound form must be
value-identical to the reference construction (char_ngrams + md5) on
every edge shape — NULL text, empty, shorter-than-k, exactly-k,
punctuation-only (normalizes to empty), multibyte — plus a randomized
sweep.  Guards the size(chars)==length(norm) substitution."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from overturemaps_duckdb_spark.functions.text import (
    char_ngrams,
    shingle_fingerprint,
)


def _reference_fp(text_col, k):
    sh = char_ngrams(text_col, k)
    return F.md5(F.array_join(F.array_sort(F.array_distinct(sh)), " "))


def test_shingle_fingerprint_matches_reference_construction(spark):
    rng = random.Random(6)
    texts = [
        None,
        "",
        "a",
        "ab",
        "abc",
        "abcd",
        "  ",
        "!!!",
        "a!b",
        "héllo wörld",
        "x" * 500,
    ] + [
        "".join(rng.choice("ab !c.d") for _ in range(rng.randint(0, 40)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for k in (2, 3, 5):
        rows = df.select(
            _reference_fp(F.col("text"), k).alias("want"),
            shingle_fingerprint("text", k).alias("got"),
        ).collect()
        for i, r in enumerate(rows):
            assert r["got"] == r["want"], (k, texts[i])
