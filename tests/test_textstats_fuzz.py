"""Randomized differential for the corpus-statistics text queries
(x15 TF-IDF / x16 unigram-LM / x17 char entropy) over GENERATED
documents with edge shapes the fixture lacks: unicode, punctuation
runs, digits, empty/NULL text, whitespace-only, single-token and
repeated-char documents.  Spark result vs the registered DuckDB oracle
on the same parquet — the normalize() tokenization twin must hold for
arbitrary input, not just the fixture's ASCII words."""

from __future__ import annotations

import random

import duckdb
import pyspark.sql.functions as F
import pytest

from overturemaps_duckdb_spark import queries as q
from tests.oracle_harness import compare

q.load_all()

_WORDS = [
    "spark", "table", "naïve", "東京", "data", "Straße", "café", "x9y",
    "MIXEDCase", "0042", "π", "e=mc2", "foo_bar", "a", "zz",
]
_JUNK = ["!!!", "---", "…", "///", "###", "🙂🙂", "\t\n", "  ", ""]


def _gen_docs(rng: random.Random, n: int):
    rows = []
    for i in range(n):
        shape = rng.randrange(8)
        if shape == 0:
            text = None
        elif shape == 1:
            text = rng.choice(_JUNK)
        elif shape == 2:
            text = rng.choice(_WORDS)  # single token
        elif shape == 3:
            text = (rng.choice(_WORDS) + " ") * rng.randrange(1, 30)
        else:
            text = " ".join(
                rng.choice(_WORDS + _JUNK) for _ in range(rng.randrange(1, 40))
            )
        rows.append((i, text))
    return rows


@pytest.mark.parametrize("seed", [11, 17])
@pytest.mark.parametrize(
    "name",
    [
        "x15_tfidf_keywords",
        "x16_unigram_logprob",
        "x17_char_entropy",
        "x18_bigram_logprob",
        "x19_doc_novelty",
    ],
)
def test_textstats_fuzz_vs_oracle(spark, tmp_path, name, seed):
    rng = random.Random(seed)
    rows = _gen_docs(rng, 120)
    sf_dir = str(tmp_path / f"fuzz{seed}")
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    df = q.QUERIES[name](spark, sf_dir)
    result = compare(name, df, con, q.ORACLES[name])
    con.close()
    assert result.ok, str(result)
