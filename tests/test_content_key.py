"""r9 ADVICE fix (high): _content_key's second half must be genuinely
independent of the first.

Spark's multi-arg xxhash64 CHAINS left-to-right — ``hash = h(child,
prev_seed)`` — so the old ``xxhash64(n, lit(1))`` form was ``h(1, h1)``,
a pure function of h1: any 64-bit h1 collision implied an h2 collision
and the struct key had exactly 64 bits of collision resistance, not the
claimed 128.  The fix hashes the constant FIRST (``xxhash64(lit(1),
n)`` = the text under a different effective seed).  These tests pin the
argument order structurally (a value test cannot exhibit a 64-bit
collision) and the NULL-key convention behaviourally.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_second_half_hashes_constant_first(spark):
    from overturemaps_duckdb_spark.operators.dedup import _content_key

    s = str(_content_key(F.col("text"))).replace(" ", "")
    # The struct must contain a constant-FIRST second half,
    # xxhash64(1, <normalized text>): the literal before the text child
    # means "text hashed under effective seed h(1, 42)" — independent of
    # h1.  The reverted form xxhash64(<text>, 1) = h(1, h1) is a pure
    # function of h1 and would make this substring disappear.
    assert "xxhash64(1," in s, s
    # and the first half hashes the text directly (seed 42, no constant)
    assert "xxhash64(trim(" in s, s
    assert s.count("xxhash64") == 2, s


def test_null_and_distinct_texts_key_correctly(spark):
    from overturemaps_duckdb_spark.operators.dedup import _content_key

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "a"), (4, "b"), (5, "a")],
        "id int, text string",
    ).select("id", _content_key("text").alias("k"))
    groups = (
        df.groupBy("k").agg(F.collect_set("id").alias("ids")).collect()
    )
    sets = sorted(sorted(r["ids"]) for r in groups)
    # NULL texts compare equal to each other (seed constant on both
    # halves), distinct texts get distinct keys, equal texts share one
    assert sets == [[1, 2], [3, 5], [4]]


def test_exact_dedup_still_keeps_lowest_id(spark):
    from overturemaps_duckdb_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(3, "dup"), (1, "dup"), (2, "uniq"), (9, None), (8, None)],
        "doc_id int, text string",
    )
    got = sorted(r["doc_id"] for r in exact_dedup(df, "doc_id", "text").collect())
    assert got == [1, 2, 8]
