"""Unit coverage for the training-pipeline operators (as-of join, packing)
beyond the oracle parity the registry already enforces."""

from __future__ import annotations

import pyspark.sql.functions as F

from overturemaps_duckdb_spark.operators.asof import asof_join
from overturemaps_duckdb_spark.operators.packing import pack_sequences


def _frames(spark):
    trades = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("b", 5, 3), ("b", 7, 4)],
        "key string, ts long, tid long",
    )
    quotes = spark.createDataFrame(
        [("a", 9, 100), ("a", 10, 101), ("a", 10, 102), ("a", 15, 103), ("b", 6, 104)],
        "key string, ts long, qid long",
    )
    return trades, quotes


def test_asof_backward_with_ties(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, by=["key"], left_ts="ts", right_ts="ts",
        right_cols=["qid", "ts"], right_order="qid",
    )
    got = {r["tid"]: (r["r_qid"], r["r_ts"]) for r in out.collect()}
    # trade a@10: quotes at ts 9,10,10 precede; equal-ts tie → largest qid
    assert got[1] == (102, 10)
    assert got[2] == (103, 15)
    # trade b@5: no quote at or before → NULL match
    assert got[3] == (None, None)
    assert got[4] == (104, 6)


def test_asof_forward(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, by=["key"], left_ts="ts", right_ts="ts",
        right_cols=["qid"], right_order="qid", direction="forward",
    )
    got = {r["tid"]: r["r_qid"] for r in out.collect()}
    # earliest quote at-or-after each trade
    assert got[1] in (101, 102)  # ts 10 ties
    assert got[2] is None  # nothing at/after ts 20
    assert got[3] == 104
    assert got[4] is None


def test_pack_sequences_partition_independent(spark):
    rows = [(i, (i * 37) % 50 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = pack_sequences(df, "doc_id", "w", budget=100, num_partitions=1)
    b = pack_sequences(df, "doc_id", "w", budget=100, num_partitions=7)
    ka = sorted(tuple(r) for r in a.select("doc_id", "seq_id", "offset").collect())
    kb = sorted(tuple(r) for r in b.select("doc_id", "seq_id", "offset").collect())
    assert ka == kb
    # offsets stay inside the budget and seq ids are monotone in doc order
    assert all(0 <= off < 100 for _, _, off in ka)
    seqs = [s for _, s, _ in ka]
    assert seqs == sorted(seqs)


def test_deterministic_shuffle_order_and_stability(spark):
    import hashlib

    from overturemaps_duckdb_spark.operators.sampling import (
        deterministic_shuffle,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(df, "doc_id", seed=42)
    rows = [r["doc_id"] for r in out.toLocalIterator()]
    # partition-ordered iteration IS the seeded permutation: range partitions
    # are key-ordered and each is locally sorted
    expect = sorted(
        range(500), key=lambda i: hashlib.md5(f"{i}:42".encode()).hexdigest()
    )
    assert rows == expect
    # re-run → identical order; different seed → different permutation
    again = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", 42).toLocalIterator()]
    assert again == rows
    other = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", 7).toLocalIterator()]
    assert other != rows and sorted(other) == sorted(rows)


def test_gopher_rules_reason_codes(spark):
    from overturemaps_duckdb_spark.operators.textprep import gopher_rules

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in a field of green grass for hours"),
            (2, "tiny"),                              # wc + stop fail
            (3, "$$$ %% ### !!! @@@ *** $$$ %% ### !!! @@@ ***"),  # sym+wc+awl+stop
            (4, "the " + "pneumonoultramicroscopic " * 30 + "and of to in it"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in gopher_rules(docs, "doc_id", "text").collect()}
    assert out[1]["keep"] and out[1]["reasons"] == ""
    assert not out[2]["keep"] and out[2]["reasons"] == "wc,stop"
    assert not out[3]["keep"]
    assert "sym" in out[3]["reasons"].split(",")
    assert not out[4]["keep"] and out[4]["reasons"] == "awl"
