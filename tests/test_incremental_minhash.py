"""Incremental MinHash index maintenance: batched ingest must find exactly
the pairs a full-corpus rebuild finds, while only ever shingling the new
batch (the corpus side is read from its persisted index)."""

from __future__ import annotations


import pytest

from overturemaps_duckdb_spark.operators.dedup import (
    incremental_minhash_pairs,
    minhash_lsh_pairs,
    write_minhash_index,
)

DUP_A = "the quick brown fox jumps over the lazy dog again and again today"
DUP_B = "completely different content about shuffle partitions and joins ok"


def _batches(spark):
    """Three ingest batches with near-dups inside a batch (1,2), across
    batches (3→101, 102→201), and unrelated filler."""
    b1 = spark.createDataFrame(
        [(1, DUP_A), (2, DUP_A + "!"), (3, DUP_B), (4, "filler one unrelated")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(101, DUP_B + " ok"), (102, "brand new near dup seed text here"),
         (103, "other filler nothing shared")],
        "doc_id long, text string",
    )
    b3 = spark.createDataFrame(
        [(201, "brand new near dup seed text here!"), (202, "lone document")],
        "doc_id long, text string",
    )
    return [b1, b2, b3]


def _pairset(rows):
    return {(r["a_id"], r["b_id"], r["jaccard"]) for r in rows}


def test_incremental_equals_full_rebuild(spark, tmp_path):
    batches = _batches(spark)
    store = str(tmp_path / "mhidx") + "/index"
    got = set()
    for b in batches:
        out = incremental_minhash_pairs(
            spark, store, b, "doc_id", "text", jaccard_threshold=0.3
        )
        got |= _pairset(out.collect())

    full_corpus = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = _pairset(
        minhash_lsh_pairs(
            full_corpus, "doc_id", "text", jaccard_threshold=0.3
        ).collect()
    )
    assert got == want
    assert any(a == 1 and b == 2 for a, b, _ in got)  # in-batch pair
    assert any(a == 3 and b == 101 for a, b, _ in got)  # cross-batch pair
    assert any(a == 102 and b == 201 for a, b, _ in got)  # later cross-batch


def test_dry_run_leaves_store_untouched(spark, tmp_path):
    batches = _batches(spark)
    store = str(tmp_path / "mhidx") + "/index"
    write_minhash_index(batches[0], "doc_id", "text", store, mode="overwrite")
    before = spark.read.parquet(store).count()
    out = incremental_minhash_pairs(
        spark, store, batches[1], "doc_id", "text",
        jaccard_threshold=0.3, update_index=False,
    )
    assert out.count() > 0
    assert spark.read.parquet(store).count() == before


def test_cross_band_key_join_is_capped(spark, tmp_path):
    """ADVICE r03: the old×new band-key join must honor bucket_cap too — a
    hot band key (here: identical texts on both sides) must contribute at
    most cap×cap join rows per key, with drops observable."""
    dup = [(i, DUP_A) for i in range(1, 9)]
    store = str(tmp_path / "mhidx") + "/index"
    write_minhash_index(
        spark.createDataFrame(dup, "doc_id long, text string"),
        "doc_id", "text", store, mode="overwrite",
    )
    new = spark.createDataFrame(
        [(i, DUP_A) for i in range(101, 109)], "doc_id long, text string"
    )
    out = incremental_minhash_pairs(
        spark, store, new, "doc_id", "text",
        jaccard_threshold=0.3, bucket_cap=3, update_index=False,
    )
    pairs = _pairset(out.collect())
    # capped: per band key only 3 old × 3 new survive; identical docs share
    # all 4 band keys, so cross pairs ≤ 3×3 (and new×new ≤ C(3,2))
    cross = {(a, b) for a, b, _ in pairs if a <= 8 and b >= 101}
    assert 0 < len(cross) <= 9
    total_dropped = sum(
        o.get["dropped_ids"]
        for o in incremental_minhash_pairs.last_cap_observations
    )
    assert total_dropped > 0

    # uncapped finds the full 8x8 cross set
    full = incremental_minhash_pairs(
        spark, store, new, "doc_id", "text",
        jaccard_threshold=0.3, bucket_cap=None, update_index=False,
    )
    assert len({(a, b) for a, b, _ in _pairset(full.collect()) if a <= 8 and b >= 101}) == 64


def test_pairs_computed_before_append_lands(spark, tmp_path):
    """The returned frame must not see the new batch through the store (the
    lazy-plan double-count hazard): re-collecting after the append must
    yield the same rows."""
    batches = _batches(spark)
    store = str(tmp_path / "mhidx") + "/index"
    out1 = incremental_minhash_pairs(
        spark, store, batches[0], "doc_id", "text", jaccard_threshold=0.3
    )
    first = _pairset(out1.collect())
    again = _pairset(out1.collect())  # store now contains batch 1
    assert first == again
