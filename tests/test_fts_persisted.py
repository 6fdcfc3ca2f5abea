"""Persisted FTS index (write_fts_index/read_fts_index): the ingest-time
materialized form must score identically to the in-session index, and the
postings scan must push the term predicate down to the parquet reader."""

from __future__ import annotations


from overturemaps_duckdb_spark.operators.fts import (
    bm25_score,
    bm25_topk,
    build_fts_index,
    read_fts_index,
    write_fts_index,
)
from overturemaps_duckdb_spark.queries import t
from tests.conftest import SF_CORRECTNESS

QUERY = "shuffle partition"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_persisted_index_scores_identically(spark, tmp_path):
    docs = t(spark, SF_CORRECTNESS, "documents")
    live = build_fts_index(docs, "doc_id", "text")
    root = str(tmp_path / "fts")
    write_fts_index(live, root)
    stored = read_fts_index(spark, root)

    assert _rows(bm25_score(live, QUERY)) == _rows(bm25_score(stored, QUERY))
    assert _rows(
        bm25_topk(live, docs, "doc_id", QUERY, limit=10).select("doc_id", "_score")
    ) == _rows(
        bm25_topk(stored, docs, "doc_id", QUERY, limit=10).select(
            "doc_id", "_score"
        )
    )


def test_persisted_postings_scan_prunes_terms(spark, tmp_path):
    docs = t(spark, SF_CORRECTNESS, "documents")
    root = str(tmp_path / "fts")
    write_fts_index(build_fts_index(docs, "doc_id", "text"), root)
    stored = read_fts_index(spark, root)
    plan = (
        bm25_score(stored, QUERY)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the term IN predicate must reach the parquet scan (row-group pruning
    # over the term-sorted files — the flat-file form of term partitioning)
    assert "PushedFilters: [In(term" in plan


def test_bm25_empty_query_follows_index_id_type(spark):
    """VERDICT r04 nit: the no-term early-return frame's id type must
    follow the index schema — a string-keyed table used to get `id long`
    and schema-mismatch downstream."""
    from overturemaps_duckdb_spark.operators.fts import (
        bm25_score,
        build_fts_index,
    )

    df = spark.createDataFrame(
        [("a", "hello world"), ("b", "spark engine")],
        "doc_id string, text string",
    )
    idx = build_fts_index(df, "doc_id", "text")
    res = bm25_score(idx, "!!! ???")  # tokenizes to nothing
    assert res.schema["id"].dataType.simpleString() == "string"
    assert res.count() == 0


def test_unpersist_releases_tokenization_cache(spark):
    """r10 review: the build's persisted tokenization intermediate must be
    released by FtsIndex.unpersist() — an Engine reload / runner degrade
    released the four index frames but left the toks cache pinned in the
    CacheManager forever.  Single-tree callers (t1) skip the cache
    entirely via cache_tokens=False."""
    from overturemaps_duckdb_spark.operators.fts import build_fts_index
    from tests.conftest import SF_SMOKE

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    idx = build_fts_index(d, "doc_id", "text").persist()
    assert idx.tok_cache is not None and idx.tok_cache.is_cached
    idx.postings.count()  # materialize through the cache
    idx.unpersist()
    assert not idx.tok_cache.is_cached, "toks cache survived unpersist()"
    assert not idx.postings.is_cached

    lean = build_fts_index(d, "doc_id", "text", cache_tokens=False)
    assert lean.tok_cache is None
    # values identical either way
    a = sorted(map(tuple, lean.postings.collect()))
    b = sorted(map(tuple, build_fts_index(d, "doc_id", "text").postings.collect()))
    assert a == b
