"""Fixture-drift insurance beyond events: documents/embeddings re-written
with plausible physical-type variations (int64→int32 ids, float→double
embeddings) must produce identical results from the operators that consume
them.  The driver regenerates fixtures between rounds; r02 proved a dtype
flip can take down a whole query family."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def _link_other_tables(d: str, except_table: str) -> None:
    """Queries may read sibling tables from sf_dir — symlink the originals
    (skipping any variant file the fixture already wrote)."""
    for fn in os.listdir(SF_SMOKE):
        if (
            fn.endswith(".parquet")
            and fn != f"{except_table}.parquet"
            and not os.path.exists(os.path.join(d, fn))
        ):
            os.symlink(os.path.join(SF_SMOKE, fn), os.path.join(d, fn))


@pytest.fixture(scope="module")
def doc_variant_dir(tmp_path_factory):
    """documents with doc_id int32 and n_chars int32."""
    src = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    tbl = src.set_column(
        src.schema.get_field_index("doc_id"),
        "doc_id",
        src["doc_id"].cast(pa.int32()),
    )
    tbl = tbl.set_column(
        tbl.schema.get_field_index("n_chars"),
        "n_chars",
        tbl["n_chars"].cast(pa.int32()),
    )
    d = tmp_path_factory.mktemp("docs32")
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"), store_schema=False)
    _link_other_tables(str(d), "documents")
    return str(d)


@pytest.fixture(scope="module")
def emb_variant_dir(tmp_path_factory):
    """embeddings with embedding list<double> and vec_id int32."""
    src = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    tbl = src.set_column(
        src.schema.get_field_index("embedding"),
        "embedding",
        src["embedding"].cast(pa.list_(pa.float64())),
    )
    tbl = tbl.set_column(
        tbl.schema.get_field_index("vec_id"),
        "vec_id",
        tbl["vec_id"].cast(pa.int32()),
    )
    d = tmp_path_factory.mktemp("emb64")
    pq.write_table(tbl, os.path.join(str(d), "embeddings.parquet"), store_schema=False)
    _link_other_tables(str(d), "embeddings")
    return str(d)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "qname", ["d1_exact_dedup", "d2_minhash_lsh_pairs", "x1_token_count",
              "x2_quality_score", "x10_corpus_composition"]
)
def test_document_queries_survive_narrow_ints(spark, doc_variant_dir, qname):
    from overturemaps_duckdb_spark import queries as q

    q.load_all()
    base = _rows(q.QUERIES[qname](spark, SF_SMOKE))
    # id dtype may legitimately surface in the output schema (int vs long);
    # compare VALUES, which Python ints make dtype-transparent
    got = _rows(q.QUERIES[qname](spark, doc_variant_dir))
    assert len(base) > 0
    assert got == base, f"{qname} drifted under int32 doc_id/n_chars"


@pytest.mark.parametrize("qname", ["n1_cosine_topk", "d5_embedding_neardup"])
def test_embedding_queries_survive_double_vectors(spark, emb_variant_dir, qname):
    from overturemaps_duckdb_spark import queries as q

    q.load_all()
    base = _rows(q.QUERIES[qname](spark, SF_SMOKE))
    got = _rows(q.QUERIES[qname](spark, emb_variant_dir))
    assert got == base, f"{qname} drifted under list<double>/int32 vec_id"


@pytest.fixture(scope="module")
def date_variant_dir(tmp_path_factory):
    """lineitem/orders with their timestamp date columns narrowed to
    date32 — the other plausible regeneration of the TPC-H family."""
    d = tmp_path_factory.mktemp("dates32")
    for t_, col in (("lineitem", "l_shipdate"), ("orders", "o_orderdate")):
        src = pq.read_table(f"{SF_SMOKE}/{t_}.parquet")
        i = src.schema.get_field_index(col)
        tbl = src.set_column(i, col, src[col].cast(pa.date32()))
        pq.write_table(tbl, os.path.join(str(d), f"{t_}.parquet"), store_schema=False)
    _link_other_tables(str(d), "lineitem")
    return str(d)


@pytest.mark.parametrize(
    "qname",
    ["q1_pricing_summary", "q3_shipping_priority", "q4_order_priority",
     "q6_forecast_revenue", "q10_returned_items", "q14_promo_revenue_ratio"],
)
def test_tpch_queries_survive_date32(spark, date_variant_dir, qname):
    from overturemaps_duckdb_spark import queries as q

    q.load_all()
    base = _rows(q.QUERIES[qname](spark, SF_SMOKE))
    got = _rows(q.QUERIES[qname](spark, date_variant_dir))
    assert len(base) > 0
    assert got == base, f"{qname} drifted under date32 date columns"
