"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``overturemaps_duckdb_spark.queries`` — one
registered entry per operator of SURVEY.md §2 plus the LLM-pipeline
extension surface; this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from overturemaps_duckdb_spark import queries as _q  # noqa: E402

_q.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-shaped pricing
    summary (scan → pushed filter → map-side partial agg → 2-key groupBy)."""
    return _q.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


#: Certification rotation, round 4: the 43 queries that have NEVER had a
#: driver CORRECTNESS row (VERDICT r03 finding #1 — the full TPC-H breadth,
#: the x-family text-prep surface, sampling/shuffle/skew, ANN scale paths,
#: sequence packing, and the SQL consoles), followed by this round's two new
#: registrations (s4 catalog discovery; m5 re-registered onto the REAL PPM
#:  pixel kernel) and the queries whose plans changed this round (bm25
#: top-k-then-join → t2/t5/pl6) — exactly 50.  One green round closes
#: certification of the entire registry.  Regression cover for everything
#: behind the prefix: tests/test_oracle_parity.py re-verifies all 143
#: against DuckDB locally every round (ADVICE r03 note).
_CERT_PRIORITY = [
    # TPC-H breadth (queries/relational.py + queries/tpch.py) — includes
    # every plan whose forced dim broadcast was stat-gated this round
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_revenue_ratio",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q20_excess_inventory",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    # text-prep / text-stats extension surface
    "x1_token_count",
    "x2_quality_score",
    "x3_lang_id",
    "x4_fingerprints",
    "x5_redaction",
    "x6_bpe_token_count",
    "x7_repetition_signals",
    "x8_sliding_chunks",
    "x9_gopher_rules",
    "x10_corpus_composition",
    "x11_quality_percentile_filter",
    # sampling / shuffle / skew / packing
    "sa1_hash_sample",
    "sa2_stratified_sample",
    "sh1_deterministic_shuffle",
    "sk1_salted_agg",
    "pk1_sequence_packing",
    # ANN scale paths
    "n2_lsh_ann_pairs",
    "n3_ivf_ann_topk",
    # SQL console front door + sketches
    "ep3_sql_console",
    "ep3_ctas_copy_roundtrip",
    "ep4_sql_fts_console",
    "a7_approx_count_distinct",
    # new registrations this round
    "s4_discover_catalog",
    "m5_ppm_resize",
    # plans changed this round (bm25 top-k-then-join) — re-certify
    "t2_bm25_topk",
    "t5_search_fanout",
    "pl6_search_fts",
    # changed this round: d2 gained the signature pre-verify gate + exact
    # collapse; d5's oracle now mirrors the banded LSH (non-vacuous rows)
    "d2_minhash_lsh_pairs",
    "d5_embedding_neardup",
]


def _ordered(src: dict) -> dict:
    head = {k: src[k] for k in _CERT_PRIORITY if k in src}
    tail = {k: v for k, v in src.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return _ordered(dict(_q.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted ⇒ rows-only check by design,
    e.g. engine-specific sketches like approx_count_distinct)."""
    return _ordered(dict(_q.ORACLES))
