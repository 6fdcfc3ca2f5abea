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


#: Certification rotation, round 14 (optimization round 2 — same duty as
#: r13: every query whose PHYSICAL PATH changed must re-certify green).
#: Budget: the driver certifies the FIRST 50 entries.  Composition:
#: (a) r14 physical-path changes lead: the NEW t2p persisted-index row
#: (VERDICT r13 #6), the FTS family (un-hinted stem-map broadcast +
#: avgdl folded into the term_idf broadcast: t1/t2/t5/t6/pl6/ep4), and
#: the whole pair-machinery dedup family (minhash index now a pure
#: projection; pair expansion / signature gate / fan-out / verify
#: rebuilt as selectExpr strings: d1/d2/d4/d5/d6/d7/d8/d9/sp1/ct1/ct2/
#: dc1/ld1/fz1), plus e6/e7 and pl4 (persists routed through the
#: bounded lru_persist — plan content unchanged, re-certified anyway);
#: (b) the four r9 rows the r13 rotation deferred to r14 as promised:
#: d1_exact_dedup (also in (a)), g1_g2_point_type_centroid,
#: m3_asset_byte_features, t3_ilike_fallback;
#: (c) backfill from the cohort rotated OUT in r13 (last certified r12):
#: the j*/pl*/u*/w1/x1-x11/qs1/e5 block below.  The r13 prefix members
#: not re-listed here were all green at the r13 driver certification.
_CERT_PRIORITY = [
    # (a) r14 physical-path changes — prove value-neutrality first
    "t2p_bm25_persisted",
    "t1_fts_index_build",
    "t2_bm25_topk",
    "t5_search_fanout",
    "t6_bm25_stemmed",
    "pl6_search_fts",
    "ep4_sql_fts_console",
    "d1_exact_dedup",
    "d2_minhash_lsh_pairs",
    "d4_ngram_jaccard_pairs",
    "d5_embedding_neardup",
    "d6_dedup_clusters",
    "d7_cluster_canonical",
    "d8_cross_corpus_neardup",
    "d9_dup_rate_report",
    "sp1_leakage_safe_split",
    "ct1_containment_pairs",
    "ct2_cross_corpus_containment",
    "dc1_decontaminate",
    "ld1_line_dedup",
    "fz1_fuzzy_pairs",
    "e6_retention_cohorts",
    "e7_rolling_active_users",
    "pl4_within_filter",
    # (b) the r9 rows deferred from r13 (d1 already above)
    "g1_g2_point_type_centroid",
    "m3_asset_byte_features",
    "t3_ilike_fallback",
    # (c) backfill — rotated out in r13, last certified r12
    "e5_funnel_steps",
    "j1_inner_band_theta_join",
    "j2_semi_join_within",
    "j3_anti_join_exclude",
    "j4_bidirectional_match",
    "j5_join_distinct_matched_b",
    "pl1_union_balanced_limit",
    "pl2_search_ilike",
    "pl3_bbox_filter",
    "pl5_exclude_filter",
    "u1_union_all_aligned",
    "u3_intersect_except",
    "w1_topk_per_group",
    "x1_token_count",
    "x2_quality_score",
    "x5_redaction",
    "x6_bpe_token_count",
    "x7_repetition_signals",
    "x8_sliding_chunks",
    "x9_gopher_rules",
    "x10_corpus_composition",
    "x11_quality_percentile_filter",
    "qs1_quality_weighted_sample",
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
