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


#: Certification rotation, round 12 (VERDICT r11 #1/#4).  Budget: the
#: driver certifies the FIRST 50 entries.  Composition:
#: (a) the two r11 FAILs, now fixed (array outputs serialized) — emb1 +
#: bpe2 lead so their red rows turn green first;
#: (b) r12-new: t6_bm25_stemmed (Porter FTS parity), e5_funnel_steps
#: (ordered-funnel conversion), e6_retention_cohorts (retention matrix),
#: e7_rolling_active_users (DAU/WAU) — no driver rows yet;
#: (c) r12-behavior-changed, re-certified on top of green rows:
#: d6/d7/sp1 (dedup_clusters rewritten to edge-touched-subgraph Boruvka
#: hook/jump/contract — values unchanged by construction, re-proved by
#: the driver + a union-find differential), pl1/pl2/pl6 (geojson column
#: re-entered the
#: oracle comparison — pl3/pl4/pl5 are already in (e)), qs1 (negative-
#: quality clamp mirrored into the oracle — value-neutral on the
#: fixture), ep4 (console PRAGMA now stems by default like DuckDB's
#: create_fts_index; oracle switched to the Porter-in-SQL twin),
#: t1/t2/t5 (the engine-wide stemmed-by-default flip — build_fts_index /
#: fts_index_for now default to 'porter' like the reference's DuckDB
#: index; their oracles state the Porter-in-SQL pipeline);
#: (d) f5_is_not_null — the last r7 row;
#: (e) the remaining r8 cohort (32 rows; q1_pricing_summary stays
#: displaced — it is entry()'s flagship, smoke-run by the driver every
#: round on top of its r8 row; u2/s11/o6 displaced for the three new
#: event-analytics queries and sh1/w2/w3 for the behavior-changed
#: t1/t2/t5, each with an in-prefix family anchor — rationales inline).
#: After a green r12: no row predates r9 except q1 (entry-smoked) and
#: the six displaced trivial forms (u2/s11/o6/sh1/w2/w3, r8).
#: Held for r13: the r9 cohort (40 rows incl. j2_spatial_within) + those
#: six r8 rows.
_CERT_PRIORITY = [
    # (a) r11 FAILs, fixed
    "emb1_label_centroids",
    "bpe2_tokenize",
    # (b) new
    "t6_bm25_stemmed",
    "e5_funnel_steps",
    "e6_retention_cohorts",
    "e7_rolling_active_users",
    # (c) r12-behavior-changed
    "d6_dedup_clusters",
    "d7_cluster_canonical",
    "sp1_leakage_safe_split",
    "pl1_union_balanced_limit",
    "pl2_search_ilike",
    "pl6_search_fts",
    "t1_fts_index_build",
    "t2_bm25_topk",
    "t5_search_fanout",
    "qs1_quality_weighted_sample",
    "ep4_sql_fts_console",
    # (d) last r7 row
    "f5_is_not_null",
    # (e) remaining r8 cohort, r8-file order
    "aj1_asof_join",
    "d5_embedding_neardup",
    "dc1_decontaminate",
    "j1_inner_band_theta_join",
    "j2_semi_join_within",
    "j3_anti_join_exclude",
    "j4_bidirectional_match",
    "j5_join_distinct_matched_b",
    "m5_ppm_resize",
    "mx1_token_budget_mix",
    "o5_balanced_union_limit",
    # o6_nulls_last_sort displaced for the new e7_rolling_active_users —
    # the nulls-last sort form is exercised by pl2's certified
    # NULLS-LAST ranking in-prefix; refreshes with r13
    "pk1_sequence_packing",
    "pl3_bbox_filter",
    "pl4_within_filter",
    "pl5_exclude_filter",
    # s11_count_probe displaced for the new e6_retention_cohorts — the
    # bare-count form is exercised by every aggregate row in the prefix
    # and re-oracled locally each round; refreshes with r13
    "s1_scan_filter_project",
    "s5_ctas_ingest_budget",
    "s6_incremental_append",
    "sa1_hash_sample",
    "sa2_stratified_sample",
    # sh1_deterministic_shuffle displaced for t1_fts_index_build (stemmed
    # default) — its md5-ordering machinery is the same hash_sample family
    # as the kept sa1/sa2 rows; refreshes with r13
    "u1_union_all_aligned",
    # u2_union_distinct displaced for the new e5_funnel_steps — its
    # union-distinct form is family-covered by the kept u1/u3 rows and
    # re-oracled locally every round; refreshes with r13
    "u3_intersect_except",
    "w1_topk_per_group",
    # w2_running_sum / w3_rank_dense_rank displaced for t2_bm25_topk and
    # t5_search_fanout (stemmed defaults) — window-function family covered
    # by the kept w1 row; refresh with r13
    "x10_corpus_composition",
    "x11_quality_percentile_filter",
    "x1_token_count",
    "x2_quality_score",
    "x5_redaction",
    "x6_bpe_token_count",
    "x7_repetition_signals",
    "x8_sliding_chunks",
    "x9_gopher_rules",
    # (f) — j2_spatial_within (the planned r9 lead-off) displaced by ep4's
    # behavior change above; the r9 cohort rotates in with r13
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
