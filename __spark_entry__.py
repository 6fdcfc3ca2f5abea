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


#: Certification rotation, round 8 (VERDICT r07 finding #1 — the r7
#: rotation was skipped, so this one clears EVERY stale row at once):
#: n3 first (its bounded-recall oracle landed r7 and has never produced
#: a driver CORRECTNESS row), then the 3 r1 rows, the 4 r2 rows, the 22
#: r3 rows, and 20 of the 25 r4 rows to pad to exactly 50.  The 5 r4
#: rows left for r9 are d2/t2/pl6 (headline-bench-exercised and
#: plan-asserted every round) and t5/ep3-ctas (operator paths shared
#: with the included t2-family/ep3_sql_console).  A green round 8 leaves
#: no driver row older than r4 and n3 at 154/154 driver-oracled.
#: Regression cover for everything behind the prefix:
#: tests/test_oracle_parity.py re-verifies all 154 against DuckDB
#: locally every round.
_CERT_PRIORITY = [
    # never driver-oracled: the r7 bounded-recall certification report
    "n3_ivf_ann_topk",
    # r1-certified rows
    "pl3_bbox_filter",
    "pl4_within_filter",
    "pl5_exclude_filter",
    # r2-certified rows
    "dc1_decontaminate",
    "i6_stream_dedup_replay",
    "s14_bucketed_join",
    "s15_table_profile",
    # r3-certified rows
    "aj1_asof_join",
    "j1_inner_band_theta_join",
    "j2_semi_join_within",
    "j3_anti_join_exclude",
    "j4_bidirectional_match",
    "j5_join_distinct_matched_b",
    "j6_pip_fold_collect",
    "mx1_token_budget_mix",
    "n1_cosine_topk",
    "o5_balanced_union_limit",
    "o6_nulls_last_sort",
    "q1_pricing_summary",
    "s1_scan_filter_project",
    "s5_ctas_ingest_budget",
    "s6_incremental_append",
    "s11_count_probe",
    "u1_union_all_aligned",
    "u2_union_distinct",
    "u3_intersect_except",
    "w1_topk_per_group",
    "w2_running_sum",
    "w3_rank_dense_rank",
    # r4-certified rows (oldest remaining cohort, 20 of 25)
    "d5_embedding_neardup",
    "n2_lsh_ann_pairs",
    "s4_discover_catalog",
    "m5_ppm_resize",
    "ep3_sql_console",
    "ep4_sql_fts_console",
    "x1_token_count",
    "x2_quality_score",
    "x5_redaction",
    "x6_bpe_token_count",
    "x7_repetition_signals",
    "x8_sliding_chunks",
    "x9_gopher_rules",
    "x10_corpus_composition",
    "x11_quality_percentile_filter",
    "sa1_hash_sample",
    "sa2_stratified_sample",
    "pk1_sequence_packing",
    "sh1_deterministic_shuffle",
    "sk1_salted_agg",
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
