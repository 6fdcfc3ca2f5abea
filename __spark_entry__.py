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


#: Certification rotation, round 13 (VERDICT r12 #2 + the optimization
#: round's own re-certification duty).  Budget: the driver certifies the
#: FIRST 50 entries.  Composition:
#: (a) every query whose PHYSICAL PATH changed in the r13 optimization
#: round leads, so the value-neutrality of each change lands as a green
#: driver row: FTS vocabulary-stem restructure (t1/t2/t5/t6/pl6/ep4),
#: minhash repartition guard (d2/d8 + sp1), closure checkpoint release
#: (d6/d7), pl4 matched-set persist, e6/e7 floor-division day buckets;
#: (b) the six r8 trivial forms displaced in r12 (o6/s11/sh1/u2/w2/w3 —
#: q1 stays displaced: it is entry()'s flagship, smoke-run every round);
#: (c) 30 rows of the r9 cohort (the remaining budget).  Four r9 rows
#: are deferred to r14 with in-prefix family anchors: d1_exact_dedup
#: (exact-dup machinery inside the certified d2/d9 rows),
#: g1_g2_point_type_centroid (same WKB kernel as the in-prefix g3/g5/g6
#: and the r10-certified polygon twin), m3_asset_byte_features
#: (bench-smoked every round; m2/m4 in prefix), t3_ilike_fallback
#: (ILIKE form certified via pl2 r12; runner-degrade pytest).  After a
#: green r13 no driver row predates r10 except q1 (entry-smoked) and
#: those four anchored r9 rows.
_CERT_PRIORITY = [
    # (a) r13 physical-path changes — prove value-neutrality first
    "t1_fts_index_build",
    "t2_bm25_topk",
    "t5_search_fanout",
    "t6_bm25_stemmed",
    "pl6_search_fts",
    "ep4_sql_fts_console",
    "d2_minhash_lsh_pairs",
    "d8_cross_corpus_neardup",
    "sp1_leakage_safe_split",
    "d6_dedup_clusters",
    "d7_cluster_canonical",
    "pl4_within_filter",
    "e6_retention_cohorts",
    "e7_rolling_active_users",
    # (b) the r8 stragglers
    "o6_nulls_last_sort",
    "s11_count_probe",
    "sh1_deterministic_shuffle",
    "u2_union_distinct",
    "w2_running_sum",
    "w3_rank_dense_rank",
    # (c) r9 cohort (file order; 30 of 35 — see deferral note above)
    "cd1_corpus_diff",
    "d3_simhash_buckets",
    "d4_ngram_jaccard_pairs",
    "d9_dup_rate_report",
    "e2_sessionize",
    "e3_lag_delta",
    "fz1_fuzzy_pairs",
    "g3_asgeojson_point",
    "g5_distance_pairs",
    "g6_intersection_area",
    "i3_stateful_running_totals",
    "i4_stream_stream_join",
    "j2_spatial_within",
    "j3_spatial_exclude",
    "j4_spatial_bidirectional",
    "j8_grid_banded_join",
    "ld1_line_dedup",
    "m2_asset_decode",
    "m4_frame_sample",
    "o7_zorder_by_area",
    "p3_array_index_1based",
    "qz1_embedding_quantize",
    "s2_schema_probe",
    "s9_s10_table_lifecycle",
    "sa3_source_cap",
    "sk2_skew_report",
    "t4_search_name_composition",
    "x12_vocab_topk",
    "x13_intra_doc_dedup",
    "y4_url_codec",
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
