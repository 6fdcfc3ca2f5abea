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


#: Certification rotation, round 5 (VERDICT r04 finding #1): lead with the
#: 10 round-4 registrations that have NEVER had a driver CORRECTNESS row,
#: then freshen the oldest certifications — the r1 cohort (certified r1/r2,
#: several of which changed behavior since: the j-family grid rerouting,
#: g5/g6 unforcing, y1 pyarrow metadata writes, quality-score users) and the
#: three r4-changed r2-cohort dedup queries (d6/d7/d8 lineage cut) get
#: displaced into the next rotation per NOTES.  A green round 5 means every
#: one of the 154 registered queries has a driver row and no certification
#: is older than its query's last behavior change (except the explicitly
#: listed next-rotation tail).  Regression cover for everything behind the
#: prefix: tests/test_oracle_parity.py re-verifies all 154 against DuckDB
#: locally every round.
_CERT_PRIORITY = [
    # the 10 never-driver-sampled round-4 registrations
    "ld1_line_dedup",
    "sa3_source_cap",
    "x12_vocab_topk",
    "qz1_embedding_quantize",
    "ex1_training_shards",
    "sk2_skew_report",
    "d9_dup_rate_report",
    "cd1_corpus_diff",
    "fz1_fuzzy_pairs",
    "x13_intra_doc_dedup",
    # r1 cohort, oldest certification first — freshen (several changed
    # behavior since r1/r2: j1–j5/g5/g6 routing, y1 metadata writes)
    "d1_exact_dedup",
    "d3_simhash_buckets",
    "d4_ngram_jaccard_pairs",
    "e1_tumbling_window",
    "e2_sessionize",
    "i1_stream_tumbling_window",
    "i2_stream_session_window",
    "i3_stateful_running_totals",
    "e4_grouped_quantiles",
    "i4_stream_stream_join",
    "e3_lag_delta",
    "t1_fts_index_build",
    "t3_ilike_fallback",
    "g1_g2_point_type_centroid",
    "g1_g2_polygon_type_centroid_area",
    "g3_asgeojson_point",
    "j1_spatial_intersect_join",
    "j2_spatial_within",
    "j3_spatial_exclude",
    "j4_spatial_bidirectional",
    "g5_distance_pairs",
    "g6_intersection_area",
    "j8_grid_banded_join",
    "s2_schema_probe",
    "s9_s10_table_lifecycle",
    "t4_search_name_composition",
    "o7_zorder_by_area",
    "ep1_load_theme",
    "s3_manifest_pruned_scan",
    "s13_grid_partitioned_scan",
    "s7_s8_snapview_roundtrip",
    "y1_session_kv",
    "y4_url_codec",
    "m1_asset_metadata",
    "m2_asset_decode",
    "m3_asset_byte_features",
    "m4_frame_sample",
    "m6_audio_modality",
    "pl1_union_balanced_limit",
    "pl2_search_ilike",
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
