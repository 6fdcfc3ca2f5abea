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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted ⇒ rows-only check by design,
    e.g. engine-specific sketches like approx_count_distinct)."""
    return dict(_q.ORACLES)
