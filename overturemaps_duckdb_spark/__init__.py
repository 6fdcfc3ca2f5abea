"""overturemaps_duckdb_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of
``nikmarch/overturemaps-duckdb`` (a JS pipeline→SQL compiler executing on
DuckDB-WASM), re-expressed Spark-first: the logical plan is declared with the
DataFrame/SQL API and Catalyst + Tungsten pick the physical strategy.

Layout
------
- ``session``    — SparkSession bootstrap + instrumentation (ref duckdb.js / queryRunner.js)
- ``sources``    — parquet scan/probe/manifest-pruning/ingest/snapshots (ref themes.js, worker/index.js)
- ``functions``  — geo kernel (pure-python WKB pandas UDFs), text kernels, SQL compat shims
- ``operators``  — spatial joins, FTS/BM25, dedup, similarity search, multimodal plumbing
- ``plans``      — the pipeline-DSL → DataFrame compiler (ref pipeline.js)
- ``streaming``  — incremental ingest + event-time windows (extension surface)
- ``state``      — session KV, snapviews, load history, URL codec (ref sessionState.js, urlState.js)
- ``compat``     — the DuckDB-dialect SQL front door (ref SqlQueryPanel/AnalysisPanel)
- ``engine``     — the controller-layer facade tying it all together (ref controller.js)
- ``queries``    — the operator-inventory query registry + DuckDB oracle SQL

Quick start::

    from overturemaps_duckdb_spark import Engine, get_spark
    eng = Engine(get_spark(), root="/data/engine-state")
"""

__version__ = "0.1.0"

from overturemaps_duckdb_spark.session import get_spark  # noqa: F401


def __getattr__(name):
    # lazy facade import (engine pulls in most subsystems)
    if name == "Engine":
        from overturemaps_duckdb_spark.engine import Engine

        return Engine
    if name == "duck_sql":
        from overturemaps_duckdb_spark.compat import duck_sql

        return duck_sql
    if name == "compile_pipeline":
        from overturemaps_duckdb_spark.plans.pipeline import compile_pipeline

        return compile_pipeline
    raise AttributeError(name)
