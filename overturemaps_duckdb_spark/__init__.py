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
- ``runtime``    — session KV state, load history, URL state codec (ref sessionState.js, urlState.js)
- ``queries``    — the operator-inventory query registry + DuckDB oracle SQL
"""

__version__ = "0.1.0"

from overturemaps_duckdb_spark.session import get_spark  # noqa: F401
