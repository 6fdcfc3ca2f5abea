"""EP3 raw-SQL console inventory: DuckDB-dialect texts executed on Spark
through the compat shim, oracle-checked against DuckDB running the SAME
text — the strongest possible dialect-parity check."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from overturemaps_duckdb_spark.compat import duck_sql
from overturemaps_duckdb_spark.queries import query, t

_EP3_SQL = """
SELECT doc_id,
       string_split(text, ' ')[1] AS first_word,
       n_chars // 100 AS size_bucket,
       list_min(list_transform(string_split(text, ' '), w -> length(w)))
           AS min_word_len
FROM documents
WHERE doc_id % 25 = 0
"""


@query("ep3_sql_console", oracle=_EP3_SQL)
def ep3_sql_console(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3 — the same DuckDB-dialect text the oracle runs, executed on Spark
    via the shim (1-based `[1]`, `//`, `string_split`, `list_*` lambdas)."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return duck_sql(spark, _EP3_SQL)


@query(
    "ep3_ctas_copy_roundtrip",
    oracle="SELECT doc_id, lang FROM documents WHERE doc_id < 100",
)
def ep3_ctas_copy_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3 statement intercepts: `read_parquet(...)` scan → `CREATE TABLE AS`
    → `COPY TO (FORMAT PARQUET)` → re-read (themes.js:195-242 shape, through
    SQL text alone)."""
    out_dir = tempfile.mkdtemp(prefix="omds_ep3_") + "/out"
    duck_sql(
        spark,
        "CREATE OR REPLACE TABLE __ep3_docs AS "
        f"SELECT doc_id, lang FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id < 100",
    )
    duck_sql(spark, f"COPY \"__ep3_docs\" TO '{out_dir}' (FORMAT PARQUET)")
    return spark.read.parquet(out_dir)
