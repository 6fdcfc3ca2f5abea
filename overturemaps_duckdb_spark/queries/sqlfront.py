"""EP3 raw-SQL console inventory: DuckDB-dialect texts executed on Spark
through the compat shim, oracle-checked against DuckDB running the SAME
text — the strongest possible dialect-parity check."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession

from overturemaps_duckdb_spark.compat import duck_sql
from overturemaps_duckdb_spark.queries import query, t
from overturemaps_duckdb_spark.queries._sql import bm25_sql, bm25_stemmed_sql

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
    from overturemaps_duckdb_spark.operators._util import staging_root

    out_dir = staging_root(spark, sf_dir, "ep3") + "/out"
    duck_sql(
        spark,
        "CREATE OR REPLACE TABLE __ep3_docs AS "
        f"SELECT doc_id, lang FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id < 100",
    )
    duck_sql(spark, f"COPY \"__ep3_docs\" TO '{out_dir}' (FORMAT PARQUET)")
    return spark.read.parquet(out_dir)


_FTS_CONSOLE_SQL = """
SELECT doc_id,
       ROUND(fts_main_documents.match_bm25(doc_id, 'table scan merge'), 6)
           AS _score
FROM documents
WHERE fts_main_documents.match_bm25(doc_id, 'table scan merge') IS NOT NULL
ORDER BY _score DESC, doc_id
LIMIT 10
"""


@query(
    "ep4_sql_fts_console",
    oracle=bm25_stemmed_sql(
        table="documents", id_col="doc_id", text_col="text",
        stemmed_terms=["tabl", "scan", "merg"],
    )
    + """
    SELECT d.doc_id, ROUND(s._score, 6) AS _score
    FROM documents d JOIN scores s ON d.doc_id = s.id
    ORDER BY ROUND(s._score, 6) DESC, d.doc_id
    LIMIT 10
    """,
)
def ep4_sql_fts_console(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's compiled FTS SQL, verbatim through the console:
    `PRAGMA create_fts_index` then `fts_main_t.match_bm25(id, 'q')` in both
    SELECT and WHERE (pipeline.js:77-92) — rewritten by the shim into a
    correlated scalar aggregate over the PRAGMA-registered contribution
    view.  Since r12 the PRAGMA emulation stems by DEFAULT (DuckDB's
    create_fts_index default the reference relies on; the r12 review found
    the t6 operator-level fix had left this console path unstemmed), so
    the oracle is the Porter-in-SQL Okapi twin with the pre-stemmed query
    terms (table→tabl, scan→scan, merge→merg) — scores value-checked
    through the stemmed path end to end."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    duck_sql(spark, "PRAGMA create_fts_index('documents', 'doc_id', 'text')")
    return duck_sql(spark, _FTS_CONSOLE_SQL)
