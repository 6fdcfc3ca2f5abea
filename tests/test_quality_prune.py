"""quality_percentile_prune: approx (scale path) vs exact (verification).

Pins the two contracts VERDICT r2 asked for:
- the approx keep-set equals the exact keep-set on fixture data (the GK
  sketch is exact while per-group counts stay under `accuracy`, modulo the
  percent_rank-vs-quantile boundary convention, compared here explicitly);
- the approx plan contains NO per-group sort (no Window/Sort over the
  corpus side) and joins the threshold table as a broadcast.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from overturemaps_duckdb_spark.functions.text import quality_score
from overturemaps_duckdb_spark.operators.textprep import quality_percentile_prune
from overturemaps_duckdb_spark.queries import t

SF = "/root/testdata/sf0.001"


def _docs(spark):
    d = t(spark, SF, "documents")
    return d.select("doc_id", "lang", quality_score("text").alias("quality"))


def test_approx_matches_exact_keepset(spark):
    d = _docs(spark).cache()
    exact = quality_percentile_prune(d, mode="exact")
    approx = quality_percentile_prune(d, mode="approx")
    kept_e = {r.doc_id for r in exact.select("doc_id").collect()}
    kept_a = {r.doc_id for r in approx.select("doc_id").collect()}
    # Boundary convention: exact keeps pr >= 0.6 with pr = (rank-1)/(n-1);
    # approx keeps quality >= the 0.6-quantile VALUE.  With an exact sketch
    # these differ only on rows tied with the threshold value — allow the
    # approx set to include those boundary ties, nothing else.
    assert kept_a, "approx path kept nothing"
    extra = kept_a - kept_e
    if extra:
        thr = (
            d.groupBy("lang")
            .agg(F.expr("approx_percentile(quality, 0.6d, 10000)").alias("thr"))
            .collect()
        )
        thr_by_lang = {r.lang: r.thr for r in thr}
        rows = {r.doc_id: r for r in d.collect()}
        for doc_id in extra:
            r = rows[doc_id]
            assert r.quality == thr_by_lang[r.lang], (
                f"non-boundary disagreement: {doc_id}"
            )
    missing = kept_e - kept_a
    assert not missing, f"approx dropped exact-kept rows: {sorted(missing)[:5]}"
    d.unpersist()


def test_approx_plan_has_no_pergroup_sort(spark):
    d = _docs(spark)
    plan = (
        quality_percentile_prune(d, mode="approx")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "SortExec" not in plan and "Sort " not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    exact_plan = (
        quality_percentile_prune(d, mode="exact")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in exact_plan  # the twin really is the sort-based form
