"""Bounded session caches (r14, VERDICT r13 #5 / ADVICE r13): the pl4
matched-id sets and the e6/e7 activity frame persist() with no release
path — a long-lived session compiling many DISTINCT pipelines/fixtures
accumulated one dead cache entry per plan forever.  `lru_persist` gives
them the same release discipline `release_materialized` gave the dedup
closure: a bounded per-(session, slot) LRU whose evictions unpersist."""

from __future__ import annotations

from overturemaps_duckdb_spark.operators._util import (
    _LRU_REGISTRY,
    LRU_PERSIST_MAX_ENTRIES,
    lru_persist,
)


def test_lru_persist_bounds_persistent_rdds(spark):
    """Materializing more distinct plans than the cap must leave at most
    `cap` cached frames in the BlockManager — and an evicted frame must
    still recompute the right values (eviction is a cache drop, never a
    correctness event)."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    frames = []
    for i in range(10):
        df = lru_persist(
            spark.range(0, 50 + i).selectExpr("id", f"id * {i + 1} as v"),
            "testslot_bounds",
            max_entries=4,
        )
        df.count()  # materialize the cache entry
        frames.append((df, 50 + i))
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 4, (
        f"lru_persist leaked {after - before} persisted frames past its cap"
    )
    # the oldest (evicted) frame recomputes correctly
    df0, n0 = frames[0]
    assert df0.count() == n0


def test_lru_persist_same_plan_is_one_entry(spark):
    """Spark's CacheManager dedupes by analyzed plan; re-persisting the
    same plan must refresh its LRU slot, not burn an eviction."""
    key = (spark.sparkContext.applicationId, "testslot_dedupe")
    _LRU_REGISTRY.pop(key, None)
    for _ in range(6):
        lru_persist(
            spark.range(0, 7).selectExpr("id"), "testslot_dedupe", max_entries=2
        )
    assert len(_LRU_REGISTRY[key]) == 1


def test_pipeline_matched_sets_registry_bounded(spark):
    """compile_pipeline routes every matched-id persist through the
    'pipeline_matched_ids' slot: compiling more distinct within-filters
    than the cap keeps the tracked registry (and hence the live cache
    entries) bounded."""
    from overturemaps_duckdb_spark.plans.pipeline import (
        Node,
        compile_pipeline,
    )
    from overturemaps_duckdb_spark.queries.pipeline import SRC_C, catalog_cs
    from tests.conftest import SF_SMOKE

    cat = catalog_cs(spark, SF_SMOKE)
    key = (spark.sparkContext.applicationId, "pipeline_matched_ids")
    for i in range(LRU_PERSIST_MAX_ENTRIES + 4):
        nodes = [
            SRC_C,
            Node(
                id="w",
                type="combine",
                op="within",
                table="theme_supplier",
                key="places/supplier",
                distance=500.0 + i,  # distinct distance → distinct plan
            ),
        ]
        compile_pipeline(cat, nodes, limit=5)
    assert len(_LRU_REGISTRY[key]) <= LRU_PERSIST_MAX_ENTRIES


def test_act_days_registry_bounded(spark):
    """_act_days routes through the 'act_days' slot — many distinct event
    frames in one session stay bounded."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.queries.events import _act_days

    key = (spark.sparkContext.applicationId, "act_days")
    _LRU_REGISTRY.pop(key, None)
    for i in range(LRU_PERSIST_MAX_ENTRIES + 3):
        ev = spark.createDataFrame(
            [(1, i)], "user_id long, off long"
        ).select(
            "user_id",
            F.timestamp_micros(
                F.col("off") * 86_400_000_000 + 1_000_000
            ).alias("ts"),
        )
        _act_days(ev)
    assert len(_LRU_REGISTRY[key]) <= LRU_PERSIST_MAX_ENTRIES
