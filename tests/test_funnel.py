"""e5 ordered-funnel semantics: strict ordering, first-touch times,
non-converting orderings — pinned against a driver-side reference."""

from __future__ import annotations

import pyspark.sql.functions as F


def _run(spark, rows, steps=("view", "click", "purchase")):
    from overturemaps_duckdb_spark.queries.events import funnel_user_times

    df = spark.createDataFrame(rows, "user_id long, us long, event_type string")
    frames = funnel_user_times(
        df, "user_id", F.col("us"), "event_type", steps
    )
    return [
        {r["_u"]: r["_t"] for r in f.collect()} for f in frames
    ]


def test_funnel_strict_order_and_first_touch(spark):
    rows = [
        # u1 completes all three in order; step times are FIRST touches
        (1, 10, "view"), (1, 5, "view"), (1, 20, "click"),
        (1, 15, "click"),  # click@15 also valid (>5) — min wins
        (1, 30, "purchase"),
        # u2 clicks BEFORE viewing → click never counts, no purchase step
        (2, 50, "click"), (2, 60, "view"), (2, 70, "purchase"),
        # u3 views only
        (3, 1, "view"),
        # u4 same-instant view+click: strict > means click does NOT advance
        (4, 100, "view"), (4, 100, "click"),
    ]
    s1, s2, s3 = _run(spark, rows)
    assert s1 == {1: 5, 2: 60, 3: 1, 4: 100}
    # u1: first click after view@5 is 15; u2's click@50 precedes view@60
    assert s2 == {1: 15}
    assert s3 == {1: 30}


def test_funnel_user_reaches_later_step_via_second_event(spark):
    # u5's first purchase precedes the click, the second follows it —
    # the funnel takes the first purchase STRICTLY AFTER step 2
    rows = [
        (5, 1, "view"), (5, 10, "click"),
        (5, 5, "purchase"), (5, 40, "purchase"),
    ]
    s1, s2, s3 = _run(spark, rows)
    assert (s1, s2, s3) == ({5: 1}, {5: 10}, {5: 40})


def test_funnel_empty_and_unknown_types(spark):
    rows = [(9, 1, "error"), (9, 2, "signup")]
    s1, s2, s3 = _run(spark, rows)
    assert s1 == {} and s2 == {} and s3 == {}
