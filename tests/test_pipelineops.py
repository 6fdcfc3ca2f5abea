"""Unit coverage for the training-pipeline operators (as-of join, packing)
beyond the oracle parity the registry already enforces."""

from __future__ import annotations

import pyspark.sql.functions as F

from overturemaps_duckdb_spark.operators.asof import asof_join
from overturemaps_duckdb_spark.operators.packing import pack_sequences


def _frames(spark):
    trades = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("b", 5, 3), ("b", 7, 4)],
        "key string, ts long, tid long",
    )
    quotes = spark.createDataFrame(
        [("a", 9, 100), ("a", 10, 101), ("a", 10, 102), ("a", 15, 103), ("b", 6, 104)],
        "key string, ts long, qid long",
    )
    return trades, quotes


def test_asof_backward_with_ties(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, by=["key"], left_ts="ts", right_ts="ts",
        right_cols=["qid", "ts"], right_order="qid",
    )
    got = {r["tid"]: (r["r_qid"], r["r_ts"]) for r in out.collect()}
    # trade a@10: quotes at ts 9,10,10 precede; equal-ts tie → largest qid
    assert got[1] == (102, 10)
    assert got[2] == (103, 15)
    # trade b@5: no quote at or before → NULL match
    assert got[3] == (None, None)
    assert got[4] == (104, 6)


def test_asof_forward(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, by=["key"], left_ts="ts", right_ts="ts",
        right_cols=["qid"], right_order="qid", direction="forward",
    )
    got = {r["tid"]: r["r_qid"] for r in out.collect()}
    # earliest quote at-or-after each trade
    assert got[1] in (101, 102)  # ts 10 ties
    assert got[2] is None  # nothing at/after ts 20
    assert got[3] == 104
    assert got[4] is None


def test_pack_sequences_partition_independent(spark):
    rows = [(i, (i * 37) % 50 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = pack_sequences(df, "doc_id", "w", budget=100, num_partitions=1)
    b = pack_sequences(df, "doc_id", "w", budget=100, num_partitions=7)
    ka = sorted(tuple(r) for r in a.select("doc_id", "seq_id", "offset").collect())
    kb = sorted(tuple(r) for r in b.select("doc_id", "seq_id", "offset").collect())
    assert ka == kb
    # offsets stay inside the budget and seq ids are monotone in doc order
    assert all(0 <= off < 100 for _, _, off in ka)
    seqs = [s for _, s, _ in ka]
    assert seqs == sorted(seqs)


def test_deterministic_shuffle_order_and_stability(spark):
    import hashlib

    from overturemaps_duckdb_spark.operators.sampling import (
        deterministic_shuffle,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(df, "doc_id", seed=42)
    rows = [r["doc_id"] for r in out.toLocalIterator()]
    # partition-ordered iteration IS the seeded permutation: range partitions
    # are key-ordered and each is locally sorted
    expect = sorted(
        range(500), key=lambda i: hashlib.md5(f"{i}:42".encode()).hexdigest()
    )
    assert rows == expect
    # re-run → identical order; different seed → different permutation
    again = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", 42).toLocalIterator()]
    assert again == rows
    other = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", 7).toLocalIterator()]
    assert other != rows and sorted(other) == sorted(rows)


def test_gopher_rules_reason_codes(spark):
    from overturemaps_duckdb_spark.operators.textprep import gopher_rules

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in a field of green grass for hours"),
            (2, "tiny"),                              # wc + stop fail
            (3, "$$$ %% ### !!! @@@ *** $$$ %% ### !!! @@@ ***"),  # sym+wc+awl+stop
            (4, "the " + "pneumonoultramicroscopic " * 30 + "and of to in it"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in gopher_rules(docs, "doc_id", "text").collect()}
    assert out[1]["keep"] and out[1]["reasons"] == ""
    assert not out[2]["keep"] and out[2]["reasons"] == "wc,stop"
    assert not out[3]["keep"]
    assert "sym" in out[3]["reasons"].split(",")
    assert not out[4]["keep"] and out[4]["reasons"] == "awl"


def test_mixture_sample_rates_and_budget(spark):
    from overturemaps_duckdb_spark.operators.sampling import (
        mixture_rates,
        mixture_sample,
    )

    # 3 strata × 100 docs × 10 tokens each = 1000 tokens per stratum
    docs = spark.createDataFrame(
        [(s * 100 + i, f"s{s}", 10) for s in range(3) for i in range(100)],
        "doc_id long, source string, toks long",
    )
    weights = {"s0": 500, "s1": 500}  # s2 not in the recipe → dropped
    rates = {
        r["source"]: r["rate_pm"]
        for r in mixture_rates(docs, "source", "toks", weights, 1000).collect()
    }
    # s0 target = 500 tokens of 1000 available → 500 permille
    assert rates == {"s0": 500, "s1": 500, "s2": 0}

    out = mixture_sample(docs, "doc_id", "source", "toks", weights, 1000)
    got = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in got}
    assert "s2" not in by_src
    # md5 thresholding at 500 permille keeps roughly half (exact count is
    # deterministic; bound it loosely so the fixture isn't hash-brittle)
    assert 30 <= by_src["s0"] <= 70 and 30 <= by_src["s1"] <= 70
    # re-run → identical sample (retry stability)
    again = mixture_sample(docs, "doc_id", "source", "toks", weights, 1000)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in out.collect()
    )


def test_mixture_sample_rate_caps_at_full_keep(spark):
    from overturemaps_duckdb_spark.operators.sampling import mixture_sample

    docs = spark.createDataFrame(
        [(i, "small", 1) for i in range(10)] + [(100 + i, "big", 100) for i in range(10)],
        "doc_id long, source string, toks long",
    )
    # small stratum has 10 tokens but its share is 500 of 10_000 = 5000
    # tokens → rate caps at 1000 permille: keep everything it has
    out = mixture_sample(
        docs, "doc_id", "source", "toks", {"small": 500, "big": 500}, 10_000
    )
    small = [r for r in out.collect() if r["source"] == "small"]
    assert len(small) == 10 and all(r["rate_pm"] == 1000 for r in small)


def test_canonical_per_cluster_argmax_and_ties(spark):
    from overturemaps_duckdb_spark.operators.dedup import canonical_per_cluster

    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (4, 70), (5, 10)],
        "doc_id long, quality long",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)],
        "id long, cluster_id long",
    )
    out = {
        r["cluster_id"]: r
        for r in canonical_per_cluster(docs, "doc_id", clusters, "quality").collect()
    }
    # cluster 1: quality tie 90 between ids 2 and 3 → smallest id wins
    assert out[1]["keep_id"] == 2 and out[1]["keep_quality"] == 90
    assert out[1]["n_members"] == 3
    assert out[4]["keep_id"] == 4 and out[4]["n_members"] == 2


def test_temperature_weights_properties(spark):
    """tau=1 → proportional to token mass; tau=0 → uniform; permilles sum
    to exactly 1000; integrates with mixture_sample end-to-end."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.operators.sampling import (
        mixture_sample,
        temperature_weights,
    )

    rows = (
        [(i, "web", 100) for i in range(800)]
        + [(10_000 + i, "code", 100) for i in range(150)]
        + [(20_000 + i, "ref", 100) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")

    w1 = temperature_weights(df, "source", "n_tokens", tau=1.0)
    assert sum(w1.values()) == 1000
    assert w1 == {"web": 800, "code": 150, "ref": 50}

    w0 = temperature_weights(df, "source", "n_tokens", tau=0.0)
    assert sum(w0.values()) == 1000
    assert max(w0.values()) - min(w0.values()) <= 1  # uniform ± rounding

    wt = temperature_weights(df, "source", "n_tokens", tau=0.5)
    assert sum(wt.values()) == 1000
    # smoothing: tail strata gain vs proportional, head loses
    assert wt["ref"] > w1["ref"] and wt["web"] < w1["web"]

    # end-to-end: the smoothed recipe drives the budgeted sampler
    out = mixture_sample(df, "doc_id", "source", "n_tokens", wt, 40_000)
    got = {
        r["source"]: r["tok"]
        for r in out.groupBy("source")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    }
    for s in wt:
        assert got.get(s, 0) <= 100 * 1000  # never exceeds stratum mass
    # each stratum lands within sampling noise of its share of the budget
    assert abs(got["web"] - wt["web"] * 40) < 8_000


def test_temperature_allocation_exact_integer_properties(spark):
    """Engine-side largest-remainder allocation: sums to budget exactly,
    tau flattens toward the tail, weight_col mode, NULL strata excluded,
    matches a python largest-remainder reference bit-for-bit."""
    import math

    from overturemaps_duckdb_spark.operators.sampling import (
        temperature_allocation,
    )

    rows = (
        [(i, "web") for i in range(811)]
        + [(10_000 + i, "code") for i in range(153)]
        + [(20_000 + i, "ref") for i in range(57)]
        + [(30_000, None)]  # NULL stratum drops
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {
        r["source"]: r
        for r in temperature_allocation(df, "source", budget=997).collect()
    }
    assert set(out) == {"web", "code", "ref"}
    assert sum(r["alloc"] for r in out.values()) == 997
    assert out["web"]["n"] == 811

    # python reference (same integer arithmetic)
    ns = {"web": 811, "code": 153, "ref": 57}
    wm = {s: round(math.sqrt(n) * 1e6) for s, n in ns.items()}
    wz = sum(wm.values())
    base = {s: (w * 997) // wz for s, w in wm.items()}
    rem = {s: w * 997 - base[s] * wz for s, w in wm.items()}
    spare = 997 - sum(base.values())
    for s in sorted(rem, key=lambda s: (-rem[s], s))[:spare]:
        base[s] += 1
    for s in ns:
        assert out[s]["alloc"] == base[s], s
        assert out[s]["p_temp"] == round(wm[s] / wz, 6)

    # flattening: ref's temperature share beats its raw share
    assert out["ref"]["p_temp"] > out["ref"]["p_raw"]
    assert out["web"]["p_temp"] < out["web"]["p_raw"]

    # weight_col mode: mass-based counting
    df2 = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 300), (3, "b", 400)],
        "doc_id long, source string, n_tokens long",
    )
    m = {
        r["source"]: r["n"]
        for r in temperature_allocation(
            df2, "source", budget=10, weight_col="n_tokens"
        ).collect()
    }
    assert m == {"a": 400, "b": 400}

    # equal strata + odd budget: deterministic tie → name ascending
    df3 = spark.createDataFrame(
        [(1, "x"), (2, "y")], "doc_id long, source string"
    )
    eq = {
        r["source"]: r["alloc"]
        for r in temperature_allocation(df3, "source", budget=3).collect()
    }
    assert eq == {"x": 2, "y": 1}


def test_temperature_allocation_randomized_invariants(spark):
    """Randomized: for arbitrary stratum counts and budgets, allocations
    are non-negative integers summing EXACTLY to the budget, and p_temp
    orders identically to n (monotone in mass)."""
    import random

    from overturemaps_duckdb_spark.operators.sampling import (
        temperature_allocation,
    )

    rng = random.Random(77)
    for trial in range(4):
        n_strata = rng.randint(1, 9)
        budget = rng.choice([0, 1, 7, 500, 99_991])
        rows = []
        rid = 0
        counts = {}
        for s in range(n_strata):
            c = rng.randint(1, 400)
            counts[f"s{s}"] = c
            for _ in range(c):
                rows.append((rid, f"s{s}"))
                rid += 1
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = {
            r["source"]: r
            for r in temperature_allocation(
                df, "source", budget=budget
            ).collect()
        }
        assert set(out) == set(counts), trial
        assert sum(r["alloc"] for r in out.values()) == budget, trial
        assert all(r["alloc"] >= 0 for r in out.values()), trial
        for a in counts:
            for b in counts:
                if counts[a] < counts[b]:
                    assert out[a]["p_temp"] <= out[b]["p_temp"], (trial, a, b)


def test_quality_weighted_sample_properties(spark):
    """q=1 always survives, q=0 never, sharper exponents keep subsets,
    and membership is deterministic across calls."""
    from overturemaps_duckdb_spark.operators.sampling import (
        quality_weighted_sample,
    )

    rows = [(i, (i % 11) / 10.0) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, quality double")
    k1 = {r["doc_id"] for r in quality_weighted_sample(df, "doc_id", "quality", exponent=1).collect()}
    k2 = {r["doc_id"] for r in quality_weighted_sample(df, "doc_id", "quality", exponent=2).collect()}
    k2b = {r["doc_id"] for r in quality_weighted_sample(df, "doc_id", "quality", exponent=2).collect()}
    ones = {i for i, q in rows if q == 1.0}
    zeros = {i for i, q in rows if q == 0.0}
    assert ones <= k1 and ones <= k2
    assert not (zeros & k1) and not (zeros & k2)
    assert k2 <= k1  # sharper exponent thins, never adds
    assert k2 == k2b  # deterministic
    assert len(k2) < len(k1) < 600  # the middle actually thins

    import pytest as _pytest

    with _pytest.raises(ValueError):
        quality_weighted_sample(df, "doc_id", "quality", exponent=0)


def test_session_safe_split_leakage_contract(spark):
    """Whole-session assignment: a session straddling the cutoff is
    quarantined (never row-split), sessions entirely before/after label
    train/eval, and no (user, session) carries two labels."""
    from overturemaps_duckdb_spark.operators.sampling import session_safe_split

    m = 60_000_000  # one minute in us
    gap = 30 * m
    cutoff = 1_000 * m
    rows = [
        # u1: one session fully before the cutoff -> train
        (1, 100, 900 * m),
        (2, 100, 905 * m),
        # u1: second session fully after -> eval (gap > 30min from prev)
        (3, 100, 1_100 * m),
        # u2: session straddles the cutoff -> quarantine (both events)
        (4, 200, 995 * m),
        (5, 200, 1_005 * m),
        # u3: single event exactly AT the cutoff -> train (end <= cutoff)
        (6, 300, 1_000 * m),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, us long")
    out = {
        r["event_id"]: r["split"]
        for r in session_safe_split(
            df, "user_id", "us", "event_id", cutoff_us=cutoff, gap_us=gap
        ).collect()
    }
    assert out == {
        1: "train",
        2: "train",
        3: "eval",
        4: "quarantine",
        5: "quarantine",
        6: "train",
    }

    import pytest as _pytest

    with _pytest.raises(ValueError):
        session_safe_split(
            df, "user_id", "us", "event_id", cutoff_us=cutoff, gap_us=0
        )


def test_per_stratum_cap_behavior(spark):
    """Cap winners are the md5-lowest per stratum, small strata survive
    whole, cap edges are exact, and no helper columns escape."""
    from overturemaps_duckdb_spark.functions.text import md5_long
    from overturemaps_duckdb_spark.operators.sampling import per_stratum_cap

    rows = (
        [(i, "mega") for i in range(500)]
        + [(1000 + i, "small") for i in range(7)]   # below cap → all kept
        + [(2000 + i, "edge") for i in range(10)]   # exactly cap
        + [(3000, "single")]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")

    got = per_stratum_cap(df, "doc_id", "source", cap=10)
    sizes = {r["source"]: r["n"] for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"mega": 10, "small": 7, "edge": 10, "single": 1}
    # winners = the 10 md5-lowest of the mega stratum, computed independently
    mega = df.where(F.col("source") == "mega").withColumn(
        "_h", md5_long(F.col("doc_id").cast("string"))
    )
    want_ids = [r["doc_id"] for r in mega.orderBy("_h", "doc_id").limit(10).collect()]
    got_ids = [r["doc_id"] for r in got.where(F.col("source") == "mega").collect()]
    assert sorted(got_ids) == sorted(want_ids)
    # schema untouched: no helper columns escape
    assert got.columns == ["doc_id", "source"]


def test_per_stratum_cap_plan_has_partial_group_limit(spark):
    """The skew guarantee lives in Catalyst's WindowGroupLimit pushdown: a
    Partial group-limit must sit below the stratum exchange so map tasks
    emit ≤ cap rows per stratum before any shuffle.  If this optimization
    ever regresses, the mega-domain sort becomes unbounded — fail loudly."""
    from overturemaps_duckdb_spark.operators.sampling import per_stratum_cap

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    plan = (
        per_stratum_cap(df, "doc_id", "source", cap=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    partial_limits = [
        line for line in plan.splitlines()
        if "WindowGroupLimit" in line and "Partial" in line
    ]
    assert partial_limits, f"no Partial WindowGroupLimit in plan:\n{plan}"
    # exactly one exchange: the single stratum hash partitioning
    assert plan.count("Exchange hashpartitioning") == 1


def test_per_stratum_cap_validates_args(spark):
    import pytest

    from overturemaps_duckdb_spark.operators.sampling import per_stratum_cap

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="cap"):
        per_stratum_cap(df, "doc_id", "source", cap=0)


def test_write_training_shards_contract(spark, tmp_path):
    """Shard export: exact partition of the corpus, hash-balanced shards,
    within-shard rows sorted by the shuffle key, and re-export reproduces
    identical membership (retry/re-run stability)."""
    from overturemaps_duckdb_spark.operators.sampling import (
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1000)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    write_training_shards(df, "doc_id", out, n_shards=8, seed=7)

    back = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(1000))

    sizes = {
        r["_shard"]: r["n"]
        for r in back.groupBy("_shard").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == set(range(8))
    assert all(60 <= n <= 190 for n in sizes.values()), sizes  # ~125 ± hash noise

    # within-shard training order: file order == ascending shuffle key
    rows0 = spark.read.parquet(out + "/_shard=0").collect()
    keys0 = [r["_shuffle_key"] for r in rows0]
    assert keys0 == sorted(keys0) and len(keys0) == sizes[0]

    # determinism: a second export yields identical membership per shard
    out2 = str(tmp_path / "shards2")
    write_training_shards(df, "doc_id", out2, n_shards=8, seed=7)
    back2 = spark.read.parquet(out2)
    m1 = sorted((r["_shard"], r["doc_id"]) for r in back.collect())
    m2 = sorted((r["_shard"], r["doc_id"]) for r in back2.collect())
    assert m1 == m2

    # a different seed is a different permutation (not byte-luck identical)
    out3 = str(tmp_path / "shards3")
    write_training_shards(df, "doc_id", out3, n_shards=8, seed=8)
    m3 = sorted((r["_shard"], r["doc_id"]) for r in spark.read.parquet(out3).collect())
    assert m3 != m1


def test_asof_null_timestamps_and_real_timestamp_type(spark):
    """r8 review fixes: (1) a right row with NULL ts sorted first
    (ASC NULLS FIRST) and its payload was carried as a bogus match for
    left rows with no genuine predecessor — DuckDB ASOF never matches
    NULL keys; a NULL-ts left row must appear with a NULL match.
    (2) direction was a sign MULTIPLY on the ts column, which crashed
    analysis on real TimestampType even for backward."""
    import datetime as dt

    trades = spark.createDataFrame(
        [(1, "a", 10), (2, "a", None)], "tid long, key string, ts long"
    )
    quotes = spark.createDataFrame(
        [(100, "a", None), (101, "a", 20)], "qid long, key string, ts long"
    )
    out = asof_join(
        trades, quotes, by=["key"], left_ts="ts", right_ts="ts",
        right_cols=["qid"], right_order="qid",
    )
    got = {r["tid"]: r["r_qid"] for r in out.collect()}
    # no quote at-or-before ts 10 (the NULL-ts quote must NOT match)
    assert got == {1: None, 2: None}

    t0 = dt.datetime(2026, 1, 1)
    trades_t = spark.createDataFrame(
        [(1, "a", t0 + dt.timedelta(minutes=5))], "tid long, key string, ts timestamp"
    )
    quotes_t = spark.createDataFrame(
        [(7, "a", t0), (8, "a", t0 + dt.timedelta(minutes=9))],
        "qid long, key string, ts timestamp",
    )
    back = asof_join(
        trades_t, quotes_t, by=["key"], left_ts="ts", right_ts="ts",
        right_cols=["qid"], right_order="qid",
    ).collect()
    assert back[0]["r_qid"] == 7
    fwd = asof_join(
        trades_t, quotes_t, by=["key"], left_ts="ts", right_ts="ts",
        right_cols=["qid"], right_order="qid", direction="forward",
    ).collect()
    assert fwd[0]["r_qid"] == 8


def test_asof_double_order_tiebreak_not_truncated(spark):
    """r8 review fix: the tie-break order column was cast('long'), so
    equal-ts quotes at px 1.2 and 1.9 collapsed to the same rank and the
    'deterministic' tie-break became arbitrary."""
    trades = spark.createDataFrame([(1, "a", 10)], "tid long, key string, ts long")
    quotes = spark.createDataFrame(
        [(1.2, "a", 10), (1.9, "a", 10)], "px double, key string, ts long"
    )
    out = asof_join(
        trades, quotes, by=["key"], left_ts="ts", right_ts="ts",
        right_cols=["px"],
    ).collect()
    assert out[0]["r_px"] == 1.9  # largest order value wins the tie


def test_asof_range_impl_matches_keys_impl(spark):
    """r11: the range-partitioned + driver-stitched as-of form must be
    value-identical to the per-key window form on randomized data with
    ties, NULL timestamps, NULL order values, and multiple keys — in
    both directions — while actually splitting one key's stream across
    MANY partitions (the low-cardinality scale case the per-key window
    serializes)."""
    import random

    rng = random.Random(77)
    keys = ["k1", "k2"]
    lefts = [
        (rng.choice(keys), rng.choice([None] + list(range(0, 200, 3))), i)
        for i in range(120)
    ]
    # NULL-ord rights get UNIQUE (key, ts) slots: two rights tied on both
    # ts and a NULL ord are an unspecified-order case in the window form
    # itself (same class as the reference's bare LIMIT), so the
    # equivalence pin excludes full ties while keeping every other tie
    # shape (shared ts + distinct ords, NULL vs non-NULL ord).
    rights = [
        (
            rng.choice(keys),
            rng.choice(list(range(0, 200, 5)) + [None]),
            rng.choice([1, 2, 5, 9]),
            f"q{i}",
        )
        for i in range(70)
    ] + [
        (k, 1000 + 7 * i, None, f"qn{k}{i}")
        for i in range(5)
        for k in keys
    ]
    ldf = spark.createDataFrame(lefts, "k string, ts int, lid int")
    rdf = spark.createDataFrame(rights, "k string, ts int, ord int, quote string")

    def rows(df):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    for direction in ("backward", "forward"):
        base = asof_join(
            ldf, rdf.withColumnRenamed("ts", "rts"), ["k"], "ts", "rts",
            ["ord", "quote"], right_order="ord", direction=direction,
        )
        ranged = asof_join(
            ldf, rdf.withColumnRenamed("ts", "rts"), ["k"], "ts", "rts",
            ["ord", "quote"], right_order="ord", direction=direction,
            impl="range", num_partitions=7,
        )
        assert rows(ranged) == rows(base), direction

    # global as-of (by=[]) — the case the default form runs on ONE task
    base0 = asof_join(
        ldf, rdf.withColumnRenamed("ts", "rts"), [], "ts", "rts",
        ["quote"], right_order="ord",
    )
    rng0 = asof_join(
        ldf, rdf.withColumnRenamed("ts", "rts"), [], "ts", "rts",
        ["quote"], right_order="ord", impl="range", num_partitions=6,
    )
    assert rows(rng0) == rows(base0)


def test_asof_range_impl_is_actually_parallel(spark):
    """The point of impl='range': a single-key stream spreads across
    multiple range partitions instead of one window task."""
    from pyspark.sql import functions as F

    n = 5000
    ldf = spark.range(n).select(
        F.lit("only").alias("k"), F.col("id").alias("ts"), F.col("id").alias("lid")
    )
    rdf = spark.range(0, n, 10).select(
        F.lit("only").alias("k"),
        F.col("id").alias("rts"),
        F.col("id").alias("ord"),
        F.concat(F.lit("q"), F.col("id")).alias("quote"),
    )
    out = asof_join(
        ldf, rdf, ["k"], "ts", "rts", ["quote"], right_order="ord",
        impl="range", num_partitions=8,
    )
    got = {r["lid"]: r["r_quote"] for r in out.collect()}
    # spot-check the carry crosses partition boundaries correctly
    assert got[0] == "q0" and got[9] == "q0" and got[10] == "q10"
    assert got[n - 1] == f"q{((n - 1) // 10) * 10}"
    assert len(got) == n


def test_asof_randomized_differential_vs_duckdb(spark):
    """Randomized differential pin of asof_join against duckdb's NATIVE
    ASOF LEFT JOIN — an independent formulation from aj1's window-based
    oracle SQL.  Random keys (some one-sided), ts collisions across
    sides (at-or-before includes equality), NULL left ts (row emitted,
    payload NULL) and NULL right ts (never matchable), both directions,
    through BOTH impls ('keys' window and 'range' stitched).  Rights get
    UNIQUE (k, ts) so duckdb's tie choice is deterministic.

    NULL-ts contract divergence (measured on duckdb 1.0.0): duckdb's
    ASOF treats NULL ts as sort-order sentinels — backward (>=) NULL
    acts as +inf (a NULL left matches the LARGEST right, a NULL right
    is matched by a NULL left), forward (<=) NULL acts as -inf.  Our
    engine's documented semantics are cleaner: NULL ts never matches,
    NULL-ts left rows emit with NULL payload (asof.py module doc).  The
    oracle below encodes OUR contract explicitly (IS NOT NULL filters +
    a UNION ALL of the NULL-ts lefts), so the differential still covers
    NULL rows end-to-end while pinning the documented behavior."""
    import random

    import duckdb
    import pandas as pd

    rng = random.Random(1213)
    keys = ["a", "b", "c", "left_only", "d"]
    lefts = [
        (
            rng.choice(keys),
            None if rng.random() < 0.1 else rng.randrange(0, 300),
            i,
        )
        for i in range(150)
    ]
    seen: set[tuple] = set()
    rights = []
    for i in range(90):
        k = rng.choice(["a", "b", "c", "d", "right_only"])
        ts = None if rng.random() < 0.1 else rng.randrange(0, 300)
        if ts is not None and (k, ts) in seen:
            continue
        seen.add((k, ts))
        rights.append((k, ts, f"q{i}"))

    ldf = spark.createDataFrame(lefts, "k string, ts int, lid int")
    rdf = spark.createDataFrame(rights, "k string, rts int, quote string")

    con = duckdb.connect()
    con.register("l", pd.DataFrame(lefts, columns=["k", "ts", "lid"]))
    con.register("r", pd.DataFrame(rights, columns=["k", "rts", "quote"]))

    for direction, cmp in (("backward", ">="), ("forward", "<=")):
        want = sorted(
            (r[0], r[1])
            for r in con.execute(
                f"SELECT l.lid, r.quote"
                f" FROM (SELECT * FROM l WHERE ts IS NOT NULL) l"
                f" ASOF LEFT JOIN (SELECT * FROM r WHERE rts IS NOT NULL) r"
                f" ON l.k = r.k AND l.ts {cmp} r.rts"
                f" UNION ALL SELECT lid, NULL FROM l WHERE ts IS NULL"
            ).fetchall()
        )
        for impl in ("keys", "range"):
            got = sorted(
                (r["lid"], r["r_quote"])
                for r in asof_join(
                    ldf, rdf, ["k"], "ts", "rts", ["quote"],
                    direction=direction, impl=impl, num_partitions=5,
                ).collect()
            )
            assert got == want, (direction, impl)

    # global as-of (no equality key) — duckdb ASOF with only the
    # inequality condition vs by=[]
    uniq_ts: set = set()
    g_rights = []
    for k, ts, q in rights:
        if ts is None or ts in uniq_ts:
            continue
        uniq_ts.add(ts)
        g_rights.append((ts, q))
    g_rdf = spark.createDataFrame(g_rights, "rts int, quote string")
    con.register("gr", pd.DataFrame(g_rights, columns=["rts", "quote"]))
    want0 = sorted(
        (r[0], r[1])
        for r in con.execute(
            "SELECT l.lid, gr.quote"
            " FROM (SELECT * FROM l WHERE ts IS NOT NULL) l"
            " ASOF LEFT JOIN gr ON l.ts >= gr.rts"
            " UNION ALL SELECT lid, NULL FROM l WHERE ts IS NULL"
        ).fetchall()
    )
    for impl in ("keys", "range"):
        got0 = sorted(
            (r["lid"], r["r_quote"])
            for r in asof_join(
                ldf, g_rdf, [], "ts", "rts", ["quote"],
                impl=impl, num_partitions=4,
            ).collect()
        )
        assert got0 == want0, impl
