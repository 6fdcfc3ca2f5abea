"""x4_fingerprints profile guard (VERDICT r05 #6).

x4 is the slowest *linear* query in the inventory (~21 s at sf1 — the
per-char sort/distinct the fingerprint contract requires; the oracle
does identical work).  The regression class to guard is the one that
turned minhash_signature quadratic in round 5 (NOTES #11): an expensive
subexpression chain getting re-bound INSIDE a HOF lambda body, where
codegen does no CSE and the chain re-evaluates once per array element —
per-char cost jumps from k+1-fold to O(len)-fold.

Two guards:
- an always-on optimized-plan pin (deterministic, noise-free): the
  md5/array_sort/array_distinct kernels appear exactly once per
  fingerprint column, the tokenize chain at most its documented
  k+1-fold count, and NEVER inside a lambdafunction body;
- an opt-in relative runtime check (same gate as the sf1 scale suite):
  doubling the document length must not triple the kernel time —
  interleaved min-of-3 on synthetic in-memory docs, so host noise hits
  both arms alike and no fixture IO is involved.
"""

from __future__ import annotations

import os
import re
import time

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE


def test_x4_plan_duplication_pinned(spark):
    from overturemaps_duckdb_spark import queries as _q

    _q.load_all()
    df = _q.QUERIES["x4_fingerprints"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # one md5/sort/distinct per fingerprint column, no more
    assert plan.count("md5(") == 2
    assert plan.count("array_sort(") == 2
    assert plan.count("array_distinct(") == 2
    # the tokenize chain replicates k+1-fold around the shingle zip_with
    # arguments (documented linear cost, NOTES r5 #11 audit) — 8 today;
    # a jump past 10 means someone re-bound it per element/reference
    assert plan.count("regexp_replace(lower(") <= 10
    # and it must NEVER appear inside a lambda body, where codegen does
    # no CSE and it would re-evaluate once per array element (the
    # minhash_signature HOF-argument trap, 65 s -> 10.9 s when fixed)
    assert not re.findall(r"lambdafunction\([^)]*regexp_replace", plan)


@pytest.mark.skipif(
    not (
        os.path.isdir(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "benchdata",
                "sf1",
            )
        )
        or os.environ.get("SPARK_GRAFT_SCALE_TEST")
    ),
    reason="opt-in (scale-suite gate): set SPARK_GRAFT_SCALE_TEST=1",
)
def test_x4_per_char_cost_stays_linear(spark):
    """Doubling doc length must scale the fingerprint kernel ~2×, never
    ~4× (quadratic).  Bound is a generous 3.2× with interleaved
    min-of-3 to ride out host-noise bursts."""
    from overturemaps_duckdb_spark.functions.text import (
        content_fingerprint,
        shingle_fingerprint,
    )

    def mk(n_chars: int):
        # deterministic pseudo-text: repeatable, non-constant chars
        word = F.concat(
            F.lit("w"),
            ((F.col("id") * 2654435761) % 9973).cast("string"),
        )
        return spark.range(20_000).select(
            F.col("id"),
            F.array_join(
                F.array_repeat(word, n_chars // 6), " "
            ).alias("text"),
        )

    def run(df) -> float:
        out = df.select(
            content_fingerprint("text").alias("a"),
            shingle_fingerprint("text", 3).alias("b"),
        )
        t0 = time.monotonic()
        out.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    short, long_ = mk(600), mk(1200)
    run(short)  # warm codegen
    ts, tl = [], []
    for _ in range(3):  # interleaved so noise bursts hit both arms
        ts.append(run(short))
        tl.append(run(long_))
    ratio = min(tl) / max(min(ts), 1e-6)
    assert ratio < 3.2, (
        f"2x doc length cost {ratio:.2f}x (short={min(ts):.2f}s, "
        f"long={min(tl):.2f}s) — per-char cost no longer linear"
    )
