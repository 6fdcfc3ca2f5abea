"""Embedding quantization: round-trip error bound, exactness invariants,
edge rows (zero vector, empty vector, saturation), and the no-shuffle plan
shape.  The value-level engine parity is the qz1 oracle
(tests/test_oracle_parity.py); these pin the operator's contract directly."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from overturemaps_duckdb_spark.operators.similarity import quantize_embeddings


def _qz(spark, rows, bits=8):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return {
        r["id"]: r
        for r in quantize_embeddings(
            df, id_col="vec_id", vec_col="embedding", bits=bits
        ).collect()
    }


def test_roundtrip_error_bounded_and_max_saturates(spark):
    rows = [(1, [0.5, -1.0, 0.25, 0.127]), (2, [3.0, 2.0, -3.0, 0.0])]
    out = _qz(spark, rows)
    for vid, vec in rows:
        r = out[vid]
        amax = max(abs(x) for x in vec)
        assert r["scale"] == pytest.approx(amax / 127.0, rel=1e-12)
        # every residual ≤ scale/2 (round-to-nearest), so mse ≤ (scale/2)^2
        assert 0.0 <= r["mse"] <= (r["scale"] / 2) ** 2 + 1e-15
        # the max-magnitude element maps to exactly ±127 — no clipping branch
        deq = [q * r["scale"] for q in r["qvec"]]
        for x, d in zip(vec, deq):
            assert abs(x - d) <= r["scale"] / 2 + 1e-12
        assert max(abs(q) for q in r["qvec"]) == 127
        assert r["n_sat"] >= 1


def test_zero_and_empty_vectors(spark):
    out = _qz(spark, [(1, [0.0, 0.0, 0.0]), (2, [])])
    assert out[1]["scale"] == 0.0
    assert out[1]["qvec"] == [0, 0, 0]
    assert out[1]["mse"] == 0.0
    assert out[1]["n_sat"] == 0
    assert out[2]["scale"] == 0.0
    assert out[2]["qvec"] == []
    assert out[2]["mse"] == 0.0


def test_bits_knob_and_validation(spark):
    out = _qz(spark, [(1, [1.0, -2.0, 0.5])], bits=4)  # qmax = 7
    assert max(abs(q) for q in out[1]["qvec"]) == 7
    assert out[1]["scale"] == pytest.approx(2.0 / 7.0, rel=1e-12)
    with pytest.raises(ValueError):
        quantize_embeddings(
            spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>"),
            bits=1,
        )


def test_quantize_no_shuffle_no_udf(spark):
    """Per-row column math only: the plan must contain no Exchange and no
    Python evaluation — at 100 TB this runs at scan speed."""
    df = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 17).cast("float") for i in range(8)]).alias(
            "embedding"
        ),
    )
    plan = (
        quantize_embeddings(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython


def test_mse_matches_manual_fold(spark):
    import numpy as np

    out = _qz(spark, [(9, [0.31, -0.77, 0.05, 0.993, -0.41])])
    r = out[9]
    # the column is float32 — replicate the engine's float32-rounded inputs
    vec = [float(np.float32(x)) for x in (0.31, -0.77, 0.05, 0.993, -0.41)]
    scale = max(abs(x) for x in vec) / 127.0
    # round half away from zero (python round() is banker's)
    q = [
        int(math.floor(x / scale + 0.5))
        if x >= 0
        else -int(math.floor(-x / scale + 0.5))
        for x in vec
    ]
    mse = sum((x - qi * scale) ** 2 for x, qi in zip(vec, q)) / len(vec)
    assert r["qvec"] == q
    assert r["mse"] == pytest.approx(mse, rel=1e-12)


def test_quantize_property_random_vectors(spark):
    """Randomized invariants over one batched Spark job (one job, many
    vectors — the hypothesis-style sweep without per-example Spark
    overhead): residuals bounded by scale/2, q range bounded by qmax,
    max-magnitude element saturated, dequant of zeros exact."""
    import random

    import numpy as np

    rnd = random.Random(42)
    rows = []
    for vid in range(200):
        dim = rnd.choice([1, 3, 16, 64])
        scale_mag = 10.0 ** rnd.uniform(-6, 6)
        vec = [rnd.uniform(-scale_mag, scale_mag) for _ in range(dim)]
        if rnd.random() < 0.05:
            vec = [0.0] * dim  # occasional zero vector
        rows.append((vid, vec))
    out = _qz(spark, rows)
    for vid, vec in rows:
        r = out[vid]
        v32 = [float(np.float32(x)) for x in vec]
        amax = max(abs(x) for x in v32) if v32 else 0.0
        assert r["scale"] == pytest.approx(amax / 127.0, rel=1e-12, abs=1e-300)
        assert all(abs(q) <= 127 for q in r["qvec"])
        if amax > 0:
            assert max(abs(q) for q in r["qvec"]) == 127
            for x, q in zip(v32, r["qvec"]):
                assert abs(x - q * r["scale"]) <= r["scale"] / 2 * (1 + 1e-9)
        else:
            assert all(q == 0 for q in r["qvec"]) and r["mse"] == 0.0


def test_quantize_report_null_vector_matches_oracle(spark):
    """ADVICE r04: a NULL embedding row must report q_sum 0 — DuckDB's
    coalesce(list_sum(NULL), 0) — not NULL (Spark's bare aggregate over a
    NULL array).  The fixture has no NULL vectors, so this edge is pinned
    here instead."""
    import duckdb

    from overturemaps_duckdb_spark.queries.similarity import quantize_report

    df = spark.createDataFrame(
        [(1, None), (2, [2.0, -4.0])], "vec_id long, embedding array<float>"
    )
    out = {r["vec_id"]: r for r in quantize_report(df).collect()}
    assert out[1]["q_sum"] == 0 and out[1]["scale_r"] == 0.0
    # scale = 4/127; round(2/scale) = round(63.5) = 64, round(-4/scale) = -127
    assert out[2]["q_sum"] == 64 - 127
    # cross-check the NULL fold against DuckDB's stated semantics
    assert duckdb.sql("SELECT coalesce(list_sum(NULL), 0)").fetchone()[0] == 0


def test_groupwise_centroids_reference_and_contract(spark):
    """Exact per-group mean vs a python reference (same integer
    arithmetic, negatives included); malformed vectors excluded wholly;
    partition-invariant."""
    import math
    import random

    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark.operators.similarity import (
        groupwise_centroids,
    )

    rng = random.Random(13)
    dim = 5
    rows = []
    for i in range(80):
        rows.append(
            (i, i % 3, [rng.uniform(-2, 2) for _ in range(dim)])
        )
    rows.append((100, 0, None))                 # NULL vector -> dropped
    rows.append((101, 1, [1.0] * (dim - 1)))    # wrong dim -> dropped
    rows.append((102, 2, [1.0, None, 1.0, 1.0, 1.0]))  # NULL element -> dropped
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = {
        r["label"]: r
        for r in groupwise_centroids(df, "label", "embedding", dim=dim).collect()
    }

    sums = {g: [0] * dim for g in (0, 1, 2)}
    ns = {g: 0 for g in (0, 1, 2)}
    for i, g, v in rows:
        if v is None or len(v) != dim or any(x is None for x in v):
            continue
        ns[g] += 1
        for j, x in enumerate(v):
            sums[g][j] += math.floor(x * 1e6 + 0.5)
    for g in (0, 1, 2):
        assert out[g]["n_vectors"] == ns[g]
        want = []
        for s in sums[g]:
            n = ns[g]
            m = -((2 * (-s) + n) // (2 * n)) if s < 0 else (2 * s + n) // (2 * n)
            want.append(m / 1e6)
        assert out[g]["centroid"] == want, g

    shuffled = {
        r["label"]: r["centroid"]
        for r in groupwise_centroids(
            df.repartition(7, F.col("vec_id")), "label", "embedding", dim=dim
        ).collect()
    }
    assert shuffled == {g: out[g]["centroid"] for g in out}
