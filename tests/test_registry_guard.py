"""Registry-wide driver-compat guard (VERDICT r11 #2).

The round driver canonicalizes every certified result with pandas
``sort_values`` over all columns, which raises ``TypeError: unhashable
type`` on any top-level array/map cell — the CORRECTNESS_r11 emb1/bpe2
failure class.  This guard makes that class impossible to re-ship: every
registered query's OUTPUT SCHEMA must be free of top-level
ArrayType/MapType columns (serialize them: ``concat_ws`` engine-side,
``array_to_string``/``string_agg`` oracle-side).

Schema-only: building the DataFrame at sf0.001 triggers analysis (and the
few internal driver-side actions some queries take — merge collects,
sizing probes), never a full collect of the result.
"""

from __future__ import annotations

import pytest

from overturemaps_duckdb_spark import queries as q
from tests.conftest import SF_SMOKE

q.load_all()

_NAMES = sorted(q.QUERIES)


@pytest.mark.parametrize("name", _NAMES)
def test_no_top_level_array_output(name, spark):
    df = q.QUERIES[name](spark, SF_SMOKE)
    bad = q.driver_unsafe_columns(df)
    assert not bad, (
        f"{name} returns driver-unhashable top-level column(s) {bad}: the "
        "driver's pandas canonicalizer crashes on these — serialize them "
        "(concat_ws / array_to_string) on BOTH the Spark and oracle sides"
    )


def test_guard_flags_array_and_map_outputs(spark):
    """Negative control: a deliberately array-returning frame must trip the
    guard (and the driver-canon probe in oracle_harness must agree)."""
    import pyspark.sql.functions as F

    from tests.oracle_harness import _driver_canon_probe

    df = spark.range(3).select(
        F.col("id"),
        F.array(F.lit(1), F.col("id")).alias("arr"),
        F.create_map(F.lit("k"), F.col("id")).alias("m"),
        F.struct(F.array(F.col("id")).alias("inner")).alias("nested"),
    )
    bad = dict(q.driver_unsafe_columns(df))
    # 'nested' is a STRUCT whose cell still holds a list — pandas hashes
    # the whole Row cell, so it crashes the driver exactly like 'arr'
    assert set(bad) == {"arr", "m", "nested"}

    rows = [tuple(r) for r in df.collect()]
    err = _driver_canon_probe(df.columns, rows)
    assert err is not None and "unhashable" in err

    ok = df.select("id", F.concat_ws(" ", "arr").alias("arr"))
    assert q.driver_unsafe_columns(ok) == []
    assert (
        _driver_canon_probe(ok.columns, [tuple(r) for r in ok.collect()])
        is None
    )
