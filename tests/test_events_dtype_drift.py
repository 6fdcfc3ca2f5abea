"""Fixture-drift regression: the event-time surface must survive ANY of the
`ts` physical types the fixture has shipped (or could ship).

r02 lost 7 driver rows, 7 tests and the whole benchmark because
`events.parquet` regenerated from TIMESTAMP(NANOS) to TIMESTAMP[us] hours
before verify.  This test pins the probe-then-adapt fix: the same queries
run against the SAME data written as timestamp[us] (→ TIMESTAMP_NTZ),
timestamp[ns] (→ epoch-nano LONG under the legacy flag), and timestamp[us,
UTC] (→ TIMESTAMP), and must produce identical epoch-µs results.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

#: physical variants: (name, arrow type for ts)
VARIANTS = [
    ("us_ntz", pa.timestamp("us")),
    ("ns", pa.timestamp("ns")),
    ("us_utc", pa.timestamp("us", tz="UTC")),
]


@pytest.fixture(scope="module")
def drift_dirs(tmp_path_factory):
    """The sf0.001 events table re-written in each ts physical type, each in
    its own directory shaped like an sf_dir."""
    src = pq.read_table(f"{SF_SMOKE}/events.parquet")
    idx = src.schema.get_field_index("ts")
    dirs = {}
    for name, typ in VARIANTS:
        d = tmp_path_factory.mktemp(f"evt_{name}")
        tbl = src.set_column(idx, "ts", src["ts"].cast(typ))
        pq.write_table(
            tbl, os.path.join(str(d), "events.parquet"), store_schema=False
        )
        dirs[name] = str(d)
    return dirs


def _loaded_type(spark, sf_dir):
    from overturemaps_duckdb_spark.queries import t

    return t(spark, sf_dir, "events").schema["ts"].dataType.simpleString()


def test_variants_load_as_different_physical_types(spark, drift_dirs):
    got = {name: _loaded_type(spark, d) for name, d in drift_dirs.items()}
    assert got["us_ntz"] == "timestamp_ntz"
    assert got["ns"] == "bigint"  # nanosAsLong legacy flag
    assert got["us_utc"] == "timestamp"


@pytest.mark.parametrize(
    "qname",
    ["e1_tumbling_window", "e2_sessionize", "e3_lag_delta", "aj1_asof_join"],
)
def test_batch_event_queries_type_invariant(spark, drift_dirs, qname):
    from overturemaps_duckdb_spark import queries as q

    q.load_all()
    results = {}
    for name, d in drift_dirs.items():
        rows = q.QUERIES[qname](spark, d).collect()
        results[name] = sorted(tuple(r) for r in rows)
    base = results["us_ntz"]
    assert len(base) > 0
    for name, rows in results.items():
        assert rows == base, f"{qname} drifted on {name}"


def test_streaming_event_time_type_invariant(spark, drift_dirs):
    from overturemaps_duckdb_spark.streaming.windows import (
        events_stream,
        run_to_batch,
        tumbling_counts,
    )

    results = {}
    for name, d in drift_dirs.items():
        out = run_to_batch(
            tumbling_counts(events_stream(spark, d)),
            f"drift_{name}",
            output_mode="complete",
        )
        results[name] = sorted(tuple(r) for r in out.collect())
    base = results["us_ntz"]
    assert len(base) > 0
    for name, rows in results.items():
        assert rows == base, f"streaming tumbling drifted on {name}"


def test_session_window_flush_type_invariant(spark, drift_dirs):
    from overturemaps_duckdb_spark.streaming.windows import (
        session_counts_to_batch,
    )

    results = {}
    for name, d in drift_dirs.items():
        out = session_counts_to_batch(spark, d)
        results[name] = sorted(tuple(r) for r in out.collect())
    base = results["us_ntz"]
    assert len(base) > 0
    for name, rows in results.items():
        assert rows == base, f"session flush drifted on {name}"


def test_streaming_event_time_tz_independent_and_no_leak(spark):
    """r8 review fix: events_stream pinned spark.sql.session.timeZone=UTC
    on the caller's session FOREVER (with_event_time's NTZ branch needed
    it).  Event time is now pure timestamp arithmetic — a hostile session
    TZ neither shifts i1's windows nor gets silently overwritten."""
    import pyspark.sql.functions as F

    from overturemaps_duckdb_spark import queries as _q
    from tests.conftest import SF_SMOKE

    _q.load_all()
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        out = {
            tuple(r)
            for r in _q.QUERIES["i1_stream_tumbling_window"](
                spark, SF_SMOKE
            ).collect()
        }
        # the streaming helpers must not have clobbered the session TZ
        assert spark.conf.get("spark.sql.session.timeZone") == "Pacific/Kiritimati"
        ref = {
            tuple(r)
            for r in _q.QUERIES["e1_tumbling_window"](spark, SF_SMOKE).collect()
        }
        assert out == ref  # stream/batch equivalence under the hostile TZ
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
