"""Opt-in RocksDB state store (SPARK_GRAFT_STATE_STORE=rocksdb).

The default (HDFS-backed, in-heap) store wins while streaming state fits
the executor heap — measured on the i4 stream-stream interval join at 1M
events: 9.0 s in-heap vs 28.2 s RocksDB locally.  RocksDB becomes the
right provider when state outgrows the heap (100 TB-scale join state),
so the gate must (a) actually install the provider and (b) produce the
same answers.  A fresh subprocess is required: the provider class is a
JVM-session-creation conf and `getOrCreate` would reuse the suite's
session.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from tests.conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys
sys.path.insert(0, %(repo)r)
from overturemaps_duckdb_spark import queries as _q
from overturemaps_duckdb_spark.session import get_spark
_q.load_all()
spark = get_spark("rocksdb-test", cpus=4)
spark.sparkContext.setLogLevel("ERROR")
rows = (
    _q.QUERIES["i1_stream_tumbling_window"](spark, %(sf)r)
    .collect()
)
print(json.dumps({
    "provider": spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"),
    "rows": sorted([r.asDict() for r in rows],
                   key=lambda d: sorted(d.items())),
}, default=str))
"""


def test_rocksdb_gate_installs_provider_and_matches(spark):
    """Identical i1 tumbling-window ROWS under RocksDB as under the default
    provider of the suite session (full-value equivalence, not counts)."""
    from overturemaps_duckdb_spark import queries as _q

    _q.load_all()
    base = [
        {k: str(v) for k, v in r.asDict().items()}
        for r in _q.QUERIES["i1_stream_tumbling_window"](
            spark, SF_SMOKE
        ).collect()
    ]

    env = dict(os.environ, SPARK_GRAFT_STATE_STORE="rocksdb")
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"repo": REPO, "sf": SF_SMOKE}],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
        check=True,
    )
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["provider"].endswith("RocksDBStateStoreProvider")
    key = lambda d: sorted(d.items())  # noqa: E731
    got_rows = sorted(
        ({k: str(v) for k, v in d.items()} for d in got["rows"]), key=key
    )
    assert got_rows == sorted(base, key=key)


def test_unknown_state_store_value_raises():
    """A typo'd provider name must fail at session build, not silently run
    on the in-heap store."""
    child = (
        "import sys; sys.path.insert(0, %r)\n"
        "from overturemaps_duckdb_spark.session import get_spark\n"
        "try:\n"
        "    get_spark('typo-test', cpus=2)\n"
        "except ValueError as e:\n"
        "    print('RAISED', e)\n"
        "else:\n"
        "    print('NO-RAISE')\n" % REPO
    )
    env = dict(os.environ, SPARK_GRAFT_STATE_STORE="rockdb")
    out = subprocess.run(
        [sys.executable, "-c", child],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
        check=True,
    )
    assert "RAISED" in out.stdout
    assert "rockdb" in out.stdout
