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
    _q.QUERIES["i1_stream_tumbling_window"](spark, "/root/testdata/sf0.001")
    .collect()
)
print(json.dumps({
    "provider": spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"),
    "n": len(rows),
    "total": sum(r["n"] for r in rows),
}))
"""


def test_rocksdb_gate_installs_provider_and_matches(spark):
    """Same i1 tumbling-window answer under RocksDB as under the default
    provider of the suite session."""
    from overturemaps_duckdb_spark import queries as _q

    _q.load_all()
    base = _q.QUERIES["i1_stream_tumbling_window"](
        spark, "/root/testdata/sf0.001"
    ).collect()

    env = dict(os.environ, SPARK_GRAFT_STATE_STORE="rocksdb")
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"repo": REPO}],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
        check=True,
    )
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["provider"].endswith("RocksDBStateStoreProvider")
    assert got["n"] == len(base)
    assert got["total"] == sum(r["n"] for r in base)
