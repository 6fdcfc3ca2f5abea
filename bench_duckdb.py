#!/usr/bin/env python
"""Head-to-head vs the reference's physical engine: run each headline
query's DuckDB-oracle SQL on DuckDB over the same sf parquet, next to the
Spark numbers from bench.py.

DuckDB executes the hand-written oracle SQL (its best case — no Spark
overheads, no JVM); Spark executes the engine's DataFrame plans.  This is
the honest single-node throughput comparison behind BASELINE.json's
"matches-or-beats" goal.  Prints one JSON line:
    {"metric": "duckdb_oracle_total", "value": N, "unit": "sec",
     "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from overturemaps_duckdb_spark import queries as _q  # noqa: E402

_q.load_all()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    con = duckdb.connect()
    for name in _q.TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    times: dict[str, float] = {}
    for name in HEADLINE:
        oracle = _q.ORACLES.get(name)
        if oracle is None:
            continue
        t0 = time.monotonic()
        con.execute(oracle).fetchall()
        times[name] = round(time.monotonic() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
