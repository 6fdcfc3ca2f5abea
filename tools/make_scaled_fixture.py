#!/usr/bin/env python
"""Synthesize a larger fixture by key-offset replication of an existing one.

`/root/testdata` tops out at sf0.1; scaling evidence (BENCH_COMPARE.md)
needs at least one ~10× datapoint.  Each fact/dim table is replicated
REPLICAS times with every key column offset by `replica * STRIDE`, so join
cardinalities per key are preserved exactly (each replica is a disjoint
self-consistent TPC-H-ish world); nation/region stay single-copy (constant
dims at every scale factor, like real TPC-H).  documents/embeddings
replicate with offset ids and identical payloads — a corpus with heavy
duplication, which is exactly the workload dedup operators exist for.

Usage: python tools/make_scaled_fixture.py [src_dir] [dst_dir] [replicas]
Defaults: /root/testdata/sf0.1 → ./benchdata/sf1, 10 replicas.
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 100_000_000

#: key columns to offset per table ("" ⇒ copy once, no replication)
KEYS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", "sf1",
    )
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        src_file = os.path.join(src, f"{table}.parquet")
        dst_file = os.path.join(dst, f"{table}.parquet")
        if not keys:
            sel = f"SELECT * FROM read_parquet('{src_file}')"
        else:
            cols = [c[0] for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src_file}')"
            ).fetchall()]
            parts = []
            for r in range(replicas):
                proj = ", ".join(
                    f"{c} + {r * STRIDE} AS {c}" if c in keys else c
                    for c in cols
                )
                parts.append(
                    f"SELECT {proj} FROM read_parquet('{src_file}')"
                )
            sel = " UNION ALL ".join(parts)
        con.execute(f"COPY ({sel}) TO '{dst_file}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst_file}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows -> {dst_file}", flush=True)


if __name__ == "__main__":
    main()
