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
       [tables]
Defaults: /root/testdata/sf0.1 → ./benchdata/sf1, 10 replicas, all tables.
`tables` is a comma-separated subset (e.g. ``embeddings`` for the
ANN-slope fixtures, ``events,embeddings`` to upgrade sf5's symlinked
pair to real 50× replicas).  Replica counts above 32 replicate via a
``CROSS JOIN range(replicas)`` instead of an unrolled UNION ALL —
identical rows, bounded SQL size.
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
    only = (
        {t.strip() for t in sys.argv[4].split(",") if t.strip()}
        if len(sys.argv) > 4
        else None
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        if only is not None and table not in only:
            continue
        src_file = os.path.join(src, f"{table}.parquet")
        dst_file = os.path.join(dst, f"{table}.parquet")
        if os.path.islink(dst_file):
            # COPY TO follows symlinks — writing through one would corrupt
            # the TARGET fixture (sf5's events/embeddings pointed at sf1)
            os.unlink(dst_file)
        if not keys:
            sel = f"SELECT * FROM read_parquet('{src_file}')"
        else:
            cols = [c[0] for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src_file}')"
            ).fetchall()]
            if replicas > 32:
                # bounded-SQL form: one scan crossed with a replica index
                proj = ", ".join(
                    f"{c} + _r.i * {STRIDE} AS {c}" if c in keys else c
                    for c in cols
                )
                sel = (
                    f"SELECT {proj} FROM read_parquet('{src_file}') "
                    f"CROSS JOIN range({replicas}) _r(i)"
                )
            else:
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
        # ROW_GROUP_SIZE: duckdb's default wrote documents/embeddings as
        # ONE row group — a parquet file cannot be split mid-row-group, so
        # every Spark scan of those tables at sf1 ran as a SINGLE task
        # (measured: the whole scan+explode map stage serialized; lineitem
        # with 49 groups parallelized fine).  ~8k rows per group keeps
        # even the 50k-row tables at ≥6 splits.
        con.execute(
            f"COPY ({sel}) TO '{dst_file}' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 8192)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst_file}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows -> {dst_file}", flush=True)


if __name__ == "__main__":
    main()
