"""Simulate the round driver: vanilla SparkSession + __spark_entry__ contract.

Deliberately does NOT use the repo's session helper or test fixtures —
the driver builds its own session with its own confs.

Config-fuzz overrides (defaults reproduce the driver exactly):
- SPARK_GRAFT_SIM_MASTER / SPARK_GRAFT_SIM_SHUFFLE: session shape —
  e.g. local[3] + 7 shuffle partitions surfaces any result that
  silently depends on partition/core counts (nondeterministic top-k
  tie-breaks, per-partition ids leaking into values).
- SPARK_GRAFT_SIM_CONF: comma-separated extra k=v confs — e.g.
  spark.sql.adaptive.enabled=false or
  spark.sql.codegen.wholeStage=false to pin parity on the interpreted
  expression-eval path.  Every query must value-hash MATCH the oracle
  under ANY legal config; a config-dependent result is a real bug.
"""
import os as _os
import sys, time, random

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

_builder = (
    SparkSession.builder.master(
        _os.environ.get("SPARK_GRAFT_SIM_MASTER", "local[8]")
    )
    .appName("driver-sim")
    .config(
        "spark.sql.shuffle.partitions",
        _os.environ.get("SPARK_GRAFT_SIM_SHUFFLE", "32"),
    )
)
for _kv in _os.environ.get("SPARK_GRAFT_SIM_CONF", "").split(","):
    if _kv.strip():
        _k, _v = _kv.split("=", 1)
        _builder = _builder.config(_k.strip(), _v.strip())
spark = _builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

# 1. smoke: entry() at sf0.001
t0 = time.time()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}, {time.time()-t0:.1f}s")
assert len(rows) >= 0

qs = E.queries()
os_ = E.oracle_sql()
print(f"queries()={len(qs)} oracle_sql()={len(os_)} no-oracle={sorted(set(qs)-set(os_))}")

# 2. run a random sample of 8 queries vs DuckDB oracle at sf0.01, like the driver
import duckdb, math, os

# SPARK_GRAFT_SIM_SF overrides the parity fixture — e.g. sf0.001 for the
# tiny-input edge sweep (empty results, absent groups), sf0.1 for a slow
# full-value pass.  The driver itself always runs sf0.01.
SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
con = duckdb.connect()
for name in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')")

def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    from decimal import Decimal
    if isinstance(v, Decimal):
        return round(float(v), 9)
    return v

if len(sys.argv) > 1:  # explicit names (or a count via -n N [names…])
    if sys.argv[1] == "-n":
        random.seed(7)
        sample = random.sample(sorted(os_), int(sys.argv[2]))
        # extra names after the count run IN ADDITION to the sample — the
        # way to include the rows-only queries (a7, n3) in a full sweep.
        # Validate upfront: a typo'd extra must fail NOW, not as a
        # KeyError after the full ~9-min sweep.
        unknown = [n for n in sys.argv[3:] if n not in qs]
        if unknown:
            raise SystemExit(f"unknown query names: {unknown}")
        sample += [n for n in sys.argv[3:] if n not in sample]
    else:
        sample = sys.argv[1:]
else:
    random.seed(7)
    sample = random.sample(sorted(os_), 8)
fails = []
for name in sample:
    sdf = qs[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in os_:
        # the driver's weaker rows-only check for no-oracle queries
        print(f"  {name}: spark={len(srows)} rows-only (no oracle) OK")
        continue
    cur = con.execute(os_[name])
    dcols = [c[0] for c in cur.description]
    drows = cur.fetchall()
    if sorted(scols) != sorted(dcols):
        fails.append((name, "cols", scols, dcols)); continue
    # driver-canon probe (r11 emb1/bpe2 lesson): the REAL driver loads the
    # result into pandas and sort_values over all columns — unhashable
    # list/map cells crash it even when values match.  The old tuple-
    # normalizing canon below hid exactly that, so probe pandas FIRST.
    import pandas as pd
    canon_err = None
    for _cols, _rows in ((scols, srows), (dcols, [tuple(r) for r in drows])):
        try:
            pd.DataFrame(_rows, columns=_cols)[sorted(_cols)].sort_values(
                by=sorted(_cols)
            )
        except TypeError as exc:
            canon_err = f"{exc}"
            break
    if canon_err:
        print(f"  {name}: DRIVER-CANON CRASH ({canon_err})")
        fails.append((name, "driver-canon", canon_err)); continue
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sn = sorted([tuple(str(norm(r[i])) for i in order_s) for r in srows])
    dn = sorted([tuple(str(norm(r[i])) for i in order_d) for r in drows])
    ok = sn == dn
    print(f"  {name}: spark={len(srows)} duck={len(drows)} {'MATCH' if ok else 'MISMATCH'}")
    if not ok:
        fails.append((name, "values"))

print("FAILS:", fails if fails else "none")
spark.stop()
sys.exit(1 if fails else 0)
