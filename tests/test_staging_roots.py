"""r9 review fix: staging queries must not leak a fresh /tmp dir per
invocation (the i5/i6/ex1 resource-lifecycle class, extended to the
remaining mkdtemp-per-call sites: s3/s13/s7/y1/ep1/s14/s4/ep3-ctas and
the i2 stream stage).

Each staging query now derives ONE deterministic root per (application,
fixture, tag) via operators/_util.staging_root and recreates it empty on
every call — so a second invocation in the same session must (a) reuse
the same path rather than minting a new one, and (b) produce identical
results (wipe + re-stage is idempotent)."""

from __future__ import annotations

import glob
import os
import tempfile

from tests.conftest import SF_SMOKE


def _tmp_count(pattern: str) -> int:
    return len(glob.glob(os.path.join(tempfile.gettempdir(), pattern)))


def test_staging_root_is_deterministic_and_wiped(spark):
    from overturemaps_duckdb_spark.operators._util import staging_root

    a = staging_root(spark, SF_SMOKE, "t_stage")
    with open(os.path.join(a, "stale.txt"), "w") as f:
        f.write("x")
    b = staging_root(spark, SF_SMOKE, "t_stage")
    assert a == b  # same (app, fixture, tag) → same path
    assert not os.listdir(b)  # previous contents wiped
    # distinct fixture dirs and tags get distinct roots
    assert staging_root(spark, SF_SMOKE, "t_other") != a


def test_double_invocation_reuses_root_and_result(spark):
    from overturemaps_duckdb_spark import queries as q

    q.load_all()
    for name, pattern in [
        ("s3_manifest_pruned_scan", "omds_s3_*"),
        ("s7_s8_snapview_roundtrip", "omds_s7_*"),
        ("y1_session_kv", "omds_y1_*"),
        ("ep3_ctas_copy_roundtrip", "omds_ep3_*"),
    ]:
        first = sorted(tuple(r) for r in q.QUERIES[name](spark, SF_SMOKE).collect())
        n_dirs = _tmp_count(pattern)
        second = sorted(tuple(r) for r in q.QUERIES[name](spark, SF_SMOKE).collect())
        assert second == first, name
        assert _tmp_count(pattern) == n_dirs, f"{name} leaked a staging dir"
