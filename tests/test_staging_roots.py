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


def test_staging_root_distinct_fixtures_same_basename(spark, tmp_path):
    """ADVICE r09: two fixture dirs sharing a leaf name (/a/sf0.01 vs
    /b/sf0.01) must not collide on one root — wipe=True would destroy the
    other fixture's staged files mid-session."""
    from overturemaps_duckdb_spark.operators._util import staging_root

    a_dir = tmp_path / "a" / "sf0.01"
    b_dir = tmp_path / "b" / "sf0.01"
    a_dir.mkdir(parents=True)
    b_dir.mkdir(parents=True)
    ra = staging_root(spark, str(a_dir), "t_coll")
    with open(os.path.join(ra, "staged.txt"), "w") as f:
        f.write("x")
    rb = staging_root(spark, str(b_dir), "t_coll")
    assert ra != rb
    assert os.path.exists(os.path.join(ra, "staged.txt"))  # a's files survive b


def test_staging_root_sweeps_stale_dead_app_siblings(spark):
    """ADVICE r09: reuse is per-application, so every fresh process used
    to leave one omds_* dir behind forever.  Creation now sweeps same-tag
    siblings whose mtime predates STAGING_STALE_SECONDS; a fresh sibling
    (possibly a live concurrent session) is left alone."""
    from overturemaps_duckdb_spark.operators._util import (
        STAGING_STALE_SECONDS,
        staging_root,
    )

    tmp = tempfile.gettempdir()
    stale = os.path.join(tmp, "omds_t_sweep_deadapp1_sfX-00000000")
    fresh = os.path.join(tmp, "omds_t_sweep_deadapp2_sfX-00000000")
    for d in (stale, fresh):
        os.makedirs(d, exist_ok=True)
    old = __import__("time").time() - STAGING_STALE_SECONDS - 60
    os.utime(stale, (old, old))
    try:
        root = staging_root(spark, SF_SMOKE, "t_sweep")
        assert not os.path.exists(stale), "stale dead-app sibling not swept"
        assert os.path.exists(fresh), "fresh sibling must survive the sweep"
        assert os.path.exists(root)
    finally:
        import shutil

        for d in (stale, fresh, os.path.join(tmp, "omds_t_sweep_x")):
            shutil.rmtree(d, ignore_errors=True)


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
