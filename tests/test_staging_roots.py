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


def test_staging_root_token_isolates_and_sweep_still_matches(spark):
    """ADVICE r10: a token appended to the root name must isolate two
    callers sharing one applicationId, while keeping the root inside the
    same-tag sweep glob (dead tokened roots still age out)."""
    import fnmatch

    from overturemaps_duckdb_spark.operators._util import staging_root

    plain = staging_root(spark, SF_SMOKE, "t_tok")
    ta = staging_root(spark, SF_SMOKE, "t_tok", token="aaaa1111")
    tb = staging_root(spark, SF_SMOKE, "t_tok", token="bbbb2222")
    try:
        assert len({plain, ta, tb}) == 3
        for r in (plain, ta, tb):
            assert fnmatch.fnmatch(os.path.basename(r), "omds_t_tok_*")
        # tokened creation must not wipe the sibling token's live files
        with open(os.path.join(ta, "live.txt"), "w") as f:
            f.write("x")
        staging_root(spark, SF_SMOKE, "t_tok", token="bbbb2222")
        assert os.path.exists(os.path.join(ta, "live.txt"))
    finally:
        import shutil

        for r in (plain, ta, tb):
            shutil.rmtree(r, ignore_errors=True)


def test_stale_sweep_spares_root_with_fresh_subdir_write(spark):
    """ADVICE r10: a long-lived invocation writes only inside subdirs
    (<root>/_session/, <root>/sink/), never touching the root's own
    mtime.  The sweep gate must consult child/grandchild mtimes before
    rmtree'ing a root whose top-level mtime has aged past the gate."""
    import time as _time

    from overturemaps_duckdb_spark.operators._util import (
        STAGING_STALE_SECONDS,
        staging_root,
    )

    tmp = tempfile.gettempdir()
    old = _time.time() - STAGING_STALE_SECONDS - 60
    # stale root + stale child, but a FRESH grandchild write (live stream)
    live = os.path.join(tmp, "omds_t_live_deadapp1_sfX-00000000")
    os.makedirs(os.path.join(live, "sink", "batch"), exist_ok=True)
    with open(os.path.join(live, "sink", "batch", "part-0"), "w") as f:
        f.write("x")
    os.utime(live, (old, old))
    os.utime(os.path.join(live, "sink"), (old, old))
    # fully stale sibling: every level past the gate
    dead = os.path.join(tmp, "omds_t_live_deadapp2_sfX-00000000")
    os.makedirs(os.path.join(dead, "sink"), exist_ok=True)
    os.utime(os.path.join(dead, "sink"), (old, old))
    os.utime(dead, (old, old))
    try:
        root = staging_root(spark, SF_SMOKE, "t_live")
        assert os.path.exists(live), "root with fresh subdir write was swept"
        assert not os.path.exists(dead), "fully-stale sibling must be swept"
        assert os.path.exists(root)
    finally:
        import shutil

        for d in (live, dead, root):
            shutil.rmtree(d, ignore_errors=True)


def test_session_flush_heartbeats_staging_root(spark, tmp_path):
    """SessionState._flush must refresh the backing root's own mtime so
    the staging sweep's cheap root-stat path sees a live console."""
    import time as _time

    from overturemaps_duckdb_spark.state import SessionState

    root = str(tmp_path / "console_root")
    os.makedirs(root)
    ss = SessionState(spark, root)
    old = _time.time() - 10_000
    os.utime(root, (old, old))
    ss.set("k", {"v": 1})
    assert os.stat(root).st_mtime > old + 5_000


def test_new_session_console_stores_are_isolated(spark):
    """ADVICE r10 (medium): spark.newSession() shares the applicationId,
    so the console fallback store must key on the SESSION, not the app —
    the second session's first console SQL used to wipe the first
    session's live _session parquet, then both aliased one path."""
    from overturemaps_duckdb_spark.compat import _default_session_state

    s2 = spark.newSession()
    try:
        ss1 = _default_session_state(spark)
        ss1.set("who", "session-one")
        ss2 = _default_session_state(s2)
        assert ss2.path != ss1.path, "sibling sessions alias one _session store"
        ss2.set("who", "session-two")
        # first session's store survives the second's creation + flush
        assert ss1.get("who") == "session-one"
        from overturemaps_duckdb_spark.state import SessionState

        rehydrated = SessionState(spark, os.path.dirname(ss1.path))
        assert rehydrated.get("who") == "session-one"
    finally:
        # drop memoized state so other tests see a fresh console store
        for s in (spark, s2):
            for attr in ("_omds_default_session_state", "_omds_console_token"):
                if hasattr(s, attr):
                    delattr(s, attr)
