"""Shared operator plumbing.

``materialize`` pins a DataFrame's contents so downstream consumers can
never observe a recompute — required wherever an upstream result is
merge-order-sensitive (``percentile_approx`` boundaries, quantiles.py),
must be frozen before a conflicting write (incremental MinHash index,
dedup.py), or anchors an iterative lineage cut (cluster propagation,
dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Checkpoint ``df``: reliable ``checkpoint()`` when the session has
    a checkpoint directory configured (``sc.setCheckpointDir``), else
    ``localCheckpoint()``.

    On a multi-executor cluster a lost executor silently drops
    ``localCheckpoint`` blocks and fails every downstream job, so
    long-lived cluster sessions should configure a checkpoint dir and get
    the reliable form automatically; in single-JVM dev/test sessions the
    local form is both safe (no executor loss) and faster (no
    filesystem round-trip).  With ``eager=False`` the checkpoint
    materializes on the frame's first action — use when a probe/collect
    immediately follows, so the scan, checkpoint write, and probe share
    one job.
    """
    if df.sparkSession.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def staging_root(spark, sf_dir: str | None, tag: str, *, wipe: bool = True) -> str:
    """ONE deterministic staging directory per (application, fixture, tag),
    recreated empty on each call.

    Queries that stage files (banded exports, bucketed copies, snapview
    stores, streaming symlink manifests) used a fresh ``mkdtemp`` per
    invocation, so every bench/parity run accumulated another copy in
    /tmp forever — the resource-lifecycle defect class the r8 review fixed
    for i5/i6/ex1 (queries/events.py) — while the deterministic form is
    also what a cluster deployment wants (a re-run overwrites its own
    scratch, never a growing orphan set).

    ``wipe=True`` (default) removes the previous contents first: callers
    re-stage from scratch and must not inherit stale files (a reused
    symlink name raises EEXIST; a hydrating store would resurrect old
    keys).  CAVEAT shared with the i6/ex1 precedent: a DataFrame captured
    from a PREVIOUS invocation lazily references the old files — collect
    results before re-invoking the same query in one session.
    """
    import os
    import shutil
    import tempfile

    base = (
        os.path.basename(os.path.realpath(sf_dir).rstrip("/")) if sf_dir else "nosf"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"omds_{tag}_{spark.sparkContext.applicationId}_{base}",
    )
    if wipe:
        shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    return root
