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
