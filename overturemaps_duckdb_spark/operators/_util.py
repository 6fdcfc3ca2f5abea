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


def release_materialized(df: DataFrame | None) -> None:
    """Free the executor-storage blocks pinned by a :func:`materialize`d
    frame once it is SUPERSEDED (ADVICE r12 / NOTES r12 watch item).

    A ``localCheckpoint`` persists its rows in the BlockManager and those
    blocks are only reclaimed by driver GC of the RDD — an iterative
    closure that checkpoints every round therefore accumulates one dead
    frame of storage per round for the whole job.  This hands the loop an
    explicit release: unpersist the LogicalRDD behind the checkpointed
    frame (non-blocking).  MUST only be called on frames with no further
    consumers — a released localCheckpoint cannot recompute (its lineage
    is truncated by design).  No-op for reliable ``checkpoint()`` frames
    (files, owned by the checkpoint-dir lifecycle) and for plans that are
    not checkpointed RDD scans.
    """
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            rdd = plan.rdd()
            # Explicit no-op guard (ADVICE r13): a reliable checkpoint()
            # Dataset ALSO analyzes to LogicalRDD; its RDD merely happens
            # to hold no persisted blocks today.  Checking the storage
            # level (NONE → isValid() false) makes the reliable-checkpoint
            # no-op a stated contract instead of an implementation detail.
            if rdd.getStorageLevel().isValid():
                rdd.unpersist(False)
    except Exception:  # noqa: BLE001 — release is best-effort hygiene
        pass


#: per-(application, slot) LRU registries backing :func:`lru_persist` —
#: bounded by LRU_PERSIST_MAX_ENTRIES per slot and LRU_PERSIST_MAX_APPS
#: total, so a long-lived process cycling sessions cannot grow this dict.
_LRU_REGISTRY: dict = {}
LRU_PERSIST_MAX_ENTRIES = 8
LRU_PERSIST_MAX_APPS = 4


def lru_persist(df: DataFrame, slot: str, *, max_entries: int = LRU_PERSIST_MAX_ENTRIES) -> DataFrame:
    """``persist()`` with a bounded per-(session, slot) registry: the
    oldest cached plan is unpersisted once more than ``max_entries``
    DISTINCT plans have been persisted under the slot (VERDICT r13 #5 /
    ADVICE r13: the pl4 matched-id sets and the e6/e7 activity frame were
    session-lived with no release path, so a long-lived engine session
    running many distinct pipelines/fixtures accumulated dead cache
    entries forever — the leak class ``release_materialized`` closed for
    the dedup closure).

    Spark's CacheManager dedupes cache entries by analyzed plan, so
    repeated calls with the SAME plan stay one entry (tracked here by
    ``semanticHash``: re-persisting refreshes its LRU position instead of
    growing the registry).  Eviction only ever ``unpersist``s — a plan
    evicted while still referenced recomputes correctly on its next
    action; values can never change.  Registries of stopped applications
    are dropped (their handles are inert) once more than
    ``LRU_PERSIST_MAX_APPS`` applications have been seen."""
    from collections import OrderedDict

    df = df.persist()
    try:
        app = df.sparkSession.sparkContext.applicationId
        key = (app, slot)
        if key not in _LRU_REGISTRY and len(_LRU_REGISTRY) >= LRU_PERSIST_MAX_APPS * 4:
            # drop registries from other applications, oldest first; their
            # sessions are usually stopped (handles inert), and a live
            # sibling app merely loses eviction tracking, never values
            for stale in list(_LRU_REGISTRY):
                if stale[0] != app:
                    _LRU_REGISTRY.pop(stale, None)
        reg = _LRU_REGISTRY.setdefault(key, OrderedDict())
        h = df.semanticHash()
        if h in reg:
            reg.move_to_end(h)
        else:
            reg[h] = df
            while len(reg) > max_entries:
                _, old = reg.popitem(last=False)
                try:
                    old.unpersist(False)
                except Exception:  # noqa: BLE001 — best-effort hygiene
                    pass
    except Exception:  # noqa: BLE001 — tracking is hygiene, never fatal
        pass
    return df


#: Age gate for sweeping another application's omds_* staging dirs: old
#: enough that any live session re-invoking its staging queries has long
#: since refreshed its root's mtime (wipe+recreate per call), short enough
#: that a day of repeated bench/pytest processes stays bounded in /tmp.
STAGING_STALE_SECONDS = 2 * 3600


def staging_root(
    spark, sf_dir: str | None, tag: str, *, wipe: bool = True, token: str | None = None
) -> str:
    """ONE deterministic staging directory per (application, fixture, tag),
    recreated empty on each call.

    ``token`` (optional) appends a caller-supplied discriminator to the
    root name WITHOUT changing the sweep tag: two SparkSessions from
    ``spark.newSession()`` share one applicationId, so a purely
    app-keyed path would alias their roots and ``wipe`` would destroy
    the sibling session's live files (ADVICE r10) — the console session
    store passes a per-SparkSession token for exactly this.  Because the
    token is not part of the glob tag, dead tokened roots are still
    swept by the same age-gated pass as everything else.

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

    Reuse is per-APPLICATION (the path embeds the Spark applicationId),
    so each fresh bench/pytest/parity PROCESS still mints one new root
    per (fixture, tag); creation therefore sweeps stale same-tag sibling
    dirs from dead applications (ADVICE r09).  The sweep is age-gated by
    :data:`STAGING_STALE_SECONDS` so a concurrently-running session's
    live staging is never yanked out from under it — every invocation
    recreates its root (fresh mtime), so only applications that hold a
    staged dir past the gate WITHOUT re-invoking are at risk, which the
    collect-before-reinvoking caveat above already rules out.

    The fixture component is ``basename-sha1(realpath)[:8]`` — basename
    alone made two different fixture dirs with the same leaf name
    (``/a/sf0.01`` vs ``/b/sf0.01``) collide on one root, and ``wipe``
    would destroy the other fixture's staged files mid-session
    (ADVICE r09).

    The stale gate consults the NEWEST mtime within two directory levels
    of a candidate, not just the root's own mtime: a single invocation
    that stays live past the gate (a long console session flushing into
    ``<root>/_session/``, a long-running stream appending under
    ``<root>/sink``/``ckpt``) never touches the root itself, but its
    writes DO refresh the containing subdirectory — ``os.replace`` and
    new part/offset files update their parent dir's mtime (ADVICE r10).
    The deeper scan only runs once the root's own mtime is already past
    the gate, so the common fresh-root case stays one ``stat``.
    """
    import glob
    import hashlib
    import os
    import shutil
    import tempfile
    import time

    real = os.path.realpath(sf_dir).rstrip("/") if sf_dir else "nosf"
    base = os.path.basename(real) if sf_dir else "nosf"
    fp = hashlib.sha1(real.encode()).hexdigest()[:8]
    tmp = tempfile.gettempdir()
    suffix = f"-{token}" if token else ""
    root = os.path.join(
        tmp,
        f"omds_{tag}_{spark.sparkContext.applicationId}_{base}-{fp}{suffix}",
    )
    now = time.time()

    def _is_stale(path: str) -> bool:
        try:
            if now - os.stat(path).st_mtime <= STAGING_STALE_SECONDS:
                return False
            # root looks stale — check two levels down for live writes
            # (e.g. _session/ kv flushes, sink/ part files, ckpt/offsets/)
            with os.scandir(path) as level1:
                for child in level1:
                    if now - child.stat().st_mtime <= STAGING_STALE_SECONDS:
                        return False
                    if child.is_dir(follow_symlinks=False):
                        with os.scandir(child.path) as level2:
                            for gc in level2:
                                if (
                                    now - gc.stat().st_mtime
                                    <= STAGING_STALE_SECONDS
                                ):
                                    return False
        except OSError:
            return False  # raced with another sweeper / already gone
        return True

    for sib in glob.glob(os.path.join(tmp, f"omds_{tag}_*")):
        if sib == root:
            continue
        if _is_stale(sib):
            shutil.rmtree(sib, ignore_errors=True)
    if wipe:
        shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    return root
