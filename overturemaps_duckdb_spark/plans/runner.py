"""Reactive pipeline executor — EP2's driver loop
(`/root/reference/src/lib/pipelineRunner.js`).

subscribe → debounce 300 ms → compile → execute → publish, plus the
error-driven re-plan: when FTS scoring fails at runtime, clear the FTS
capability cache and recompile with the ILIKE fallback
(pipelineRunner.js:21-40, 91-104; fts.js:93-96).

This is driver-side orchestration — Catalyst never sees the debounce; it
exists so query storms (slider drags, keystrokes) coalesce into one Spark
job, the same reason the browser app debounces (pipelineRunner.js:37-40).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

from overturemaps_duckdb_spark.plans.pipeline import Catalog, Node, compile_pipeline

#: recompile debounce (pipelineRunner.js:37-40)
DEBOUNCE_S = 0.3


def looks_like_fts_failure(exc: Exception) -> bool:
    """The reference sniffs 'match_bm25' in the error text
    (pipelineRunner.js:93-96).  Compile-time FTS failures arrive as the
    typed FtsScoringError (pipeline.py wraps the scoring branch); the text
    sniff remains for execution-time failures surfacing lazily from inside
    the scoring plan."""
    from overturemaps_duckdb_spark.operators.fts import FtsScoringError

    if isinstance(exc, FtsScoringError):
        return True
    msg = str(exc).lower()
    return any(k in msg for k in ("match_bm25", "fts", "postings", "_score"))


@dataclass
class RunOutcome:
    rows: list
    count: int
    duration_ms: float
    degraded: bool  # True when the FTS → ILIKE retry path ran


@dataclass
class PipelineRunner:
    catalog: Catalog
    debounce_s: float = DEBOUNCE_S
    on_result: Callable[[RunOutcome], None] | None = None
    is_fts_failure: Callable[[Exception], bool] = looks_like_fts_failure

    nodes: list[Node] = field(default_factory=list)
    search: str = ""
    limit: int = 3000
    bbox: tuple | None = None
    #: user-edited SQL replacing the compiled plan when set
    #: (store.js:27, pipelineRunner.js:73) — executed via the EP3 shim
    sql_override: str | None = None
    spark: object = None  # SparkSession, required only for sql_override

    _timer: threading.Timer | None = field(default=None, repr=False)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)
    run_count: int = 0  # observable for tests (compile+execute invocations)

    def update(self, **changes) -> None:
        """State change → debounced re-run (pipelineRunner.js:21-40).
        Rapid successive updates cancel the pending run — one job per storm."""
        for k, v in changes.items():
            if not hasattr(self, k):
                raise AttributeError(f"unknown pipeline state {k!r}")
            setattr(self, k, v)
        with self._lock:
            if self._timer is not None:
                self._timer.cancel()
            self._timer = threading.Timer(self.debounce_s, self.run_now)
            self._timer.daemon = True
            self._timer.start()

    def flush(self, timeout: float = 30.0) -> None:
        """Wait for a pending debounced run (test/shutdown hook)."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._lock:
                t = self._timer
            if t is None or not t.is_alive():
                return
            time.sleep(0.01)

    def _compile(self, use_fts: bool) -> DataFrame | None:
        if self.sql_override:
            # the edited SQL replaces the compiled text entirely
            # (pipelineRunner.js:73); loaded theme tables are temp views
            from overturemaps_duckdb_spark.compat import duck_sql

            spark = self.spark
            if spark is None:
                any_df = next(iter(self.catalog.tables.values()), None)
                if any_df is None:
                    return None
                spark = any_df.sparkSession
            for name, df in self.catalog.tables.items():
                df.createOrReplaceTempView(name)
            return duck_sql(spark, self.sql_override)
        cat = self.catalog
        if not use_fts and cat.fts:
            cat = Catalog(tables=cat.tables, fields=cat.fields, fts={})
        return compile_pipeline(
            cat, self.nodes, search=self.search, limit=self.limit, bbox=self.bbox
        )

    def run_now(self) -> RunOutcome | None:
        """Compile + execute, with the FTS-degrade retry
        (pipelineRunner.js:91-104).

        Unlike DuckDB (string SQL fails only at execution), Spark raises FTS
        problems at DataFrame-construction time too — so compile and execute
        sit inside one try.  A failure only degrades when FTS was actually in
        play (searching + indexes registered) AND the error looks like an FTS
        failure — the reference degrades only when the error text names
        match_bm25 (pipelineRunner.js:93-96); a transient non-FTS failure
        (OOM, missing file) must surface, not silently change ranking."""
        t0 = time.monotonic()
        degraded = False
        self.run_count += 1
        fts_in_play = bool(self.search) and bool(self.catalog.fts)
        try:
            df = self._compile(use_fts=True)
            if df is None:
                return None
            rows = df.collect()
        except Exception as exc:  # noqa: BLE001 — mirror ref catch-all
            if not (fts_in_play and self.is_fts_failure(exc)):
                raise
            # clear FTS capability + recompile with ILIKE (fts.js:93-96)
            self.catalog.fts.clear()
            degraded = True
            self.run_count += 1
            df = self._compile(use_fts=False)
            if df is None:
                return None
            rows = df.collect()
        out = RunOutcome(
            rows, len(rows), (time.monotonic() - t0) * 1e3, degraded
        )
        if self.on_result is not None:
            self.on_result(out)
        return out
