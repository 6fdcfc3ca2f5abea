"""Stat-gated join hints.

TPC-H "dimension" tables split into two classes:

- nation/region are constant-size (25/5 rows at every scale factor) —
  forcing ``F.broadcast`` on them is always right;
- customer/supplier/part grow linearly with scale factor (150k/10k/200k ×
  SF).  At sf0.1 they broadcast comfortably, but a *forced* hint overrides
  ``spark.sql.autoBroadcastJoinThreshold`` and AQE, so at the 100 TB target
  the same plan OOMs instead of degrading to a shuffle join.

:func:`dim` is the scale-safe middle: apply the broadcast hint only while
Catalyst's own size estimate for the optimized plan fits the session's
broadcast threshold — the identical statistic/threshold pair the planner
uses — and otherwise return the frame unhinted so AQE picks the join
strategy from runtime stats.  Mirrors the auto-routing already proven in
``operators.spatial_join.spatial_join`` (broadcast ↔ grid equi-join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from overturemaps_duckdb_spark.operators.spatial_join import (
    _parse_size_bytes,
    _plan_size_bytes,
)


def dim(df: DataFrame) -> DataFrame:
    """Broadcast hint for an SF-proportional dimension frame, gated on the
    Catalyst plan-size estimate vs ``spark.sql.autoBroadcastJoinThreshold``.

    Below the threshold the plan is identical to a forced broadcast (one
    exchange-free hash join per dim); above it (or with the threshold set to
    -1) the frame joins unhinted and AQE chooses shuffle-hash/sort-merge —
    the plan degrades instead of OOMing at a 1000-executor scale-up.
    """
    thr = _parse_size_bytes(
        df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    )
    if thr > 0 and _plan_size_bytes(df) <= thr:
        return F.broadcast(df)
    return df
