"""Custom stateful streaming operator: per-user running totals via
`applyInPandasWithState` (SURVEY §2.9 extension — the escape hatch for
stateful semantics `window`/`session_window` can't express).

State model: one small record per user_id — (events_seen, value_cents,
update_count) — held in the state store, updated per micro-batch, emitted in
update mode.  At 100 TB the state is partitioned by the grouping key across
executors; per-key state stays O(1) bytes, the classic scalable shape.

Determinism: money is accumulated as exact cents (BIGINT), so totals are
bit-equal to the batch/SQL twin regardless of batch slicing — verified by
the i3 oracle query (single batch) and the multi-batch pytest (two batches,
same final state)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("events_seen", LongType()),
        StructField("value_cents", LongType()),
        StructField("update_count", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("events_seen", LongType()),
        StructField("value_cents", LongType()),
        StructField("update_count", LongType()),
    ]
)


def _update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        events_seen, value_cents, update_count = state.get
    else:
        events_seen, value_cents, update_count = 0, 0, 0
    for pdf in pdfs:
        events_seen += len(pdf)
        # exact cents, never float accumulation.  Rounding must match the
        # batch/SQL twins (Spark F.round / DuckDB ROUND = HALF_UP, away
        # from zero) — pandas/numpy .round() is half-to-EVEN, so 12.50
        # cents rounded to 12 while the twins say 13.  The two modes only
        # differ on EXACT .5 fractions (binary-representable), so round
        # half-to-even first and adjust just those — no floor(x+0.5)
        # float trap.  NULL values are skipped like SQL SUM (they used to
        # NaN-poison the sum and crash int()).
        v = pdf["value"].astype(float).mul(100).to_numpy()
        v = v[~np.isnan(v)]
        r = np.round(v)
        t = np.trunc(v)
        half = np.abs(v - t) == 0.5
        r[half] = t[half] + np.sign(v[half])
        value_cents += int(r.sum())
    update_count += 1
    state.update((events_seen, value_cents, update_count))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "events_seen": events_seen,
                "value_cents": value_cents,
                "update_count": update_count,
            }
        ]
    )


def user_running_totals(stream: DataFrame) -> DataFrame:
    """Arbitrary-stateful per-user accumulator (update output mode)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
