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
        # exact cents, never float accumulation
        value_cents += int(round(pdf["value"].astype(float).mul(100).round().sum()))
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
