"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9: the escape hatch when built-in windowed aggs can't
express the state machine).

Implemented operator: per-user running counters (events seen, value
sum, last-seen timestamp) that persist across micro-batches and emit an
updated row per user per batch. State is one small dict per user —
bounded by the key cardinality, the operator the engine reaches for
when sessionization/window semantics aren't enough (e.g. lifetime
aggregates, fraud counters).

Timeouts: ``GroupStateTimeout.NoTimeout`` keeps state forever (lifetime
counters); swap for EventTimeTimeout + ``state.setTimeoutTimestamp`` to
age out idle keys against the watermark at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = "n BIGINT, s DOUBLE, last_us BIGINT"


def _update_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            last_us = max(last_us, int(batch_max.value // 1000))
    state.update((n, s, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [round(s, 2)],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def running_user_counters(events: DataFrame) -> DataFrame:
    """Attach the stateful per-user counter operator to an events
    stream (or batch frame for testing the kernel semantics)."""
    grouped = events.select("user_id", "ts", "value").groupBy("user_id")
    return grouped.applyInPandasWithState(
        _update_user,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
