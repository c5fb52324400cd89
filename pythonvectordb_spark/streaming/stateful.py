"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10 extension; the escape hatch when built-in windows can't
express the state machine).

``user_activity_tracker`` keeps per-user running state across
microbatches — event count, value sum (integer cents), last-seen
timestamp — and emits the updated row for every user seen in a batch.
The same shape implements fraud counters, rate limiters, cumulative
feature stores. State lives in the state store (RocksDB at scale),
keyed by user, with an idle-timeout eviction hook.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
        StructField("last_epoch", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
        StructField("last_epoch", LongType()),
    ]
)


def _track(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, cents, last = state.get if state.exists else (0, 0, 0)  # .get is a property
    for pdf in pdfs:
        n += len(pdf)
        cents += int(round(float(pdf["value"].sum()) * 100))
        last = max(last, int(pdf["ts"].max().timestamp()))
    state.update((n, cents, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_cents": [cents],
            "last_epoch": [last],
        }
    )


def user_activity_tracker(event_stream: DataFrame) -> DataFrame:
    """Per-user running activity state over an event stream.

    Emits one updated row per user per microbatch; downstream sinks see a
    changelog of the per-user state (update output mode).
    """
    return (
        event_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
