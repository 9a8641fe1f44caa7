"""Custom stateful streaming operator: incremental sessionization via
``applyInPandasWithState`` (the Structured Streaming extension surface
for operators the built-in windowed aggs can't express — SURVEY §2.K).

State per user: (last event time, session count). Each micro-batch folds
its events into the state and emits the updated per-user session count —
exactly-once per state update in update mode. The batch twin is
queries.relational.events_sessionize (lag + flag-sum), which this must
agree with when a stream is drained in one batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_us long, n_sessions long"
OUTPUT_SCHEMA = "user_id bigint, n_sessions bigint"
GAP_US = 1_800_000_000  # 30 min


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_us, n_sessions = state.get if state.exists else (None, 0)
    ts = (
        pd.concat(list(pdfs))["ts_us"].sort_values().tolist()
    )
    for t in ts:
        if last_us is None or t - last_us > GAP_US:
            n_sessions += 1
        last_us = t
    state.update((last_us, n_sessions))
    yield pd.DataFrame({"user_id": [user_id], "n_sessions": [n_sessions]})


def stateful_sessionize(events: DataFrame) -> DataFrame:
    """events (streaming, with ``ts`` timestamp + ``user_id``) →
    per-user running session counts (30-min inactivity gap)."""
    import pyspark.sql.functions as F

    with_us = events.select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    return with_us.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
