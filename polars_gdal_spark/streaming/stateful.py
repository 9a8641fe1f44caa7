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


# ----------------------------------------------------------------------
# transformWithState (Spark 4's arbitrary-state API — the successor to
# applyInPandasWithState; typed per-key state cells, RocksDB-backed).


def stateful_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running stats via ``transformWithStateInPandas``:
    event count, value total, and distinct event-type count accumulate
    across micro-batches in typed state cells (a ValueState for the
    scalar counters, a ListState for the seen-type set).

    State is per-key and RocksDB-backed (set
    ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
    provider), so memory stays bounded per executor regardless of user
    cardinality — the shape that survives an unbounded key space.
    Update-mode output: one refreshed row per user per micro-batch.

    Runtime requirement: transformWithState's Python state protocol
    needs ``google.protobuf``; the equivalence test skips where it is
    absent (this container), and ``stateful_sessionize``'s
    applyInPandasWithState path covers the stateful surface there.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )
            self._types = handle.getListState("types", "t STRING")

        def handleInputRows(self, key, rows, timerValues):
            n, total, types = 0, 0.0, set()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                types |= set(pdf["event_type"].dropna())
            if self._totals.exists():
                pn, ptotal = self._totals.get()
                n += int(pn)
                total += float(ptotal)
            seen = {t for (t,) in self._types.get()}
            new = types - seen
            if new:
                self._types.appendList([(t,) for t in sorted(new)])
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "n_event_types": [len(seen | types)],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType=(
            "user_id bigint, n_events bigint,"
            " total_value double, n_event_types bigint"
        ),
        outputMode="Update",
        timeMode="None",
    )


# ----------------------------------------------------------------------
# Streaming CUSUM drift — the live twin of queries.analytics.
# events_cusum_drift. State per user carries the four integers the
# closed form needs (prefix sum, running min, peak, count), so each
# micro-batch folds in O(batch) and the statistic is identical to the
# batch query when the stream is drained in event order.

CUSUM_STATE_SCHEMA = "pre long, mn long, peak long, n long"
CUSUM_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, peak_cusum bigint, drifted boolean"
)


def stateful_cusum_drift(
    events: DataFrame, drift: int, threshold: int = 40000
) -> DataFrame:
    """events (streaming: ``ts``, ``event_id``, ``user_id``, ``value``)
    → per-user running CUSUM peak and drift flag.

    ``drift`` is the integer cents baseline to monitor against (the
    batch query derives it as the corpus mean; a live monitor pins the
    target it defends). Within a micro-batch rows fold in (ts,
    event_id) order; the per-user state (prefix sum, running min, peak,
    count) makes the fold associative across batches for an in-order
    stream — same integers as the batch closed form."""
    import pyspark.sql.functions as F

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pre, mn, peak, n = state.get if state.exists else (0, 0, 0, 0)
        pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        for yk in pdf["yk"]:
            pre += int(yk)
            mn = min(mn, pre)
            cus = pre - min(0, mn)
            peak = max(peak, cus)
            n += 1
        state.update((pre, mn, peak, n))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "peak_cusum": [peak],
                "drifted": [peak >= threshold],
            }
        )

    rows = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        (F.floor(F.col("value") * 100).cast("long") - drift).alias("yk"),
    )
    return rows.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ----------------------------------------------------------------------
# Streaming token-budget admission — the live-ingest twin of
# queries.pipeline.pipeline_token_budget: admit arriving documents to a
# training mix while the source's cumulative token count stays within
# its quota. State per source is ONE long (tokens seen so far), so
# state size is O(sources) — bounded however large the crawl gets.
# Same budget-charging (prefix) rule as the batch query — every
# arriving document's tokens count against the quota whether or not
# it is admitted — but charged over ARRIVAL order; the batch query
# fills in quality-rank order, so the two selected sets coincide only
# when arrival order matches quality order. The equivalence test
# compares against a doc_id-ordered cumsum, the stream's actual
# semantics.

BUDGET_STATE_SCHEMA = "spent long"
BUDGET_OUTPUT_SCHEMA = (
    "doc_id bigint, source string, ntok bigint, cum_tok bigint"
)


def stateful_token_budget(docs: DataFrame, budget: int = 600) -> DataFrame:
    """docs (streaming, with ``doc_id``/``source``/``text``) → admitted
    documents with their token count and the source's running total at
    admission time. Arrival order within a micro-batch is doc_id order
    (deterministic); cross-batch order is the stream's delivery order,
    exactly like a real ingest."""

    def admit(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        (spent,) = state.get if state.exists else (0,)
        pdf = pd.concat(list(pdfs)).sort_values("doc_id")
        # maximal runs of non-space chars == split(" ") with empties
        # dropped — identical to functions.text.token_count, but
        # vectorized over the whole micro-batch (no per-row loop)
        ntok = pdf["text"].str.count("[^ ]+").astype("int64")
        cum_tok = spent + ntok.cumsum()
        admitted = cum_tok <= budget
        state.update((int(spent + ntok.sum()),))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"][admitted].astype("int64"),
                "source": source,
                "ntok": ntok[admitted],
                "cum_tok": cum_tok[admitted].astype("int64"),
            }
        )

    return docs.groupBy("source").applyInPandasWithState(
        admit,
        outputStructType=BUDGET_OUTPUT_SCHEMA,
        stateStructType=BUDGET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
