"""Arbitrary stateful streaming via applyInPandasWithState.

The reference's closest concept is long-lived per-task state inside a model
process; in Structured Streaming, state is an explicit per-key store with
timeouts, checkpointed for failure recovery — so the operator survives
executor loss, which the reference's in-process state did not.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
STATE_SCHEMA = "n long, cents long"


def _update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # round per ROW (matches the batch cents() formulation exactly);
        # rounding a batch-level sum would depend on micro-batch boundaries
        cents += int(pdf["value"].mul(100.0).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_cents": [cents]})


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, exact-cents total) maintained in the state
    store; emits the updated running totals for every key touched by each
    micro-batch. State is O(distinct keys) — per-key eviction would use
    state timeouts (ProcessingTimeTimeout) in a production pipeline."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def foreach_batch_parquet_sink(stream: DataFrame, path: str):
    """Start ``stream`` into an idempotent foreachBatch parquet sink.

    Structured Streaming's exactly-once story for arbitrary sinks:
    foreachBatch hands (batch DataFrame, batch_id) to user code, and on
    failure/restart a batch is REPLAYED with the same batch_id. Writing
    each batch to its own ``b{batch_id}`` subdirectory (no leading underscore — Hadoop file listings treat ``_``-prefixed paths as hidden metadata) with
    mode=overwrite makes the replay idempotent — a re-run of batch N
    replaces batch N's output instead of appending a duplicate. Readers
    scan ``path`` recursively; at 100 TB you'd compact subdirs
    periodically, but correctness never depends on compaction.

    Returns the StreamingQuery (caller awaits termination).
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/b{batch_id}")

    return (
        stream.writeStream.foreachBatch(_write)
        .trigger(availableNow=True)
        .start()
    )


def running_stats_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, exact-cents max) via transformWithState —
    Spark 4's successor to applyInPandasWithState: typed state handles
    (value/list/map states, timers, TTL) instead of one opaque tuple.
    Same operational contract as running_totals above: update-mode
    emissions per key per micro-batch, state checkpointed per key.

    The processor keeps a single ValueState; at 100 TB the state store is
    O(distinct keys) per partition and RocksDB-backed on a real cluster.

    DEPLOYMENT NOTE: transformWithStateInPandas's state-server protocol
    requires the ``protobuf`` Python package at runtime; environments
    without it (like this container) should use running_totals
    (applyInPandasWithState), which has no such dependency — the query
    inventory registers only that variant, and
    tests/test_streaming.py::test_transform_with_state runs this one
    when protobuf is available.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", "n LONG, mx LONG")

        def handleInputRows(self, key, rows, timer_values):
            if self._state.exists():
                n, mx = self._state.get()
            else:
                n, mx = 0, None
            for pdf in rows:
                n += len(pdf)
                # per-ROW rounding (micro-batch-boundary independent)
                cents = pdf["value"].mul(100.0).round().astype("int64")
                if len(cents):
                    m = int(cents.max())
                    mx = m if mx is None else max(mx, m)
            self._state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_cents": [mx]}
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningStats(),
            outputStructType="user_id long, n_events long, max_cents long",
            outputMode="Update",
            timeMode="None",
        )
    )
