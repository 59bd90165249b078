"""Custom stateful streaming operators (applyInPandasWithState) and the
exactly-once foreachBatch sink pattern.

``running_user_totals`` keeps one tiny state row per user (count +
value sum in integer cents) and emits the updated totals per
micro-batch — the canonical "custom aggregation Spark doesn't ship"
shape. State is bounded by key cardinality, not stream length; a
production deployment adds a state TTL via the timeout parameter.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def make_user_totals_updater(idle_timeout_ms: int = 0):
    """The per-group update function, parameterized by the idle
    timeout. A closure (pickled BY VALUE by cloudpickle) rather than a
    module global, so two streams with different timeouts can coexist
    in one session."""

    def update(key, pdfs: Iterator, state: GroupState) -> Iterable:
        import pandas as pd

        if state.hasTimedOut:
            # idle-eviction path (idle_timeout_ms > 0): the group saw
            # no data for the configured duration — drop its 16-byte
            # state row and emit nothing. The NEXT event for this user
            # restarts its running totals from zero (documented
            # semantics: the timeout bounds state by ACTIVE keys,
            # trading history for memory).
            state.remove()
            return
        # GroupState.get is a PROPERTY (raises when absent) — calling
        # it as a method only ever worked while no flush carried prior
        # state; the multi-flush test pinned the cross-batch path
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # per-ROW exact cents (2dp data), never round a batch sum:
            # batch-level rounding would make the state depend on
            # micro-batch boundaries
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        state.update((n, cents))
        if idle_timeout_ms > 0:
            # re-armed on every batch that touches the key, so the
            # clock measures IDLE time, not lifetime
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
            }
        )

    return update


# default updater: module-level name kept for test/back-compat imports
_update_user = make_user_totals_updater()


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int = 0
) -> DataFrame:
    """Streaming DataFrame -> per-user running totals, one output row
    per user per micro-batch (update mode).

    State: one (long, long) row per user — 16 bytes + key + store
    overhead, bounded by key CARDINALITY, not stream length. With
    ``idle_timeout_ms`` > 0 the bound tightens to keys active within
    the window: a user idle that long has their state evicted
    (processing-time timeout; the next event restarts from zero). At
    100 TB/day this is the knob that keeps the state store flat when
    the key space grows without bound (drive-by user_ids)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_user_totals_updater(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms > 0
            else GroupStateTimeout.NoTimeout
        ),
    )


def write_each_batch_idempotent(stream_df: DataFrame, path: str, query_name: str):
    """Exactly-once file sink via foreachBatch: every micro-batch
    overwrites its own batch-id-named subdirectory, so a replayed batch
    (failure/restart) rewrites the same files instead of duplicating —
    idempotence carries the exactly-once guarantee."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode("update")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
