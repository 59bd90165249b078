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


def _update_user(key, pdfs: Iterator, state: GroupState) -> Iterable:
    import pandas as pd

    n, cents = state.get() if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # per-ROW exact cents (2dp data), never round a batch sum:
        # batch-level rounding would make the state depend on
        # micro-batch boundaries
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame -> per-user running totals, one output row
    per user per micro-batch (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
