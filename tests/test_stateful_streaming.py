"""applyInPandasWithState + foreachBatch sink tests: custom stateful
totals must equal the batch aggregate, and the foreachBatch sink must
be idempotent under replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_vector_indexer_spark.io import load_table
from document_vector_indexer_spark.streaming import windows as W
from document_vector_indexer_spark.streaming.stateful import (
    running_user_totals,
    write_each_batch_idempotent,
)

SF = "/root/testdata/sf0.001"


def test_stateful_totals_match_batch(spark):
    stream = running_user_totals(W.read_events_stream(spark, SF))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # one availableNow pass may still split into several micro-batches;
    # the LAST emitted row per user carries the final running total
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM t_state").collect()
    }
    batch = {
        r.user_id: (r.n, r.total)
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.rint(F.col("value") * 100).cast("long")) / 100.0).alias("total"),
        )
        .collect()
    }
    assert got.keys() == batch.keys()
    for u in batch:
        assert got[u][0] == batch[u][0], f"user {u} count"
        assert abs(got[u][1] - batch[u][1]) < 0.02, f"user {u} total"


def test_foreach_batch_sink_idempotent(spark, tmp_path):
    path = str(tmp_path / "sink")
    counts = W.tumbling_counts(W.read_events_stream(spark, SF))
    q = write_each_batch_idempotent(counts, path, "t_febatch")
    q.awaitTermination()
    first = spark.read.parquet(path)
    n1 = first.count()
    assert n1 > 0
    # replay the same micro-batch payload manually: the sink must
    # overwrite, not append
    batch_df = W.tumbling_counts(load_table(spark, SF, "events"))
    batch_df.write.mode("overwrite").parquet(f"{path}/batch_id=0")
    n2 = spark.read.parquet(path).count()
    assert n2 == n1
