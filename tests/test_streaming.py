"""Structured Streaming parity: the SAME operator functions produce
identical results through readStream (availableNow) as through batch,
plus watermark/stateful-dedup smoke checks (SURVEY.md §5.2.5)."""

from __future__ import annotations

import pandas as pd

from document_vector_indexer_spark.io import load_table
from document_vector_indexer_spark.streaming import windows as W

SF_DIR = "/root/testdata/sf0.001"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def test_tumbling_batch_stream_parity(spark):
    batch = W.tumbling_counts(load_table(spark, SF_DIR, "events")).toPandas()
    stream = W.tumbling_counts(W.read_events_stream(spark, SF_DIR))
    W.run_stream_to_memory(stream, "t_tumbling", output_mode="complete")
    got = spark.sql("SELECT * FROM t_tumbling").toPandas()
    pd.testing.assert_frame_equal(
        _normalize(got), _normalize(batch), check_dtype=False
    )


def test_session_batch_stream_parity(spark):
    batch = W.session_aggregates(load_table(spark, SF_DIR, "events")).toPandas()
    stream = W.session_aggregates(
        W.read_events_stream(spark, SF_DIR).withWatermark("ts", "1 hour")
    )
    W.run_stream_to_memory(stream, "t_session", output_mode="complete")
    got = spark.sql("SELECT * FROM t_session").toPandas()
    pd.testing.assert_frame_equal(
        _normalize(got), _normalize(batch), check_dtype=False
    )


def test_watermark_append_finalizes_windows(spark):
    stream = W.tumbling_with_watermark(W.read_events_stream(spark, SF_DIR))
    W.run_stream_to_memory(stream, "t_watermark", output_mode="append")
    got = spark.sql("SELECT * FROM t_watermark").toPandas()
    # append mode only emits windows the watermark has closed; with one
    # availableNow pass the final (max-ts) window is still open.
    batch = W.tumbling_counts(load_table(spark, SF_DIR, "events")).toPandas()
    assert 0 < len(got) < len(batch)
    merged = got.merge(
        batch[["window_start", "event_type", "n_events"]],
        on=["window_start", "event_type"],
        suffixes=("_s", "_b"),
    )
    assert (merged.n_events_s == merged.n_events_b).all()


def test_dedup_within_watermark(spark):
    ev = W.read_events_stream(spark, SF_DIR)
    deduped = W.dedup_within_watermark(ev, watermark="2 hours")
    W.run_stream_to_memory(
        deduped.groupBy().count(), "t_dedup", output_mode="complete"
    )
    got = spark.sql("SELECT * FROM t_dedup").toPandas()
    n_batch = load_table(spark, SF_DIR, "events").count()
    # event_id is unique in the corpus -> dedup must be lossless
    assert int(got["count"].iloc[0]) == n_batch


def test_interval_join_batch_stream_parity(spark):
    """attribution_join as a TRUE stream-stream inner join: both sides
    watermarked readStreams, time-range condition bounds the state,
    append output — must equal the batch frame pair-for-pair."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    batch = W.attribution_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    ).select(
        "user_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("c"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("p"),
    ).toPandas()

    s1 = W.read_events_stream(spark, SF_DIR).withWatermark("ts", "2 hours")
    s2 = W.read_events_stream(spark, SF_DIR).withWatermark("ts", "2 hours")
    joined = W.attribution_join(
        s1.filter(F.col("event_type") == "click"),
        s2.filter(F.col("event_type") == "purchase"),
    ).select(
        "user_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("c"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("p"),
    )
    W.run_stream_to_memory(joined, "t_interval_join", output_mode="append")
    got = spark.sql("SELECT * FROM t_interval_join").toPandas()
    assert len(got) > 0, "stream-stream join emitted nothing"
    pd.testing.assert_frame_equal(
        _normalize(got), _normalize(batch), check_dtype=False
    )


def test_events_stream_reads_ingested_table_dir(spark, tmp_path):
    """r8 regression: on an ingest_engine_layout dir, events.parquet is
    a Spark-written table DIRECTORY — the streaming source must read it
    (the old symlink staging listed zero files through a symlinked
    subdirectory, so every readStream-backed key silently emitted
    nothing on the ingest layout). Pinned as batch/stream row parity on
    BOTH layouts."""
    from document_vector_indexer_spark.io import ingest_engine_layout

    dest = str(tmp_path / "ingested")
    ingest_engine_layout(spark, SF_DIR, dest)

    n_batch = load_table(spark, SF_DIR, "events").count()
    for d in (SF_DIR, dest):
        got = W.read_events_stream(spark, d)
        q = (
            got.groupBy()
            .count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("t_ingested_stream_count")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.sql("SELECT * FROM t_ingested_stream_count").collect()
        assert rows and rows[0]["count"] == n_batch, (d, rows)


def test_events_stream_ingested_ts_values_tz_invariant(spark, tmp_path):
    """r9 regression (r8 ADVICE medium): the ingest layout stores ts as
    LTZ TIMESTAMP (absolute instants); reading it back through an NTZ
    schema + cast re-interpreted the stored UTC wall time as SESSION-TZ
    wall time, silently shifting every ts by the UTC offset under any
    non-UTC session TZ (+5h under America/New_York). Pin VALUE parity,
    not just counts: min/max formatted ts from the stream read must
    equal the batch read's under a hostile session TZ."""
    from pyspark.sql import functions as F

    from document_vector_indexer_spark.io import ingest_engine_layout

    dest = str(tmp_path / "ingested_tz")
    ingest_engine_layout(spark, SF_DIR, dest)

    def minmax_fmt(df):
        return (
            df.agg(
                F.date_format(F.min("ts"), W.TS_FMT).alias("lo"),
                F.date_format(F.max("ts"), W.TS_FMT).alias("hi"),
            )
        )

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # batch read of the ingested layout is LTZ-native (ground truth
        # for the stored instants under this session TZ)
        batch = minmax_fmt(load_table(spark, dest, "events")).collect()[0]
        stream = minmax_fmt(W.read_events_stream(spark, dest))
        q = (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName("t_ingested_stream_tz")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.sql("SELECT * FROM t_ingested_stream_tz").collect()[0]
        assert (got["lo"], got["hi"]) == (batch["lo"], batch["hi"]), (
            "ingest-layout stream read shifted event time under a "
            "non-UTC session TZ",
            dict(got.asDict()),
            dict(batch.asDict()),
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
