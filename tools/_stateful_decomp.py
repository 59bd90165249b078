# scratch: decompose q_stream_stateful's wall at a pre-ingested dir
# (r11 VERDICT item 1). Variants isolate: the batch scan+shuffle+agg
# floor, the streaming-scan machinery, the stateful stage at the
# autosized vs a state-sized partition count, and a numpy-bodied
# updater. Usage: _stateful_decomp.py DIR v1,v2,... (default all)
import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from document_vector_indexer_spark.session import (
    autosize_shuffle_partitions,
    dir_bytes,
    get_spark,
)
from document_vector_indexer_spark.streaming import windows as W

D = sys.argv[1]
VARIANTS = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spark = get_spark(app_name="stateful-decomp")
spark.sparkContext.setLogLevel("ERROR")
parts = autosize_shuffle_partitions(spark, dir_bytes(D))
print(f"dir={D} autosized_partitions={parts}", flush=True)


def numpy_updater(key, pdfs, state):
    """Candidate: same semantics as make_user_totals_updater(0), numpy
    sum + cheap 1-row construction (microbench: 265 -> ~110 us/group)."""
    import numpy as np
    import pandas as pd

    if state.hasTimedOut:
        state.remove()
        return
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        v = pdf["value"].to_numpy()
        n += len(v)
        cents += int(np.rint(v * 100.0).sum())
    state.update((n, cents))
    yield pd.DataFrame.from_records(
        [(key[0], n, cents / 100.0)],
        columns=["user_id", "n_events", "total_value"],
    )


def run_stateful(sess, updater=None, label=""):
    from pyspark.sql.streaming.state import GroupStateTimeout

    from document_vector_indexer_spark.streaming import stateful as S

    name = f"decomp_{uuid.uuid4().hex[:8]}"
    ev = W.read_events_stream(sess, D)
    if updater is None:
        stream = S.running_user_totals(ev)
    else:
        stream = ev.groupBy("user_id").applyInPandasWithState(
            updater,
            outputStructType=S.OUTPUT_SCHEMA,
            stateStructType=S.STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    t0 = time.perf_counter()
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t1 = time.perf_counter()
    emitted = sess.sql(f"SELECT * FROM {name}")
    out = emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )
    nrows = out.count()
    t2 = time.perf_counter()
    nbatches = len(q.recentProgress)
    print(
        f"{label}: stream={t1-t0:.1f}s final_agg={t2-t1:.1f}s "
        f"rows={nrows} batches={nbatches}",
        flush=True,
    )
    for p in q.recentProgress:
        so = (p["stateOperators"] or [{}])[0]
        print(
            f"  batch={p['batchId']} input={p['numInputRows']} "
            f"durationMs={p['durationMs']} state={so}",
            flush=True,
        )


def new_session(partitions=None, arrow_batch=None):
    s = spark.newSession()
    if partitions:
        s.conf.set("spark.sql.shuffle.partitions", str(partitions))
    if arrow_batch:
        s.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
    return s


def v_batch_agg():
    t0 = time.perf_counter()
    (
        spark.read.parquet(f"{D}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.rint(F.col("value") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("total_value"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    print(f"batch_agg: {time.perf_counter()-t0:.1f}s", flush=True)


def v_stream_scan():
    ev = W.read_events_stream(spark, D)
    t0 = time.perf_counter()
    q = (
        ev.writeStream.foreachBatch(lambda b, i: b.write.format("noop").mode("overwrite").save())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print(f"stream_scan: {time.perf_counter()-t0:.1f}s", flush=True)


def noyield_updater(key, pdfs, state):
    """Isolation: consume input + update state, emit NOTHING — the
    delta vs `numpy` is the per-group emission/concat cost."""
    if state.hasTimedOut:
        state.remove()
        return
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
    state.update((n, cents))
    return
    yield  # pragma: no cover - make it a generator


def minimal_updater(key, pdfs, state):
    """Isolation: drain input, touch NO state, emit nothing — the
    floor of the Python group harness itself."""
    for _pdf in pdfs:
        pass
    return
    yield  # pragma: no cover


def v_jvm_agg():
    """JVM-side stateful streaming agg (update mode) — the same state
    shape with NO Python harness; the delta vs `full` is what the
    applyInPandasWithState boundary costs."""
    name = f"decomp_{uuid.uuid4().hex[:8]}"
    ev = W.read_events_stream(spark, D)
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (
            F.sum(F.rint(F.col("value") * 100).cast("long")).cast("double")
            / 100.0
        ).alias("total_value"),
    )
    t0 = time.perf_counter()
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t1 = time.perf_counter()
    n = spark.sql(f"SELECT count(*) FROM {name}").collect()[0][0]
    print(f"jvm_agg: stream={t1-t0:.1f}s rows={n}", flush=True)
    for p in q.recentProgress:
        so = (p["stateOperators"] or [{}])[0]
        print(
            f"  batch={p['batchId']} durationMs={p['durationMs']} state={so}",
            flush=True,
        )


def v_minimal_coarse():
    """minimal updater grouped by event_type (5 groups instead of
    n_users) — same rows, ~no groups: splits the harness cost into
    per-ROW vs per-GROUP components."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from document_vector_indexer_spark.streaming import stateful as S

    name = f"decomp_{uuid.uuid4().hex[:8]}"
    ev = W.read_events_stream(spark, D)
    stream = ev.groupBy("event_type").applyInPandasWithState(
        minimal_updater,
        outputStructType=S.OUTPUT_SCHEMA,
        stateStructType=S.STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    t0 = time.perf_counter()
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print(f"minimal_coarse: stream={time.perf_counter()-t0:.1f}s", flush=True)


ALL = {
    "batch_agg": v_batch_agg,
    "stream_scan": v_stream_scan,
    "jvm_agg": v_jvm_agg,
    "minimal_coarse": v_minimal_coarse,
    "noyield": lambda: run_stateful(spark, updater=noyield_updater, label="noyield"),
    "minimal": lambda: run_stateful(spark, updater=minimal_updater, label="minimal"),
    "full": lambda: run_stateful(spark, label="full(autosized)"),
    "p32": lambda: run_stateful(new_session(32), label="p32"),
    "p128": lambda: run_stateful(new_session(128), label="p128"),
    "numpy": lambda: run_stateful(spark, updater=numpy_updater, label="numpy(autosized)"),
    "numpy_p32": lambda: run_stateful(
        new_session(32), updater=numpy_updater, label="numpy_p32"
    ),
    "numpy_ab100k": lambda: run_stateful(
        new_session(arrow_batch=100_000),
        updater=numpy_updater,
        label="numpy_ab100k",
    ),
    "numpy_ab1m": lambda: run_stateful(
        new_session(arrow_batch=1_000_000),
        updater=numpy_updater,
        label="numpy_ab1m",
    ),
    "minimal_ab1m": lambda: run_stateful(
        new_session(arrow_batch=1_000_000),
        updater=minimal_updater,
        label="minimal_ab1m",
    ),
    "full_ab1m": lambda: run_stateful(
        new_session(arrow_batch=1_000_000), label="full_ab1m"
    ),
}

for name in VARIANTS or list(ALL):
    ALL[name]()
