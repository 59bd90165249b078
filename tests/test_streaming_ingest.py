"""Continuous indexing: the streaming document-ingest pipeline must
produce EXACTLY the batch pipeline's chunks on the same input set
(batch-equivalence oracle), and a second availableNow pass must index
only newly arrived files (checkpointed discovery) while leaving the
first pass's output untouched."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from document_vector_indexer_spark.streaming.ingest import (
    start_stream_ingest,
    stream_index_transform,
)

GEOM = dict(strategy="fixed", chunk_size=120, overlap=30, embedding_dim=8)


def _write_docs(path, docs):
    path.mkdir(parents=True, exist_ok=True)
    fname = path / f"part-{len(list(path.iterdir()))}.jsonl"
    with open(fname, "w") as f:
        for name, text in docs:
            f.write(json.dumps({"filename": name, "text": text}) + "\n")


def _chunk_rows(spark, path):
    df = spark.read.parquet(path)
    return {
        (r.filename, r.split_strategy, r.chunk_pos, r.chunk_text,
         tuple(round(x, 5) for x in r.embedding))
        for r in df.collect()
    }


def _batch_rows(spark, docs):
    bdf = spark.createDataFrame(docs, "filename string, text string")
    out = stream_index_transform(bdf, **GEOM)
    return {
        (r.filename, r.split_strategy, r.chunk_pos, r.chunk_text,
         tuple(round(x, 5) for x in r.embedding))
        for r in out.collect()
    }


def test_stream_ingest_equals_batch_and_appends_incrementally(spark, tmp_path):
    in_dir = tmp_path / "incoming"
    out = str(tmp_path / "chunk_stream")
    ckpt = str(tmp_path / "ckpt")

    wave1 = [
        ("a.txt", "spark streams documents continuously. " * 12),
        ("b.txt", "each file becomes chunks with embeddings. " * 10),
    ]
    _write_docs(in_dir, wave1)
    q = start_stream_ingest(spark, str(in_dir), out, ckpt, **GEOM)
    q.awaitTermination(120)
    got1 = _chunk_rows(spark, out)
    assert got1 == _batch_rows(spark, wave1), "stream != batch on wave 1"

    # wave 2: only the NEW file may be processed (checkpointed source)
    wave2 = [("c.txt", "late arriving document joins the index. " * 11)]
    _write_docs(in_dir, wave2)
    q = start_stream_ingest(spark, str(in_dir), out, ckpt, **GEOM)
    q.awaitTermination(120)
    got2 = _chunk_rows(spark, out)
    assert got2 == _batch_rows(spark, wave1 + wave2), "stream != batch on wave 1+2"
    assert got1 < got2, "wave-1 rows must be untouched by the second pass"

    # natural-key uniqueness: one row per (filename, strategy, pos)
    df = spark.read.parquet(out)
    n = df.count()
    n_keys = df.select("filename", "split_strategy", "chunk_pos").distinct().count()
    assert n == n_keys, "duplicate chunks after two passes"


def test_stream_ingest_transform_is_stateless(spark, tmp_path):
    """No watermark, no state store: the plan must be free of stateful
    operators so throughput scales like the batch pipeline."""
    in_dir = tmp_path / "in2"
    _write_docs(in_dir, [("x.txt", "tiny doc " * 30)])
    from document_vector_indexer_spark.streaming.ingest import (
        read_document_stream,
    )

    out = stream_index_transform(read_document_stream(spark, str(in_dir)), **GEOM)
    assert out.isStreaming
    plan = out._jdf.queryExecution().analyzed().toString()
    for node in ("StateStore", "Deduplicate", "Aggregate"):
        assert node not in plan, f"unexpected stateful node {node}:\n{plan}"
