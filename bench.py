#!/usr/bin/env python3
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology: one warm JVM/session (cold start is Spark overhead, not
query cost — BASELINE.md), each query materialized fully via the
``noop`` sink (no driver-side collect), wall-clock per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Representative spread: scan/agg, joins (shuffle + broadcast), window,
# top-k, as-of, chunkers, vector search, dedup, sessionization.
HEADLINE = [
    "q_agg_basic",
    "q_join_inner",
    "q_join_broadcast",
    "q_win_rank",
    "q_topk",
    "q_join_asof",
    "flagship_chunk_topk",
    "q_chunk_sentence",
    "q_vec_cosine",
    "q_knn_brute",
    "q_dedup_ngram",
    "q_stream_session",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    from document_vector_indexer_spark.queries.registry import all_queries
    from document_vector_indexer_spark.session import get_spark

    # Bench-scale tuning (measured, see BASELINE.md): sf0.1 inputs are
    # ~1-10 MB single-row-group files, so 128 MB splits leave every scan
    # single-threaded and 32 shuffle partitions are pure task overhead.
    # Production keeps 128 MB splits + AQE-coalesced wide shuffles; the
    # *ratio* partition-bytes-to-data stays the principle in both.
    spark = get_spark(
        app_name="dvi-bench",
        shuffle_partitions=8,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(1 << 20)},
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # Warm methodology (BASELINE.md): first execution includes
    # whole-stage-codegen compilation (~0.5 s/query of JVM overhead
    # that amortizes to zero in any long-lived deployment); then take
    # the min of two measured runs (single warm runs still wobble ~30%
    # under background load). The DuckDB comparator is measured the
    # same way.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_warm_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
