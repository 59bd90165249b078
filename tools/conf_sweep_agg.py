#!/usr/bin/env python3
"""Counterbalanced conf sweep over the hash-agg / join codegen knobs
(r8 VERDICT item 1): q_agg_basic and q_join_inner are the only headline
family losing to DuckDB on data-proportional cost (~0.2 s data cost vs
0.09/0.02 s DuckDB totals at sf0.1). The plans are already the right
100 TB shapes (partial+final codegen hash agg; broadcast-probe join),
so the remaining lever — if any — is a constant-factor conf, not a plan
change.

Design: one bench-identical session (ingest layout, AQE off, 8 shuffle
partitions, locality 0, uncompressed shuffles), each query constructed
ONCE (prepared form). Every noop save builds a fresh QueryExecution
that reads the CURRENT session confs, so variants flip confs between
executions of the same DataFrame. Variants run interleaved in rotated
order across R rounds (counterbalanced: host drift hits every variant
equally); per variant we report min and median.

Usage: python tools/conf_sweep_agg.py [sf_dir]  (default sf0.1)
Prints one JSON line; the A/B table goes to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

QUERIES = ["q_agg_basic", "q_join_inner"]
ROUNDS = 7

# Knob -> (variant value, baseline value). All are execution-time confs
# read by the planner/codegen on each fresh QueryExecution.
VARIANTS: "dict[str, dict[str, tuple[str, str]]]" = {
    "baseline": {},
    "vectorized_fastmap": {
        # first-level hash map in the codegen'd partial agg becomes the
        # vectorized RowBasedHashMapGenerator variant
        "spark.sql.codegen.aggregate.map.vectorized.enable": ("true", "false"),
    },
    "no_twolevel": {
        # skip the per-partition fast hash map entirely (2 group keys x
        # 4 flag/status combos -> tiny key space; the fast map should
        # WIN here, this arm is the control that proves it)
        "spark.sql.codegen.aggregate.map.twolevel.enabled": ("false", "true"),
    },
    "no_split_aggfunc": {
        # 8 aggregate expressions split into separate codegen methods
        # by default; inlining can help or hurt JIT
        "spark.sql.codegen.aggregate.splitAggregateFunc.enabled": (
            "false",
            "true",
        ),
    },
    "reader_batch_16k": {
        # 4x fewer columnar-batch loop setups per scan
        "spark.sql.parquet.columnarReaderBatchSize": ("16384", "4096"),
    },
    "reader_batch_1k": {
        # smaller batches = better cache residency for the 7-col scan?
        "spark.sql.parquet.columnarReaderBatchSize": ("1024", "4096"),
    },
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import atexit
    import shutil

    from document_vector_indexer_spark.queries.registry import all_queries
    from document_vector_indexer_spark.session import get_spark

    import bench

    ingest_dir = tempfile.mkdtemp(prefix="dvi_sweep_agg_")
    atexit.register(shutil.rmtree, ingest_dir, ignore_errors=True)
    bench._ingest_subprocess([(sf_dir, ingest_dir)])

    spark = get_spark(
        app_name="dvi-conf-sweep",
        shuffle_partitions=8,
        extra_conf={
            "spark.locality.wait": "0ms",
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.rdd.compress": "false",
        },
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_queries()
    dfs = {q: specs[q].fn(spark, ingest_dir) for q in QUERIES}

    # warm: codegen-compile every (query, variant) combination once so
    # the timed rounds never pay JIT/class-generation
    names = list(VARIANTS)
    for v in names:
        _apply(spark, VARIANTS[v], set_variant=True)
        for q in QUERIES:
            dfs[q].write.format("noop").mode("overwrite").save()
        _apply(spark, VARIANTS[v], set_variant=False)

    runs: "dict[str, dict[str, list[float]]]" = {
        q: {v: [] for v in names} for q in QUERIES
    }
    for r in range(ROUNDS):
        order = names[r % len(names):] + names[: r % len(names)]
        for v in order:
            _apply(spark, VARIANTS[v], set_variant=True)
            for q in QUERIES:
                t0 = time.perf_counter()
                dfs[q].write.format("noop").mode("overwrite").save()
                runs[q][v].append(time.perf_counter() - t0)
            _apply(spark, VARIANTS[v], set_variant=False)

    out = {
        q: {
            v: {
                "min": round(min(ts), 3),
                "median": round(statistics.median(ts), 3),
            }
            for v, ts in by_v.items()
        }
        for q, by_v in runs.items()
    }
    print(json.dumps({"sf_dir": sf_dir, "rounds": ROUNDS, "results": out}))
    spark.stop()


def _apply(spark, knobs, set_variant: bool) -> None:
    for k, (variant, base) in knobs.items():
        spark.conf.set(k, variant if set_variant else base)


if __name__ == "__main__":
    main()
