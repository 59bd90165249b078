#!/usr/bin/env python3
"""A/B the q_dedup_substrings gram-hash SORT-SPILL levers at ~sf100
(r12 VERDICT watch item 1: the decade ratio rose to 12.6x because
sf100 spills the ~1 B-row (id, _gh) sort that sf10 fits in memory;
nobody had measured whether spill tuning moves the constant).

Each variant runs in its OWN subprocess because the levers are
JVM-start-only (io codec applies to spill/shuffle blocks created from
startup; off-heap and driver memory are immutable). Inside the child:
default engine session + autosize partitions (the exact harness that
produced the 129.3 s r12 receipt), one warm run, then N measured runs
against the noop sink.

Usage: python tools/_substr_spill_ab.py [dir] [runs]
       (defaults /root/repo/.scale/ing_sf100, 1)
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
from document_vector_indexer_spark.session import (
    get_spark, autosize_shuffle_partitions, dir_bytes,
)
from document_vector_indexer_spark.operators.dedup import dup_substring_stats
import json
d = sys.argv[1]
runs = int(sys.argv[2])
conf = json.loads(sys.argv[3])
spark = get_spark(app_name="substr-spill-ab", extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")
autosize_shuffle_partitions(spark, dir_bytes(d))
docs = spark.read.parquet(f"{d}/documents.parquet").select("doc_id", "text")
dup_substring_stats(docs, k=8).write.format("noop").mode("overwrite").save()
times = []
for _ in range(runs):
    t0 = time.perf_counter()
    dup_substring_stats(docs, k=8).write.format("noop").mode("overwrite").save()
    times.append(round(time.perf_counter() - t0, 1))
print("RESULT", json.dumps(times), flush=True)
"""

VARIANTS = {
    # the shipped defaults (lz4 codec, 16g driver, on-heap)
    "base": {},
    # smaller spill/shuffle blocks for more compression CPU
    "zstd": {"spark.io.compression.codec": "zstd"},
    # move execution memory off-heap (Tungsten sort pages)
    "offheap16g": {
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "16g",
    },
    # does the spill vanish if the sort simply has more memory?
    # (sizes the lever a real cluster pulls via executor memory)
    "mem48g": {"_driver_memory": "48g"},
}


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/ing_sf100"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    for name, conf in VARIANTS.items():
        conf = dict(conf)
        env = dict(os.environ)
        dm = conf.pop("_driver_memory", None)
        if dm:
            env["SPARK_DRIVER_MEMORY"] = dm
        p = subprocess.run(
            [sys.executable, "-c", CHILD, d, str(runs), json.dumps(conf)],
            capture_output=True,
            text=True,
            env=env,
            cwd="/root/repo",
        )
        line = next(
            (l for l in p.stdout.splitlines() if l.startswith("RESULT")), None
        )
        if p.returncode != 0 or line is None:
            print(f"{name}: ERR\n{p.stderr[-800:]}", flush=True)
            continue
        print(f"{name}: {line.split(' ', 1)[1]}", flush=True)


if __name__ == "__main__":
    main()
