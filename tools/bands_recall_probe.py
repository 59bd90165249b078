#!/usr/bin/env python3
"""Measure the bands-vs-recall contract on the blow-up corpora
(late r11): plant K pairs at cosine EXACTLY 0.955 — just above the
0.95 dedup threshold, the borderline regime the planted-identical
oracles cannot see — on top of the real corpus (which supplies the n
that drives bits="auto"), then measure what fraction of the planted
pairs ``embedding_near_dup_pairs`` actually returns with the fixed
r6-era bands=6 versus bands="auto" (recommended_lsh_bands).

The partner vector is an exact-angle rotation: w = cosθ·v̂ + sinθ·û
with û unit and orthogonal to v (Gram–Schmidt on a seeded Gaussian),
so every planted pair sits at the same similarity and recall is a
clean Bernoulli average, directly comparable to the closed form
1 − (1 − p^bits)^bands, p = 1 − θ/π.

Usage: python tools/bands_recall_probe.py [ing_dir ...]
Defaults to .scale/ing_sf10 and .scale/ing_sf100.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from document_vector_indexer_spark.operators.dedup import (
    _resolve_lsh_bits,
    embedding_near_dup_pairs,
    lsh_union_recall,
    recommended_lsh_bands,
)
from document_vector_indexer_spark.session import (
    autosize_shuffle_partitions,
    dir_bytes,
    get_spark,
)

K = 2000
PLANT_COS = 0.955
THRESHOLD = 0.95
SEED = 11


def main() -> None:
    dirs = sys.argv[1:] or [".scale/ing_sf10", ".scale/ing_sf100"]
    spark = get_spark(app_name="bands-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        autosize_shuffle_partitions(spark, dir_bytes(d))
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet")).select(
            "vec_id", "embedding"
        )
        base = emb.limit(K).collect()
        rng = np.random.RandomState(SEED)
        theta = math.acos(PLANT_COS)
        rows = []
        max_id = 10**12  # planted ids far above any corpus id
        for i, r in enumerate(base):
            v = np.asarray(r["embedding"], dtype=np.float64)
            vhat = v / np.linalg.norm(v)
            g = rng.standard_normal(len(v))
            u = g - g.dot(vhat) * vhat
            u /= np.linalg.norm(u)
            w = (math.cos(theta) * vhat + math.sin(theta) * u) * np.linalg.norm(v)
            rows.append((max_id + 2 * i, [float(x) for x in v]))
            rows.append((max_id + 2 * i + 1, [float(x) for x in w]))
        planted = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        allv = emb.unionByName(planted)
        bits = _resolve_lsh_bits(allv, "auto", target_bucket_rows=32)
        auto_bands = recommended_lsh_bands(bits, THRESHOLD)
        for bands in sorted({6, auto_bands}):
            t0 = time.perf_counter()
            got = (
                embedding_near_dup_pairs(
                    allv,
                    threshold=THRESHOLD,
                    block_col=None,
                    dim=64,
                    bands=bands,
                    bits=bits,
                )
                .filter(
                    (F.col("id_a") >= max_id)
                    & (F.col("id_b") == F.col("id_a") + 1)
                    & (F.col("id_a") % 2 == 0)
                )
                .count()
            )
            sec = time.perf_counter() - t0
            predicted = lsh_union_recall(bits, PLANT_COS, bands)
            print(
                f"{d}: bits={bits} bands={bands}"
                f"{' (auto)' if bands == auto_bands else ' (fixed r6 default)'}"
                f" recall {got}/{K} = {got / K:.3f}"
                f" (closed-form {predicted:.3f}) in {sec:.1f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
