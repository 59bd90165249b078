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

r12 adds a MULTIPROBE arm (verdict item 2): probe Hamming-1-adjacent
buckets per band so the recall target holds at fewer bands — per-band
catch probability rises from p^bits to p^bits + bits·p^(bits-1)(1-p),
so bands_mp = ceil(log(1-target)/log(1-that)) instead of the exact
arm's count. The arm measures recall, SCORED-CANDIDATE volume, and
wall-time against the shipped exact-match arms; the closed-form
prediction (recorded here before the run) is that the probe fan-out
multiplies per-band candidates by ~(bits+1) while cutting bands only
~3x, so candidates net ~(bits+1)·bands_mp/bands_auto worse — the run
decides whether the 3x narrower block exchange buys that back.

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


def multiprobe_band_recall(bits: int, threshold: float) -> float:
    """Per-band catch probability with Hamming-1 probing: exact match
    OR exactly one of ``bits`` planes disagreeing."""
    p = 1.0 - math.acos(threshold) / math.pi
    return p**bits + bits * p ** (bits - 1) * (1.0 - p)


def multiprobe_bands(bits: int, threshold: float, target: float = 0.9) -> int:
    r1 = multiprobe_band_recall(bits, threshold)
    return max(1, math.ceil(math.log(1.0 - target) / math.log(1.0 - r1)))


def multiprobe_pairs(df, threshold, dim, bits, bands, seed=7, max_bucket_rows=512):
    """The narrow pair path of embedding_near_dup_pairs with Hamming-1
    probe explosion on ONE join side: side a emits its bucket plus the
    ``bits`` single-bit-flipped buckets, side b stays exact, so a pair
    whose band codes differ in <= 1 bit becomes a candidate. Plan-only
    tool variant — the operator is untouched until the A/B decides."""
    from pyspark.sql import Window

    from document_vector_indexer_spark.operators.dedup import (
        embedding_lsh_blocks,
    )
    from document_vector_indexer_spark.functions import vector as V

    norm = F.sqrt(V.dot(F.col("embedding"), F.col("embedding")))
    blocks = embedding_lsh_blocks(
        df, dim=dim, vec_col="embedding", id_col="vec_id",
        bands=bands, bits=bits, seed=seed,
    )
    occ_w = Window.partitionBy("band", "bucket")
    blocks = (
        blocks.withColumn("__occ", F.count("*").over(occ_w))
        .filter(F.col("__occ") <= max_bucket_rows)
        .drop("__occ")
    )
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(bits)],
    )
    a = blocks.select(
        "band",
        F.explode(probes).alias("bucket"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("vec_a"),
        norm.alias("n_a"),
    )
    b = blocks.select(
        "band",
        "bucket",
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vec_b"),
        norm.alias("n_b"),
    )
    cand = a.join(b.hint("merge"), on=["band", "bucket"], how="inner").filter(
        F.col("id_a") < F.col("id_b")
    )
    return (
        cand.withColumn(
            "sim",
            V.dot(F.col("vec_a"), F.col("vec_b")) / (F.col("n_a") * F.col("n_b")),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
        .dropDuplicates(["id_a", "id_b"])
    ), cand


def _exact_candidates(df, bits, bands, seed=7, max_bucket_rows=512):
    """The operator's exact-match candidate stream (pre-score, post-cap)
    — the comparison metric for the multiprobe arm's candidate count."""
    from pyspark.sql import Window

    from document_vector_indexer_spark.operators.dedup import (
        embedding_lsh_blocks,
    )

    blocks = embedding_lsh_blocks(
        df, dim=64, vec_col="embedding", id_col="vec_id",
        bands=bands, bits=bits, seed=seed, carry_vec=False,
    )
    occ_w = Window.partitionBy("band", "bucket")
    blocks = (
        blocks.withColumn("__occ", F.count("*").over(occ_w))
        .filter(F.col("__occ") <= max_bucket_rows)
        .drop("__occ")
    )
    a = blocks.select("band", "bucket", F.col("vec_id").alias("id_a"))
    b = blocks.select("band", "bucket", F.col("vec_id").alias("id_b"))
    return a.join(b.hint("merge"), on=["band", "bucket"], how="inner").filter(
        F.col("id_a") < F.col("id_b")
    )


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

        # --- multiprobe arm (r12): Hamming-1 probes, bands sized by the
        # multiprobe closed form for the same 0.9 target ---------------
        mp_bands = multiprobe_bands(bits, THRESHOLD)
        mp_pred = 1.0 - (1.0 - multiprobe_band_recall(bits, PLANT_COS)) ** mp_bands
        survivors, cand = multiprobe_pairs(
            allv, THRESHOLD, dim=64, bits=bits, bands=mp_bands
        )
        t0 = time.perf_counter()
        got = (
            survivors.filter(
                (F.col("id_a") >= max_id)
                & (F.col("id_b") == F.col("id_a") + 1)
                & (F.col("id_a") % 2 == 0)
            )
            .count()
        )
        sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_cand = cand.count()
        cand_sec = time.perf_counter() - t0
        print(
            f"{d}: bits={bits} MULTIPROBE bands={mp_bands} (probes/band "
            f"{bits + 1}) recall {got}/{K} = {got / K:.3f} "
            f"(closed-form {mp_pred:.3f}) in {sec:.1f}s; scored "
            f"candidates {n_cand} (count pass {cand_sec:.1f}s)",
            flush=True,
        )
        # exact-arm candidate volume at auto bands, for the same metric
        exact_blocks_cand = _exact_candidates(allv, bits, auto_bands)
        t0 = time.perf_counter()
        n_exact = exact_blocks_cand.count()
        print(
            f"{d}: bits={bits} exact bands={auto_bands} scored candidates "
            f"{n_exact} (count pass {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
