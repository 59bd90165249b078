#!/usr/bin/env python3
"""Recall-at-cap probe (r10 VERDICT item 3): quantify the pairs the
``max_bucket_rows`` hot-bucket drop-cap loses on a skewed corpus with
planted near-dup clusters straddling the cap — and verify the
documented delegation (clusters above the cap belong to exact /
semantic dedup) actually catches what the cap drops.

Method
------
Plant clusters of near-identical vectors (base + 0.5% relative noise,
cosine > 0.999 — near-dups, NOT byte-identical, so exact dedup would
miss them and the LSH path is the one on the hook) at sizes straddling
the 512 cap, on top of a real background corpus (the blow-up
fixtures), then for cap in (None, 512):

  recall(cluster) = recovered within-cluster pairs / C(n, 2)

A near-identical cluster is hot in EVERY band once n > cap, so the
expected shape is recall ~1 below the cap and 0 above it — the
documented blind spot, now measured instead of argued. The probe also
bands each planted cluster through ``semantic_dedup_survivors``'s cell
(one wide sign-LSH band) and reports how many cells the cluster
occupies: 1 cell per cluster means one semantic-dedup aggregation
recovers the whole group the cap dropped.

Usage: python tools/cap_recall_probe.py [background_dir]
       (default /root/repo/.scale/ing_sf1; pass ing_sf10 for the
        second-decade occupancy profile)
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

CLUSTER_SIZES = (256, 512, 640, 1024, 2048)
ID_BASE = 10_000_000
ID_STRIDE = 100_000
THRESHOLD = 0.95
CAP = 512


def planted_rows():
    """Deterministic near-dup clusters: seeded base direction per
    cluster, members = base + 0.5% relative seeded noise (cosine
    > 0.999 pairwise)."""
    import numpy as np

    rows = []
    for ci, size in enumerate(CLUSTER_SIZES):
        rng = np.random.RandomState(1000 + ci)
        base = rng.normal(size=64)
        base = base / np.linalg.norm(base)
        noise = rng.normal(size=(size, 64)) * 0.005
        vecs = base[None, :] + noise
        for mi in range(size):
            rows.append(
                (ID_BASE + ci * ID_STRIDE + mi, [float(x) for x in vecs[mi]])
            )
    return rows


def main() -> None:
    from pyspark.sql import functions as F

    from document_vector_indexer_spark.io import load_table
    from document_vector_indexer_spark.operators.dedup import (
        embedding_lsh_blocks,
        embedding_near_dup_pairs,
    )
    from document_vector_indexer_spark.session import get_spark

    bg_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO_ROOT, ".scale", "ing_sf1"
    )
    spark = get_spark(app_name="dvi-cap-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")

    bg = (
        load_table(spark, bg_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    planted = spark.createDataFrame(
        planted_rows(), "vec_id long, embedding array<double>"
    )
    corpus = bg.unionByName(planted)
    n_bg = bg.count()
    print(f"background={bg_dir} n_bg={n_bg} planted={sum(CLUSTER_SIZES)}")

    cluster_of = F.floor((F.col("id_a") - ID_BASE) / ID_STRIDE)
    results: dict[int | None, dict[int, int]] = {}
    for cap in (CAP, None):
        t0 = time.perf_counter()
        # bands pinned to the value the SCALE.md §3 table was measured
        # at (the late-r11 bands="auto" default would resolve higher on
        # the blow-up corpora; more bands give a planted cluster more
        # chances to split under the cap, shifting recall-at-cap up —
        # a different experiment, not a reproduction)
        pairs = embedding_near_dup_pairs(
            corpus, threshold=THRESHOLD, block_col=None, dim=64,
            bands=6, max_bucket_rows=cap, log_dropped_buckets=True,
        )
        got = {
            int(r["c"]): int(r["n"])
            for r in (
                pairs.filter(
                    (F.col("id_a") >= ID_BASE)
                    & (F.col("id_b") >= ID_BASE)
                    & (F.floor((F.col("id_a") - ID_BASE) / ID_STRIDE)
                       == F.floor((F.col("id_b") - ID_BASE) / ID_STRIDE))
                )
                .groupBy(cluster_of.alias("c"))
                .agg(F.count("*").alias("n"))
                .collect()
            )
        }
        results[cap] = got
        print(f"cap={cap}: {time.perf_counter() - t0:.1f}s")

    # semantic-dedup delegation: cells per planted cluster in the wide
    # single-band cell id (bits=12, the semantic_dedup_survivors cell)
    cells = (
        embedding_lsh_blocks(
            planted, dim=64, bands=1, bits=12, carry_vec=False
        )
        .groupBy(F.floor((F.col("vec_id") - ID_BASE) / ID_STRIDE).alias("c"))
        .agg(F.countDistinct("bucket").alias("n_cells"))
    )
    n_cells = {int(r["c"]): int(r["n_cells"]) for r in cells.collect()}

    print()
    print("| cluster size | true pairs | recall cap=512 | recall cap=None | semantic cells |")
    print("|---|---|---|---|---|")
    for ci, size in enumerate(CLUSTER_SIZES):
        true = size * (size - 1) // 2
        r_cap = results[CAP].get(ci, 0) / true
        r_none = results[None].get(ci, 0) / true
        print(
            f"| {size} | {true} | {r_cap:.3f} | {r_none:.3f} | "
            f"{n_cells.get(ci, 0)} |"
        )


if __name__ == "__main__":
    main()
