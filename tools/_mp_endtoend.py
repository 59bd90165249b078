# scratch: END-TO-END A/B of multiprobe vs exact-match banding at a
# pre-ingested dir — full survivor materialization (no planted-pair
# filter that could push below the join and shrink a side; the recall
# probe measures recall, THIS measures the wall). Usage:
# _mp_endtoend.py DIR [arms]
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from document_vector_indexer_spark.operators.dedup import (
    _resolve_lsh_bits,
    embedding_near_dup_pairs,
    recommended_lsh_bands,
)
from document_vector_indexer_spark.session import (
    autosize_shuffle_partitions,
    dir_bytes,
    get_spark,
)
from tools.bands_recall_probe import multiprobe_bands, multiprobe_pairs

D = sys.argv[1]
ARMS = sys.argv[2].split(",") if len(sys.argv) > 2 else ["exact_auto", "mp"]

spark = get_spark(app_name="mp-endtoend")
spark.sparkContext.setLogLevel("ERROR")
autosize_shuffle_partitions(spark, dir_bytes(D))
emb = spark.read.parquet(os.path.join(D, "embeddings.parquet")).select(
    "vec_id", "embedding"
)
bits = _resolve_lsh_bits(emb, "auto", target_bucket_rows=32)
auto_bands = recommended_lsh_bands(bits, 0.95)
mp_bands = multiprobe_bands(bits, 0.95)
print(f"dir={D} bits={bits} auto_bands={auto_bands} mp_bands={mp_bands}", flush=True)

for arm in ARMS:
    t0 = time.perf_counter()
    if arm == "exact_auto":
        n = embedding_near_dup_pairs(
            emb, threshold=0.95, block_col=None, dim=64, bits=bits,
            bands=auto_bands,
        ).count()
    elif arm == "exact_6":
        n = embedding_near_dup_pairs(
            emb, threshold=0.95, block_col=None, dim=64, bits=bits, bands=6
        ).count()
    elif arm == "mp":
        survivors, _ = multiprobe_pairs(
            emb, 0.95, dim=64, bits=bits, bands=mp_bands
        )
        n = survivors.count()
    else:
        raise SystemExit(f"unknown arm {arm}")
    print(f"{arm}: {time.perf_counter()-t0:.1f}s survivors={n}", flush=True)
