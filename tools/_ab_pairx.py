# scratch: clean single-key A/B for embedding_near_dup_pairs'
# pair_exchange knob — fresh process, pre-ingested dir, engine confs +
# explicit autosize, warmup + min-of-2, one variant per process
# (AB_PAIRX=narrow|wide).
import os, sys, time, functools
sys.path.insert(0, "/root/repo")
from document_vector_indexer_spark.queries.registry import all_queries
from document_vector_indexer_spark.session import get_spark, autosize_shuffle_partitions, dir_bytes

variant = os.environ["AB_PAIRX"]
key = os.environ.get("AB_KEY", "q_dedup_embed")
d = sys.argv[1]
spark = get_spark(app_name="ab-pairx")
spark.sparkContext.setLogLevel("ERROR")
total = dir_bytes(d)
print("partitions:", autosize_shuffle_partitions(spark, total))
from document_vector_indexer_spark.operators import dedup as D
D.embedding_near_dup_pairs = functools.partial(
    D.embedding_near_dup_pairs, pair_exchange=variant
)
fn = all_queries()[key].fn
fn(spark, d).write.format("noop").mode("overwrite").save()
runs = []
for _ in range(2):
    t0 = time.perf_counter()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t0, 2))
print(f"{key} pair_exchange={variant}: min {min(runs)} runs {runs}")
