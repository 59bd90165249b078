# scratch: clean single-key A/B — fresh process, pre-ingested dir,
# engine confs + explicit autosize (dir pre-dates the ingest hook),
# warmup + min-of-2, one impl per process (AB_IMPL=arrow|expr).
import os, sys, time, functools
sys.path.insert(0, "/root/repo")
from document_vector_indexer_spark.queries.registry import all_queries
from document_vector_indexer_spark.session import get_spark, autosize_shuffle_partitions, dir_bytes

impl = os.environ["AB_IMPL"]
d = sys.argv[1]
spark = get_spark(app_name="ab-embed")
spark.sparkContext.setLogLevel("ERROR")
total = dir_bytes(d)
print("partitions:", autosize_shuffle_partitions(spark, total))
if impl == "expr":
    from document_vector_indexer_spark.operators import dedup as D
    D.embedding_lsh_blocks = functools.partial(D.embedding_lsh_blocks, impl="expr")
fn = all_queries()["q_dedup_embed"].fn
fn(spark, d).write.format("noop").mode("overwrite").save()
runs = []
for _ in range(2):
    t0 = time.perf_counter()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t0, 2))
print(f"q_dedup_embed impl={impl}: min {min(runs)} runs {runs}")
