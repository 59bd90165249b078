# scratch: targeted LSH-family ramp on PRE-INGESTED dirs, sweep confs
# (comparable with r10's second-decade numbers) — min-of-2 warm.
import os, sys, time
sys.path.insert(0, "/root/repo")
from document_vector_indexer_spark.queries.registry import all_queries
from document_vector_indexer_spark.session import get_spark

keys = sys.argv[1].split(",")
dirs = sys.argv[2:]
spark = get_spark(app_name="ramp", shuffle_partitions=8, extra_conf={
    "spark.locality.wait": "0ms", "spark.shuffle.compress": "false",
    "spark.shuffle.spill.compress": "false", "spark.rdd.compress": "false"})
spark.conf.set("spark.sql.shuffle.partitions", "8")
spark.conf.set("spark.sql.adaptive.enabled", "false")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
for k in keys:
    row = [k]
    for d in dirs:
        qs[k].fn(spark, d).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            qs[k].fn(spark, d).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        row.append(f"{min(runs):.2f}")
    print(" ".join(row), flush=True)
