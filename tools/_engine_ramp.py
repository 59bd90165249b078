# scratch: engine-conf ramp on a PRE-INGESTED dir — default session +
# explicit autosize from dir bytes (pre-ingested dirs pre-date the
# ingest hook), warmup + min-of-2 per key. Usage: _engine_ramp.py DIR k1,k2,...
import os, sys, time
sys.path.insert(0, "/root/repo")
from document_vector_indexer_spark.queries.registry import all_queries
from document_vector_indexer_spark.session import get_spark, autosize_shuffle_partitions, dir_bytes

d = sys.argv[1]
keys = sys.argv[2].split(",")
runs_per = int(os.environ.get("RAMP_RUNS", "2"))
spark = get_spark(app_name="engine-ramp")
spark.sparkContext.setLogLevel("ERROR")
total = dir_bytes(d)
print("dir:", d, "bytes:", total, "partitions:", autosize_shuffle_partitions(spark, total), flush=True)
qs = all_queries()
for k in keys:
    try:
        qs[k].fn(spark, d).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(runs_per):
            t0 = time.perf_counter()
            qs[k].fn(spark, d).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 2))
        print(f"{k}: min {min(runs)} runs {runs}", flush=True)
    except Exception as e:
        print(f"{k}: ERR {str(e)[:200]}", flush=True)
