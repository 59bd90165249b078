# scratch: r14 — single-execution sf100 completion sweep. The gini
# lesson: keys that have never run at the third decade can hide ANSI
# overflows (and OOM-class plan problems) the fixtures cannot see.
# Runs each key ONCE (no warmup — completion + a coarse wall is the
# point), reports OK/ERR. Usage: _sf100_once.py DIR k1,k2,...
import sys, time

sys.path.insert(0, "/root/repo")
from document_vector_indexer_spark.queries.registry import all_queries
from document_vector_indexer_spark.session import get_spark

d = sys.argv[1]
keys = sys.argv[2].split(",")
spark = get_spark(app_name="sf100-once")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
for k in keys:
    t0 = time.perf_counter()
    try:
        qs[k].fn(spark, d).write.format("noop").mode("overwrite").save()
        print(f"{k}: OK {time.perf_counter() - t0:.1f} s", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{k}: ERR {msg}", flush=True)
