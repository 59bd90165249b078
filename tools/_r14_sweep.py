# scratch (r14): time EVERY registry key at a given sf dir on the
# engine-ingested layout — warm, min-of-2 — to rank optimization
# targets. Usage: _r14_sweep.py [sf_dir]; env SWEEP_SKIP=csv of keys.
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from document_vector_indexer_spark.io import ingest_engine_layout  # noqa: E402
from document_vector_indexer_spark.queries.registry import all_queries  # noqa: E402
from document_vector_indexer_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
skip = set(filter(None, os.environ.get("SWEEP_SKIP", "").split(",")))

ingest_dir = tempfile.mkdtemp(prefix="dvi_r14_sweep_")
spark = get_spark(app_name="dvi-r14-sweep", shuffle_partitions=8)
spark.conf.set("spark.sql.shuffle.partitions", "8")
spark.sparkContext.setLogLevel("ERROR")
ingest_engine_layout(spark, SF_DIR, ingest_dir)

out = {}
for name, spec in all_queries().items():
    if name in skip:
        continue
    try:
        spark.sparkContext.setJobDescription(f"r14sweep:{name}")
        df = spec.fn(spark, ingest_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 3)
        print(f"{name}: {out[name]}", flush=True)
    except Exception as e:  # noqa: BLE001
        out[name] = None
        print(f"{name}: ERR {str(e)[:160]}", flush=True)
    finally:
        spark.sparkContext.setJobDescription(None)

with open("/tmp/r14_sweep.json", "w") as fh:
    json.dump(out, fh, indent=1, sort_keys=True)
ranked = sorted(((v, k) for k, v in out.items() if v), reverse=True)
print("TOP 25:")
for v, k in ranked[:25]:
    print(f"  {k}: {v}")
print("TOTAL", round(sum(v for v, _ in ranked), 1))
import shutil  # noqa: E402

shutil.rmtree(ingest_dir, ignore_errors=True)
