# scratch (r14): construct EVERY registry query and report which plans
# contain Python-boundary nodes, split by kind — BatchEvalPython
# (row-at-a-time, the guide-§4 smell) vs ArrowEvalPython/MapInPandas
# (the engine's documented Arrow kernels). Construction-only.
import re
import sys

sys.path.insert(0, "/root/repo")
from document_vector_indexer_spark.queries.registry import all_queries  # noqa: E402
from document_vector_indexer_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
spark = get_spark(app_name="r14-pyscan", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
bad, arrow = [], []
for name, spec in all_queries().items():
    try:
        df = spec.fn(spark, SF)
        p = df._jdf.queryExecution().executedPlan().toString()
    except Exception as e:  # noqa: BLE001
        print(f"{name}: ERR {str(e)[:120]}", flush=True)
        continue
    if re.search(r"BatchEvalPython", p):
        bad.append(name)
    kinds = sorted(set(re.findall(r"ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", p)))
    if kinds:
        arrow.append((name, kinds))
print("BatchEvalPython (row-at-a-time) keys:", bad or "NONE")
print("Arrow-boundary keys:")
for n, k in arrow:
    print(f"  {n}: {k}")
