# scratch (r14): per-query structural diagnostics for the headline set
# on the bench session/layout — formatted plan dump to plans/r14/,
# Exchange/Python-node counts, Spark job+stage counts per noop run,
# and warm repeat timings. Usage: _r14_diag.py [key ...]
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from bench import HEADLINE  # noqa: E402

from document_vector_indexer_spark.io import ingest_engine_layout  # noqa: E402
from document_vector_indexer_spark.queries.registry import all_queries  # noqa: E402
from document_vector_indexer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get("PLAN_OUT", "/root/repo/plans/r14")
SUFFIX = os.environ.get("PLAN_SUFFIX", "_before")
REPEATS = int(os.environ.get("DIAG_REPEATS", "7"))

keys = sys.argv[1:] or HEADLINE

ingest_dir = tempfile.mkdtemp(prefix="dvi_r14_diag_")
spark = get_spark(
    app_name="dvi-r14-diag",
    shuffle_partitions=8,
    extra_conf={
        "spark.locality.wait": "0ms",
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        "spark.rdd.compress": "false",
    },
)
spark.conf.set("spark.sql.shuffle.partitions", "8")
spark.conf.set("spark.sql.adaptive.enabled", "false")
spark.sparkContext.setLogLevel("ERROR")
ingest_engine_layout(spark, SF_DIR, ingest_dir)

os.makedirs(OUT_DIR, exist_ok=True)
specs = all_queries()
tracker = spark.sparkContext.statusTracker()
report = {}
for name in keys:
    df = specs[name].fn(spark, ingest_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    with open(os.path.join(OUT_DIR, f"{name}{SUFFIX}.txt"), "w") as fh:
        fh.write(plan)
    n_exchange = len(re.findall(r"\bExchange\b", plan.split("\n\n")[0]))
    n_bcast = len(re.findall(r"BroadcastExchange", plan.split("\n\n")[0]))
    n_py = len(
        re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow", plan)
    )
    # warm once
    spark.sparkContext.setJobDescription(f"r14diag:{name}:warm")
    df.write.format("noop").mode("overwrite").save()
    jobs0 = max(tracker.getJobIdsForGroup(None), default=-1)
    stage0 = max(
        [s for j in tracker.getJobIdsForGroup(None)
         for s in (tracker.getJobInfo(j).stageIds if tracker.getJobInfo(j) else [])],
        default=-1,
    )
    spark.sparkContext.setJobDescription(f"r14diag:{name}:counted")
    df.write.format("noop").mode("overwrite").save()
    jobs1 = [j for j in tracker.getJobIdsForGroup(None) if j > jobs0]
    stages = sorted(
        {
            s
            for j in jobs1
            for s in (tracker.getJobInfo(j).stageIds if tracker.getJobInfo(j) else [])
            if s > stage0
        }
    )
    runs = []
    spark.sparkContext.setJobDescription(f"r14diag:{name}:timed")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    runs_s = sorted(runs)
    report[name] = {
        "exchanges": n_exchange,
        "broadcasts": n_bcast,
        "py_nodes": n_py,
        "jobs_per_run": len(jobs1),
        "stages_per_run": len(stages),
        "min": round(runs_s[0], 3),
        "med": round(runs_s[len(runs_s) // 2], 3),
        "max": round(runs_s[-1], 3),
    }
    print(name, json.dumps(report[name]), flush=True)

print("TOTAL_MIN", round(sum(r["min"] for r in report.values()), 3))
print("TOTAL_MED", round(sum(r["med"] for r in report.values()), 3))
import shutil  # noqa: E402

shutil.rmtree(ingest_dir, ignore_errors=True)
