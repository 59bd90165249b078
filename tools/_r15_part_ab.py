# scratch (r15): alternating A/B of spark.sql.shuffle.partitions on the
# bench session/layout — arm values are runtime confs, re-read by every
# fresh QueryExecution, so one session alternates them honestly.
# Motivation: the driver's scaling leg (bench at $SPARK_GRAFT_CPUS=8 vs
# 32) is structurally flat while the bench pins partitions=8; before
# deriving partitions from the env var, price that change at 32 cores.
# Usage: python tools/_r15_part_ab.py [rounds] [parts_a] [parts_b]
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from bench import HEADLINE  # noqa: E402

from document_vector_indexer_spark.io import ingest_engine_layout  # noqa: E402
from document_vector_indexer_spark.queries.registry import all_queries  # noqa: E402
from document_vector_indexer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
PARTS = (
    int(sys.argv[2]) if len(sys.argv) > 2 else 8,
    int(sys.argv[3]) if len(sys.argv) > 3 else 32,
)

ingest_dir = tempfile.mkdtemp(prefix="dvi_r15_part_")
spark = get_spark(
    app_name="dvi-r15-part-ab",
    shuffle_partitions=PARTS[0],
    extra_conf={
        "spark.locality.wait": "0ms",
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        "spark.rdd.compress": "false",
    },
)
spark.conf.set("spark.sql.adaptive.enabled", "false")
spark.sparkContext.setLogLevel("ERROR")
ingest_engine_layout(spark, SF_DIR, ingest_dir)

specs = all_queries()
frames = {k: specs[k].fn(spark, ingest_dir) for k in HEADLINE}
for p in PARTS:  # warm both arms
    spark.conf.set("spark.sql.shuffle.partitions", str(p))
    for df in frames.values():
        df.write.format("noop").mode("overwrite").save()

times = {k: {p: [] for p in PARTS} for k in HEADLINE}
for i in range(ROUNDS):
    for p in PARTS:
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        for k, df in frames.items():
            spark.sparkContext.setJobDescription(f"r15part:{k}:p{p}:{i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[k][p].append(time.perf_counter() - t0)
spark.sparkContext.setJobDescription(None)

tot = {p: 0.0 for p in PARTS}
for k in HEADLINE:
    row = []
    for p in PARTS:
        rs = sorted(times[k][p])
        tot[p] += rs[0]
        row.append(f"p{p} min {rs[0]:.3f} med {rs[len(rs) // 2]:.3f}")
    print(f"{k}: " + " | ".join(row), flush=True)
print("TOTAL_MIN " + " | ".join(f"p{p} {tot[p]:.3f}" for p in PARTS))
import shutil  # noqa: E402

shutil.rmtree(ingest_dir, ignore_errors=True)
