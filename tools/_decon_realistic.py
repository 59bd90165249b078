# scratch: r14 — q_decontaminate's realistic constant. The registry
# key's bench side is a corpus FRACTION (the 10% hash split), so its
# broadcast n-gram set grows with the fixture — a fixture artifact.
# The operator's contract is an eval BENCHMARK of thousands of rows;
# this measures contamination_hits at that shape: full corpus as
# train, ~N_BENCH corpus docs as the bench side.
# Usage: _decon_realistic.py DIR [n_bench]
import os, sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from document_vector_indexer_spark.session import get_spark
from document_vector_indexer_spark.operators.trainprep import contamination_hits

d = sys.argv[1]
n_bench = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
spark = get_spark(app_name="decon-realistic")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
n = docs.count()
stride = max(1, n // n_bench)
bench = docs.filter(F.col("doc_id") % stride == 0).select("text")
print(f"corpus={n} bench_rows={bench.count()} (stride {stride})", flush=True)

for run in range(2):
    t0 = time.perf_counter()
    out = contamination_hits(docs, bench, n=5)
    cnt = out.count()
    print(f"run{run}: {time.perf_counter() - t0:.1f} s, {cnt} flagged docs",
          flush=True)
