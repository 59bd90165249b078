# scratch: verdict item 6 "Done" check — DEFAULT engine session, real
# ingest (which auto-sizes shuffle partitions from bytes written), then
# the conf-knee key q_dedup_near warm-timed. No hand-set confs anywhere.
import os, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from document_vector_indexer_spark.io import ingest_engine_layout
from document_vector_indexer_spark.queries.registry import all_queries
from document_vector_indexer_spark.session import get_spark

src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
keys = (sys.argv[2] if len(sys.argv) > 2 else "q_dedup_near").split(",")
spark = get_spark(app_name="engine-conf-probe")   # defaults: cpus partitions, AQE on
spark.sparkContext.setLogLevel("ERROR")
print("partitions before ingest:", spark.conf.get("spark.sql.shuffle.partitions"))
dest = tempfile.mkdtemp(prefix="dvi_probe_")
try:
    t0 = time.perf_counter()
    ingest_engine_layout(spark, src, dest)
    print(f"ingest: {time.perf_counter()-t0:.1f}s; partitions after ingest:",
          spark.conf.get("spark.sql.shuffle.partitions"))
    qs = all_queries()
    for k in keys:
        qs[k].fn(spark, dest).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            qs[k].fn(spark, dest).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(f"{k}: {min(runs):.2f}s (runs: {[round(r,2) for r in runs]})", flush=True)
finally:
    shutil.rmtree(dest, ignore_errors=True)

# A/B the LSH kernel at this scale under the SAME engine confs: re-run
# the embed key with the expression-path blocks (impl="expr").
if os.environ.get("PROBE_AB"):
    import functools
    from document_vector_indexer_spark.operators import dedup as D
    orig = D.embedding_lsh_blocks
    D.embedding_lsh_blocks = functools.partial(orig, impl="expr")
    try:
        spark2 = get_spark(app_name="engine-conf-probe")  # same session
        dest2 = tempfile.mkdtemp(prefix="dvi_probe_")
        try:
            ingest_engine_layout(spark2, src, dest2)
            k = "q_dedup_embed"
            qs = all_queries()
            qs[k].fn(spark2, dest2).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                qs[k].fn(spark2, dest2).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            print(f"{k} [impl=expr]: {min(runs):.2f}s", flush=True)
        finally:
            shutil.rmtree(dest2, ignore_errors=True)
    finally:
        D.embedding_lsh_blocks = orig
