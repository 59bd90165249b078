# scratch (r14): in-session A/B of the ngram pair-exchange shapes —
# OLD: groupBy(id_a,id_b) exchange + window-1 exchange on id_a;
# NEW: repartition(id_a) shared by the aggregate and window 1.
# Alternating warm runs so host drift hits both arms equally.
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from document_vector_indexer_spark.io import (  # noqa: E402
    ingest_engine_layout,
    load_derived,
)
from document_vector_indexer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ingest_dir = tempfile.mkdtemp(prefix="dvi_r14_ab_")
spark = get_spark(
    app_name="dvi-r14-ngram-ab",
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

shingles_df = load_derived(spark, ingest_dir, "documents__shingles3")
block_cols = ("source",)
max_df = 20

exploded = shingles_df.select(*block_cols, "id", F.explode("shingles").alias("shingle"))
buckets = (
    exploded.groupBy(*block_cols, "shingle")
    .agg(F.collect_set("id").alias("ids"))
    .filter(F.size("ids") <= max_df)
)
ids_sorted = F.sort_array(F.col("ids"))
single_arr = F.transform(
    ids_sorted,
    lambda x: F.struct(x.alias("id_a"), F.lit(-1).cast("long").alias("id_b")),
)
pair_arr = F.flatten(
    F.transform(
        F.sequence(F.lit(0), F.size("ids") - 2),
        lambda i: F.transform(
            F.sequence(i + 1, F.size("ids") - 1),
            lambda j: F.struct(
                F.element_at(ids_sorted, (i + 1).cast("int")).alias("id_a"),
                F.element_at(ids_sorted, (j + 1).cast("int")).alias("id_b"),
            ),
        ),
    )
)
emitted = F.when(F.size("ids") >= 2, F.concat(single_arr, pair_arr)).otherwise(
    single_arr
)


def tail(counted):
    is_single = F.col("id_b") == -1
    size_here = F.max(F.when(is_single, F.col("cnt")))
    out = (
        counted.withColumn("n_a", size_here.over(Window.partitionBy("id_a")))
        .withColumn("_k2", F.when(is_single, F.col("id_a")).otherwise(F.col("id_b")))
        .withColumn("n_b", size_here.over(Window.partitionBy("_k2")))
        .filter(~is_single)
        .select(
            "id_a",
            "id_b",
            F.col("cnt").alias("inter"),
            "n_a",
            "n_b",
            (F.col("cnt").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("cnt"))).alias(
                "jaccard"
            ),
        )
    )
    return (
        out.orderBy(F.col("jaccard").desc(), "id_a", "id_b")
        .limit(20)
        .select("id_a", "id_b", "inter", F.round("jaccard", 6).alias("jaccard"))
    )


counted_old = (
    buckets.select(F.explode(emitted).alias("p"))
    .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
    .agg(F.count("*").alias("cnt"))
)
counted_new = (
    buckets.select(F.explode(emitted).alias("p"))
    .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
    .repartition("id_a")
    .groupBy("id_a", "id_b")
    .agg(F.count("*").alias("cnt"))
)
arms = {"old": tail(counted_old), "new": tail(counted_new)}
for name, df in arms.items():
    df.write.format("noop").mode("overwrite").save()  # warm both

times = {k: [] for k in arms}
for _ in range(9):
    for name, df in arms.items():
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times[name].append(time.perf_counter() - t0)
for name, runs in times.items():
    rs = sorted(runs)
    print(
        f"{name}: min {rs[0]:.3f} med {rs[len(rs)//2]:.3f} max {rs[-1]:.3f} "
        f"all {[round(r, 3) for r in runs]}"
    )
import shutil  # noqa: E402

shutil.rmtree(ingest_dir, ignore_errors=True)
