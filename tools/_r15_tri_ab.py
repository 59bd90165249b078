# scratch (r15): in-session alternating A/B of the triangles bitmask
# n_baskets attachment —
# OLD (r14): supports frame + mcnt.agg(sum) joined via F.broadcast
#            (the n_baskets build is its own job);
# NEW (r15): one (-1, -1) total row in the pair explode + a
#            single-partition window max (no broadcast build).
# Usage: [AB_CONF=engine AB_INGEST_DIR=...] python tools/_r15_tri_ab.py [rounds]
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from document_vector_indexer_spark.io import ingest_engine_layout  # noqa: E402
from document_vector_indexer_spark.operators.mining import (  # noqa: E402
    _bitmask_frames,
    _pair_supports_bitmask,
)
from document_vector_indexer_spark.queries.miningops import (  # noqa: E402
    TRI_MIN_SUPPORT_PPM,
)
from document_vector_indexer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 9
CONF = os.environ.get("AB_CONF", "bench")
INGEST = os.environ.get("AB_INGEST_DIR", "")

if CONF == "bench":
    spark = get_spark(
        app_name="dvi-r15-tri-ab",
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
else:
    spark = get_spark(app_name="dvi-r15-tri-ab")
spark.sparkContext.setLogLevel("ERROR")

if INGEST and os.path.isdir(os.path.join(INGEST, "lineitem.parquet")):
    ingest_dir = INGEST
    cleanup = False
else:
    ingest_dir = INGEST or tempfile.mkdtemp(prefix="dvi_r15_tri_")
    ingest_engine_layout(spark, SF_DIR, ingest_dir)
    cleanup = not INGEST

li = spark.read.parquet(os.path.join(ingest_dir, "lineitem.parquet"))
pt = spark.read.parquet(os.path.join(ingest_dir, "part.parquet"))
baskets = li.join(
    F.broadcast(pt.select("p_partkey", "p_brand")),
    li["l_partkey"] == pt["p_partkey"],
).select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))


def _pair_supports_from_masks_r14(vocab, mcnt):
    bits = F.expr("filter(sequence(0, 63), b -> ((mask >> b) & 1) = 1)")
    pairs_arr = F.flatten(
        F.transform(
            bits,
            lambda x, i: F.transform(
                F.slice(bits, i + F.lit(2), F.size(bits)),
                lambda y: F.struct(x.alias("ba"), y.alias("bb")),
            ),
        )
    )
    sup = (
        mcnt.select(F.explode(pairs_arr).alias("p"), "cnt")
        .groupBy(F.col("p.ba").alias("ba"), F.col("p.bb").alias("bb"))
        .agg(F.sum("cnt").cast("long").alias("support"))
    )
    return sup.crossJoin(F.broadcast(vocab)).select(
        F.element_at(F.col("items"), F.col("ba") + 1).alias("item_a"),
        F.element_at(F.col("items"), F.col("bb") + 1).alias("item_b"),
        "support",
    )


def tri_tail(with_total, ppm=TRI_MIN_SUPPORT_PPM):
    edges = with_total.filter(
        F.col("support")
        >= F.expr(f"greatest(2L, (n_baskets * {ppm}) DIV 1000000)")
    ).select(F.col("item_a").alias("a"), F.col("item_b").alias("b"))
    e_bc = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e_ac = edges.select(F.col("a").alias("a2"), F.col("b").alias("c2"))
    tri = (
        edges.join(e_bc, "b")
        .join(e_ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .select("a", "b", "c")
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("item"))
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("n_triangles"))
        .orderBy(F.col("n_triangles").desc(), "item")
    )


vocab_o, mcnt_o = _bitmask_frames(baskets, "basket", "item")
sup_o = _pair_supports_from_masks_r14(vocab_o, mcnt_o)
nb_o = mcnt_o.agg(F.sum("cnt").cast("long").alias("n_baskets"))
old = tri_tail(sup_o.crossJoin(F.broadcast(nb_o)))

new = tri_tail(_pair_supports_bitmask(baskets, "basket", "item"))

arms = {"old": old, "new": new}
a = sorted(map(tuple, old.collect()))
b = sorted(map(tuple, new.collect()))
assert a == b, "ARM VALUE MISMATCH"
print(f"values identical across arms ({len(a)} rows)", flush=True)

for name, df in arms.items():
    spark.sparkContext.setJobDescription(f"r15tri:{name}:warm")
    df.write.format("noop").mode("overwrite").save()

times = {k: [] for k in arms}
for i in range(ROUNDS):
    for name, df in arms.items():
        spark.sparkContext.setJobDescription(f"r15tri:{name}:{i}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times[name].append(time.perf_counter() - t0)
spark.sparkContext.setJobDescription(None)
for name, runs in times.items():
    rs = sorted(runs)
    print(
        f"{name}: min {rs[0]:.3f} med {rs[len(rs)//2]:.3f} max {rs[-1]:.3f} "
        f"all {[round(r, 3) for r in runs]}"
    )
if cleanup:
    import shutil

    shutil.rmtree(ingest_dir, ignore_errors=True)
