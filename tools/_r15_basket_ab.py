# scratch (r15): in-session alternating A/B of the basket_pairs
# bitmask tails —
# OLD (r14): pair supports / item counts / n_baskets as three frames
#            joined back via F.broadcast (each build its own job);
# NEW (r15): ONE tagged explode + one (ba, bb) agg + window maxes over
#            the vocabulary-bounded aggregate (no broadcast builds).
# Alternating warm runs so host drift hits both arms equally.
# Usage: SPARK_GRAFT_SF_DIR=... python tools/_r15_basket_ab.py [rounds]
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from document_vector_indexer_spark.io import ingest_engine_layout  # noqa: E402
from document_vector_indexer_spark.operators.mining import (  # noqa: E402
    _LIFT_PPM_EXPR,
    _bitmask_frames,
    _pair_stats_from_masks,
)
from document_vector_indexer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 9
CONF = os.environ.get("AB_CONF", "bench")  # bench | engine
INGEST = os.environ.get("AB_INGEST_DIR", "")

if CONF == "bench":
    spark = get_spark(
        app_name="dvi-r15-basket-ab",
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
    spark = get_spark(app_name="dvi-r15-basket-ab")
spark.sparkContext.setLogLevel("ERROR")

if INGEST and os.path.isdir(os.path.join(INGEST, "lineitem.parquet")):
    ingest_dir = INGEST
    cleanup = False
else:
    ingest_dir = INGEST or tempfile.mkdtemp(prefix="dvi_r15_ab_")
    ingest_engine_layout(spark, SF_DIR, ingest_dir)
    cleanup = not INGEST

li = spark.read.parquet(os.path.join(ingest_dir, "lineitem.parquet"))
pt = spark.read.parquet(os.path.join(ingest_dir, "part.parquet"))
baskets = li.join(
    F.broadcast(pt.select("p_partkey", "p_brand")),
    li["l_partkey"] == pt["p_partkey"],
).select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))


def _pair_supports_from_masks_r14(vocab, mcnt):
    # the r14 shape, inlined verbatim for the OLD arm
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


def _item_counts_from_masks_r14(vocab, mcnt):
    # the r14 shape, inlined verbatim for the OLD arm
    bits = F.expr("filter(sequence(0, 63), b -> ((mask >> b) & 1) = 1)")
    per_bit = (
        mcnt.select(F.explode(bits).alias("bit"), "cnt")
        .groupBy("bit")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return per_bit.crossJoin(F.broadcast(vocab)).select(
        F.element_at(F.col("items"), F.col("bit") + 1).alias("item"),
        "cnt",
    )


def finish(enriched, top=50):
    return (
        enriched.select(
            "item_a",
            "item_b",
            "support",
            F.expr("(1000000 * support) DIV cnt_a").alias("conf_ab_ppm"),
            F.expr("(1000000 * support) DIV cnt_b").alias("conf_ba_ppm"),
            F.expr(_LIFT_PPM_EXPR).alias("lift_ppm"),
        )
        .orderBy(F.col("support").desc(), "item_a", "item_b")
        .limit(top)
    )


vocab_o, mcnt_o = _bitmask_frames(baskets, "basket", "item")
pair_support = _pair_supports_from_masks_r14(vocab_o, mcnt_o)
item_counts = _item_counts_from_masks_r14(vocab_o, mcnt_o)
n_baskets = mcnt_o.agg(F.sum("cnt").cast("long").alias("n_baskets"))
ca = item_counts.select(F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a"))
cb = item_counts.select(F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b"))
old = finish(
    pair_support.join(F.broadcast(ca), "item_a")
    .join(F.broadcast(cb), "item_b")
    .crossJoin(F.broadcast(n_baskets))
)

vocab_n, mcnt_n = _bitmask_frames(baskets, "basket", "item")
new = finish(_pair_stats_from_masks(vocab_n, mcnt_n))


def _pair_stats_hybrid(vocab, mcnt):
    # arm 3: tagged explode (pairs + a-side markers + total) + ONE
    # global window (attaches n_baskets AND blocks filter pushdown so
    # every consumer shares the agg exchange); cnt_a/cnt_b via
    # broadcast joins whose builds re-run only the <= 2,081-row
    # single-partition reduce (overlapped), never the mask reduce.
    from pyspark.sql import Window

    bits = F.expr("filter(sequence(0, 63), b -> ((mask >> b) & 1) = 1)")
    pair_rows = F.flatten(
        F.transform(
            bits,
            lambda x, i: F.transform(
                F.slice(bits, i + F.lit(2), F.size(bits)),
                lambda y: F.struct(x.alias("ba"), y.alias("bb")),
            ),
        )
    )
    a_rows = F.transform(
        bits, lambda b: F.struct(b.alias("ba"), F.lit(-1).alias("bb"))
    )
    total_row = F.array(F.struct(F.lit(-1).alias("ba"), F.lit(-1).alias("bb")))
    tagged = mcnt.select(
        F.explode(F.concat(pair_rows, a_rows, total_row)).alias("p"), "cnt"
    )
    agg = tagged.groupBy(
        F.col("p.ba").alias("ba"), F.col("p.bb").alias("bb")
    ).agg(F.sum("cnt").cast("long").alias("c"))
    stats0 = agg.withColumn(
        "n_baskets",
        F.max(F.when(F.col("ba") == -1, F.col("c"))).over(
            Window.partitionBy(F.lit(1))
        ),
    )
    pairs = stats0.filter((F.col("ba") >= 0) & (F.col("bb") >= 0))
    items = stats0.filter((F.col("ba") >= 0) & (F.col("bb") == -1))
    ca = items.select(F.col("ba"), F.col("c").alias("cnt_a"))
    cb = items.select(F.col("ba").alias("bb"), F.col("c").alias("cnt_b"))
    return (
        pairs.join(F.broadcast(ca), "ba")
        .join(F.broadcast(cb), "bb")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.element_at(F.col("items"), F.col("ba") + 1).alias("item_a"),
            F.element_at(F.col("items"), F.col("bb") + 1).alias("item_b"),
            F.col("c").alias("support"),
            "cnt_a",
            "cnt_b",
            "n_baskets",
        )
    )


vocab_h, mcnt_h = _bitmask_frames(baskets, "basket", "item")
hyb = finish(_pair_stats_hybrid(vocab_h, mcnt_h))

arms = {"old": old, "new": new, "hyb": hyb}
a = sorted(map(tuple, old.collect()))
for df in (new, hyb):
    assert a == sorted(map(tuple, df.collect())), "ARM VALUE MISMATCH"
print(f"values identical across arms ({len(a)} rows)", flush=True)

for name, df in arms.items():
    spark.sparkContext.setJobDescription(f"r15basket:{name}:warm")
    df.write.format("noop").mode("overwrite").save()

times = {k: [] for k in arms}
for i in range(ROUNDS):
    for name, df in arms.items():
        spark.sparkContext.setJobDescription(f"r15basket:{name}:{i}")
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
