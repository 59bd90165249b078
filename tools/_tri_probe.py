# scratch: q_triangles r14 probe — stage decomposition + a bitmask
# pair-support prototype (vocab<=64: per-basket bit_or mask, 16-byte
# exchange rows, pairs generated from DISTINCT masks only).
# Usage: _tri_probe.py DIR [variants,csv]   variants default: all
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window

from document_vector_indexer_spark.session import get_spark
from document_vector_indexer_spark.queries.miningops import (
    _brand_baskets, TRI_MIN_SUPPORT_PPM,
)
from document_vector_indexer_spark.operators.mining import (
    _basket_sets, _pair_supports, cooccurrence_triangles,
)

d = sys.argv[1]
want = sys.argv[2].split(",") if len(sys.argv) > 2 else None
spark = get_spark(app_name="tri-probe")
spark.sparkContext.setLogLevel("ERROR")


def mask_pair_supports(bk):
    items = bk.select("item").distinct()
    iid = items.select(
        "item",
        (F.row_number().over(Window.orderBy("item")) - 1).alias("bit"),
    )
    masks = (
        bk.join(F.broadcast(iid), "item")
        .groupBy("basket")
        .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("mask"))
    )
    mcnt = masks.groupBy("mask").agg(F.count("*").cast("long").alias("cnt"))
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
    ia = F.broadcast(iid.select(F.col("item").alias("item_a"), F.col("bit").alias("ba")))
    ib = F.broadcast(iid.select(F.col("item").alias("item_b"), F.col("bit").alias("bb")))
    nb = mcnt.agg(F.sum("cnt").cast("long").alias("n_baskets"))
    return (
        sup.join(ia, "ba").join(ib, "bb").select("item_a", "item_b", "support"),
        nb,
    )


def mask_triangles(bk, ppm):
    sup, nb = mask_pair_supports(bk)
    edges = (
        sup.crossJoin(F.broadcast(nb))
        .filter(
            F.col("support")
            >= F.expr(f"greatest(2L, (n_baskets * {ppm}) DIV 1000000)")
        )
        .select(F.col("item_a").alias("a"), F.col("item_b").alias("b"))
    )
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


def t(name, mk):
    if want and name not in want:
        return
    t0 = time.perf_counter()
    mk().write.format("noop").mode("overwrite").save()
    print(f"{name}: {time.perf_counter() - t0:.1f} s", flush=True)


bk = lambda: _brand_baskets(spark, d)
t("baskets_scan", lambda: bk())
t("sets", lambda: _basket_sets(bk(), "basket", "item"))
t("pairs_setpath", lambda: _pair_supports(_basket_sets(bk(), "basket", "item")))
t("full_setpath", lambda: cooccurrence_triangles(
    bk(), "basket", "item", min_support_frac_ppm=TRI_MIN_SUPPORT_PPM))
t("pairs_maskpath", lambda: mask_pair_supports(bk())[0])
t("full_maskpath", lambda: mask_triangles(bk(), TRI_MIN_SUPPORT_PPM))

# parity: mask path must reproduce the set path exactly
if not want or "parity" in (want or []):
    a = cooccurrence_triangles(
        bk(), "basket", "item", min_support_frac_ppm=TRI_MIN_SUPPORT_PPM
    ).collect()
    b = mask_triangles(bk(), TRI_MIN_SUPPORT_PPM).collect()
    print("parity:", sorted(map(tuple, a)) == sorted(map(tuple, b)),
          len(a), "rows", flush=True)
