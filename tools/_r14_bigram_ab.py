# scratch (r14): in-session A/B of bigram_logprob_scores shapes.
# A = r13 shape (tokenize above barrier, ctx from raw stream)
# B = A + ctx derived from bg_cnt
# C = tokenize below barrier + explode_outer + uniform filters + B
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from document_vector_indexer_spark.io import ingest_engine_layout, load_table  # noqa: E402
from document_vector_indexer_spark.operators import textanalysis as TA  # noqa: E402
from document_vector_indexer_spark.session import get_spark  # noqa: E402

TX = TA.TX

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ingest_dir = tempfile.mkdtemp(prefix="dvi_r14_bgab_")
spark = get_spark(
    app_name="dvi-r14-bigram-ab",
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
df = load_table(spark, ingest_dir, "documents")
id_col, text_col = "doc_id", "text"


def build(variant):
    if variant == "C":
        words = df.select(
            F.col(id_col), TX.word_tokens(F.col(text_col)).alias("words")
        ).repartition(F.col(id_col))
    else:
        words = df.repartition(F.col(id_col)).select(
            F.col(id_col), TX.word_tokens(F.col(text_col)).alias("words")
        )
    n = F.size("words")
    arr = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at("words", i).alias("w1"),
                F.concat_ws(
                    " ", F.element_at("words", i), F.element_at("words", i + 1)
                ).alias("bg"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,bg:string>>"))
    if variant == "C":
        stream = (
            words.select(id_col, F.explode_outer(arr).alias("b"))
            .filter(F.col("b").isNotNull())
            .select(id_col, "b.w1", "b.bg")
            .filter(F.col("w1").isNotNull() & F.col("bg").isNotNull())
        )
        vocab_src = words.select(F.explode_outer("words").alias("word")).filter(
            F.col("word").isNotNull()
        )
    else:
        stream = words.select(id_col, F.explode(arr).alias("b")).select(
            id_col, "b.w1", "b.bg"
        )
        vocab_src = words.select(F.explode("words").alias("word"))
    bg_cnt = stream.groupBy("w1", "bg").agg(F.count("*").alias("c_ab"))
    if variant == "A":
        ctx_cnt = stream.groupBy("w1").agg(F.count("*").alias("c1"))
    else:
        ctx_cnt = bg_cnt.groupBy("w1").agg(F.sum("c_ab").cast("long").alias("c1"))
    vocab_n = vocab_src.agg(F.countDistinct("word").cast("long").alias("v"))
    weights = (
        bg_cnt.join(ctx_cnt.hint("shuffle_hash"), "w1")
        .join(F.broadcast(vocab_n))
        .select(
            "bg",
            F.floor(
                F.log(
                    (F.col("c_ab") + F.lit(1)).cast("double")
                    / (F.col("c1") + F.col("v")).cast("double")
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("w_b"),
        )
    )
    return (
        stream.join(weights.hint("shuffle_hash"), "bg")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.sum("w_b").alias("s_b"))
        .select(
            id_col,
            "n_bigrams",
            (
                -F.col("s_b").cast("double")
                / (F.col("n_bigrams").cast("double") * F.lit(1e6))
            ).alias("avg_nll2"),
        )
    )


arms = {v: build(v) for v in ("A", "B", "C")}
for v, d in arms.items():
    d.write.format("noop").mode("overwrite").save()
times = {v: [] for v in arms}
for _ in range(7):
    for v, d in arms.items():
        t0 = time.perf_counter()
        d.write.format("noop").mode("overwrite").save()
        times[v].append(time.perf_counter() - t0)
for v, runs in times.items():
    rs = sorted(runs)
    print(
        f"{v}: min {rs[0]:.3f} med {rs[len(rs)//2]:.3f} max {rs[-1]:.3f} "
        f"all {[round(r, 3) for r in runs]}"
    )
import shutil  # noqa: E402

shutil.rmtree(ingest_dir, ignore_errors=True)
