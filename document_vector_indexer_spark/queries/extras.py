"""Extra operator coverage: statistical aggregates, exact percentiles,
higher-order exists/forall, TPC-H composite showcases (Q3/Q5 shapes),
and a sink round-trip that runs the full pipeline through the parquet
sink and oracle-checks what comes back off disk.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from document_vector_indexer_spark.io import load_table
from document_vector_indexer_spark.queries.base import QuerySpec
from document_vector_indexer_spark.queries.relational import SQL_DSUM, dsum
from document_vector_indexer_spark.queries.textops import SQL_CLEAN


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/correlation. Rounded: accumulation order differs
    per engine at ~1e-12 relative; stddev/corr values are off-grid so
    round(4)/round(6) are boundary-safe (unlike money — relational.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    # `+ 0.0` normalizes IEEE negative zero: rounding a tiny negative
    # statistic yields -0.0 in one engine and 0.0 in the other — equal
    # by ==, but distinct once stringified/hashed.
    # Estimator alignment: Spark's skewness() is the population g1;
    # DuckDB's is the bias-corrected sample G1 = g1*sqrt(n(n-1))/(n-2).
    # Apply the correction explicitly (diverges visibly at small n).
    n = F.count("*")
    g1_to_G1 = F.sqrt(n.cast("double") * (n - 1)) / (n - 2)
    return li.groupBy("l_returnflag").agg(
        (F.round(F.stddev_samp("l_extendedprice"), 4) + 0.0).alias("sd_price"),
        (F.round(F.var_samp("l_quantity"), 4) + 0.0).alias("var_qty"),
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + 0.0).alias("corr_qty_price"),
        (F.round(F.covar_samp("l_discount", "l_tax"), 6) + 0.0).alias("covar_disc_tax"),
        (F.round(F.skewness("l_extendedprice") * g1_to_G1, 4) + 0.0).alias("skew_price"),
    )


SQL_AGG_STATS = """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) + 0.0 AS sd_price,
       round(var_samp(l_quantity), 4) + 0.0 AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qty_price,
       round(covar_samp(l_discount, l_tax), 6) + 0.0 AS covar_disc_tax,
       round(skewness(l_extendedprice), 4) + 0.0 AS skew_price
FROM lineitem GROUP BY l_returnflag
"""


def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``) + an approx-percentile quality contract (the
    sketch differs per engine, its 1%-of-exact bound must not)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        # 5% bound: at ~300 rows/group the sketches' error exceeds 1%
        # in one engine but not the other — the contract must hold at
        # every scale factor the driver might probe
        (
            F.abs(
                F.percentile_approx("o_totalprice", F.lit(0.5))
                - F.percentile("o_totalprice", F.lit(0.5))
            )
            <= 0.05 * F.percentile("o_totalprice", F.lit(0.5))
        ).alias("approx_within_5pct"),
    )


SQL_AGG_PERCENTILE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       abs(approx_quantile(o_totalprice, 0.5) - quantile_cont(o_totalprice, 0.5))
         <= 0.05 * quantile_cont(o_totalprice, 0.5) AS approx_within_5pct
FROM orders GROUP BY o_orderpriority
"""


def q_hof_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exists / forall / array_position / array_max over tokenized text."""
    from document_vector_indexer_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    words = TX.word_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.exists(words, lambda w: F.length(w) > 8).alias("has_long_word"),
        F.forall(words, lambda w: F.length(w) < 15).alias("all_under_15"),
        F.array_position(words, "spark").cast("long").alias("first_spark_pos"),
        F.array_max(F.transform(words, lambda w: F.length(w))).cast("int").alias(
            "max_word_len"
        ),
    )


SQL_HOF_EXISTS = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                                        '\\s+'), x -> x <> '') AS words
  FROM documents
)
SELECT doc_id,
       len(list_filter(words, x -> length(x) > 8)) > 0 AS has_long_word,
       len(list_filter(words, x -> length(x) >= 15)) = 0 AS all_under_15,
       CAST(coalesce(list_position(words, 'spark'), 0) AS BIGINT) AS first_spark_pos,
       CAST(list_max(list_transform(words, x -> length(x))) AS INTEGER) AS max_word_len
FROM w
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): 3-way join, selective
    filters on both fact sides, revenue agg, top-10. Catalyst order:
    broadcast customer filter into orders, shuffle join lineitem."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"), "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): 6-table star join where
    supplier and customer must share a nation; dims broadcast."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    revenue = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): EXISTS semi-join from
    orders into lineitem, then priority counts.

    The semi-join's lineitem side is MERGE-pinned (r10): left
    unhinted, Catalyst broadcasts the projected l_orderkey column — a
    build side that GROWS WITH THE CORPUS (the one super-linear key in
    the r10 one-decade sweep: 0.23 s -> 4.4 s, ~1.9 s of it the driver
    building a 3.6 M-key hash relation at ~sf1). A corpus-derived
    frame must never be a broadcast build (shuffle beats it 4.7x at
    ~sf1), and of the shuffle strategies only sort-merge survives
    arbitrary per-partition build sizes (forced shuffle_hash builds
    cannot spill — the q_tpch_q21-at-~sf10 lesson). Plan-pinned in
    tests/test_plans.py.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    late = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_linenumber") >= 3  # proxy for the commit/receipt-lag predicate
    )
    return (
        orders.join(
            late.hint("merge"), orders.o_orderkey == late.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_linenumber >= 3)
GROUP BY o_orderpriority
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned items): 4-way join, revenue agg per
    customer, top-20 by lost revenue."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    rev_u = F.rint(F.col("l_extendedprice") * 100).cast("long") * F.rint(
        (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev_u).cast("double") / 1e4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, n_name,
       CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     * CAST(round((1.0 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
            AS DOUBLE) / 1e4 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): pure filter + agg —
    every predicate reaches the parquet scan, zero joins."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.rint(F.col("l_extendedprice") * 100).cast("long") * F.rint(
        F.col("l_discount") * 100
    ).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg((F.sum(rev).cast("double") / 1e4).alias("revenue"),
             F.count("*").alias("n_items"))
    )


SQL_TPCH_Q6 = """
SELECT CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     * CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
            AS DOUBLE) / 1e4 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional CASE aggregation by group."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count_if(high).alias("high_line_count"),
            F.count_if(~high).alias("low_line_count"),
        )
    )


SQL_TPCH_Q12 = """
SELECT l_returnflag,
       count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
       count(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue %): ratio of two conditional
    fixed-point sums — exact in both engines, single division at the
    end."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev_u = F.rint(F.col("l_extendedprice") * 100).cast("long") * F.rint(
        (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    promo = F.col("p_type").like("PROMO%")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.agg(
        (
            F.sum(F.when(promo, rev_u).otherwise(F.lit(0))).cast("double")
            * 100.0
            / F.sum(rev_u).cast("double")
        ).alias("promo_revenue_pct")
    )


SQL_TPCH_Q14 = """
SELECT CAST(CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN
                 CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * CAST(round((1.0 - l_discount) * 100, 0) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS DOUBLE) * 100.0
       / CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * CAST(round((1.0 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
              AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): group-by HAVING as a
    semi-join filter, then a 3-way join and top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    # l_quantity is integral-valued (TPC-H: 1..50 stored as double), so a
    # direct cast is exact in both engines — no dependence on Spark's
    # half-to-even rint vs DuckDB's half-away round (round-2 ADVICE).
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


SQL_TPCH_Q18 = """
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
         AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250
)
SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): disjunction of conjunct
    groups across both join sides — the classic test that OR-of-ANDs
    predicates still partially push down and the join stays equi.
    (Adapted to this corpus's part columns: brand/size/type.)"""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_type") == "ECONOMY")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("l_quantity") >= 25)
        )
    )
    rev_u = F.rint(F.col("l_extendedprice") * 100).cast("long") * F.rint(
        (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    return j.filter(cond).agg(
        (F.sum(rev_u).cast("double") / 1e4).alias("revenue"),
        F.count("*").alias("n_items"),
    )


SQL_TPCH_Q19 = """
SELECT CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     * CAST(round((1.0 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT)
            AS DOUBLE) / 1e4 AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_type = 'ECONOMY' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#3' AND l_quantity >= 25)
"""


_SINK_GEOM = dict(chunk_size=180, overlap=30)


def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline through the parquet sink and back: index the
    documents table (clean -> fixed chunk -> embed), write with the
    idempotent partitioned sink, read the files back, aggregate. The
    oracle replays the text semantics in SQL — so this checks the sink
    round-trips data losslessly, not just that it runs."""
    from document_vector_indexer_spark.plans.pipeline import (
        index_documents,
        write_chunk_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks = index_documents(
        docs, strategy="fixed", embedding_dim=16, **_SINK_GEOM
    )
    path = os.path.join(
        tempfile.gettempdir(), f"dvi_sink_roundtrip_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    write_chunk_table(chunks, path)
    back = spark.read.parquet(path)
    return back.groupBy("split_strategy").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.length("chunk_text")).cast("long").alias("total_chars"),
        F.countDistinct("filename").alias("n_files"),
        F.max("id").alias("max_id"),
        F.count_if(F.size("embedding") == 16).alias("n_dim_ok"),
    )


SQL_SINK_ROUNDTRIP = f"""
WITH cleaned AS (
  SELECT doc_id, {SQL_CLEAN.format(col='text')} AS t FROM documents
),
wins AS (
  SELECT doc_id, t,
         unnest(range(0, (CASE WHEN length(t) <= 180 THEN 0
                ELSE CAST(ceil((length(t) - 180) / 150.0) AS BIGINT)
                END) + 1)) * 150 AS win_start
  FROM cleaned
),
chunks AS (
  SELECT * FROM (
    SELECT doc_id,
           regexp_replace(substr(t, win_start + 1, 180), '^\\s+|\\s+$', '', 'g') AS chunk_text
    FROM wins
  ) WHERE chunk_text <> ''
)
SELECT 'fixed' AS split_strategy,
       count(*) AS n_chunks,
       CAST(sum(length(chunk_text)) AS BIGINT) AS total_chars,
       count(DISTINCT doc_id) AS n_files,
       count(*) AS max_id,
       count(*) AS n_dim_ok
FROM chunks
"""


def q_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous indexing end-to-end as a DRIVER-CHECKED key: stage
    the first 120 documents as a JSONL drop directory, run the
    availableNow Structured Streaming ingest (streaming/ingest.py:
    checkpointed file discovery -> clean -> chunk -> mapInPandas embed
    -> idempotent foreachBatch sink), read the chunk table back and
    aggregate. The oracle replays the clean+fixed-chunk semantics in
    SQL (the q_sink_roundtrip fragment), so this proves the STREAMING
    path produces exactly the batch pipeline's chunks — not merely
    that a query ran. Staging is wiped per call so re-runs reprocess
    deterministically (the driver's rerun-safety check)."""
    import shutil

    from document_vector_indexer_spark.streaming.ingest import (
        start_stream_ingest,
    )

    base = os.path.join(
        tempfile.gettempdir(),
        f"dvi_stream_ingest_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    in_dir = os.path.join(base, "incoming")
    out = os.path.join(base, "chunks")
    ckpt = os.path.join(base, "ckpt")
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 120)
        .select(
            F.concat(F.lit("doc_"), F.col("doc_id")).alias("filename"), "text"
        )
    )
    docs.coalesce(1).write.json(in_dir)
    q = start_stream_ingest(
        spark, in_dir, out, ckpt,
        strategy="fixed", embedding_dim=16, **_SINK_GEOM,
    )
    q.awaitTermination(300)
    back = spark.read.parquet(out)
    return back.groupBy("split_strategy").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.length("chunk_text")).cast("long").alias("total_chars"),
        F.countDistinct("filename").alias("n_files"),
        F.count_if(F.size("embedding") == 16).alias("n_dim_ok"),
    )


SQL_STREAM_INGEST = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 120),
cleaned AS (
  SELECT doc_id, {{clean}} AS t FROM docs
),
wins AS (
  SELECT doc_id, t,
         unnest(range(0, (CASE WHEN length(t) <= 180 THEN 0
                ELSE CAST(ceil((length(t) - 180) / 150.0) AS BIGINT)
                END) + 1)) * 150 AS win_start
  FROM cleaned
),
chunks AS (
  SELECT * FROM (
    SELECT doc_id,
           regexp_replace(substr(t, win_start + 1, 180), '^\\s+|\\s+$', '', 'g') AS chunk_text
    FROM wins
  ) WHERE chunk_text <> ''
)
SELECT 'fixed' AS split_strategy,
       count(*) AS n_chunks,
       CAST(sum(length(chunk_text)) AS BIGINT) AS total_chars,
       count(DISTINCT doc_id) AS n_files,
       count(*) AS n_dim_ok
FROM chunks
""".format(clean=SQL_CLEAN.format(col="text"))


def q_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join through the deterministic salting operator — result
    must equal the plain join (the oracle IS the plain join)."""
    from document_vector_indexer_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    weights = ev.select("event_type").distinct().withColumn(
        "weight", F.length("event_type").cast("long")
    )
    joined = salted_join(ev, weights, on=["event_type"], stable_col="event_id")
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("weight").cast("long").alias("total_weight"),
    )


SQL_JOIN_SKEW = """
SELECT e.event_type, count(*) AS n,
       CAST(sum(length(w.event_type)) AS BIGINT) AS total_weight
FROM events e JOIN (SELECT DISTINCT event_type FROM events) w
  ON e.event_type = w.event_type
GROUP BY e.event_type
"""


def q_agg_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation — equals the plain group-by."""
    from document_vector_indexer_spark.operators.skew import two_phase_agg
    from document_vector_indexer_spark.queries.relational import fsum

    ev = load_table(spark, sf_dir, "events")
    out = two_phase_agg(
        ev,
        ["event_type"],
        {
            "n": F.count("*"),
            "total_cents": F.sum(F.rint(F.col("value") * 100).cast("long")),
        },
        stable_col="event_id",
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.col("total_cents").cast("double") / 100.0).alias("total_value"),
    )


SQL_AGG_TWO_PHASE = """
SELECT event_type, count(*) AS n,
       CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
         / 100.0 AS total_value
FROM events GROUP BY event_type
"""


def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per user, sum of event
    value over the trailing hour by *timestamp value* — peers at the
    same second share the frame, so the result is tie-order-proof."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").withColumn(
        "es", F.unix_timestamp("ts")
    ).withColumn("cents", F.rint(F.col("value") * 100).cast("long"))
    w = Window.partitionBy("user_id").orderBy("es").rangeBetween(-3600, 0)
    return ev.select(
        "event_id",
        "user_id",
        (F.sum("cents").over(w).cast("double") / 100.0).alias("trailing_1h_value"),
        F.count("*").over(w).cast("long").alias("trailing_1h_events"),
    )


SQL_WIN_RANGE_FRAME = """
WITH e AS (
  SELECT event_id, user_id,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(cents) OVER w AS DOUBLE) / 100.0 AS trailing_1h_value,
       count(*) OVER w AS trailing_1h_events
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY es
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic per doc (operators/textanalysis)."""
    from document_vector_indexer_spark.operators.textanalysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


SQL_QUALITY_SCORE = """
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                                        '\\s+'), x -> x <> '') AS words
  FROM documents
),
f AS (
  SELECT doc_id,
         CASE WHEN length(text) >= 100 THEN 1.0 ELSE 0.0 END AS length_ok,
         CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS ttr,
         CAST(len(list_filter(words,
              x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
           / len(words) AS stop_ratio
  FROM w
)
SELECT doc_id,
       0.4 * length_ok + 0.3 * least(ttr * 2, 1.0) + 0.3 * least(stop_ratio * 5, 1.0)
         AS quality
FROM f
"""


def q_source_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-document source end-to-end: materialize the first 50 docs
    as .txt files, scan them with the distributed binaryFile source,
    extract executor-side, aggregate. Oracle checks byte-lossless
    extraction against the original table."""
    import tempfile

    from document_vector_indexer_spark.sources.binary_docs import read_documents

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    # Fixture staging is DISTRIBUTED: each executor task writes its own
    # rows as files (atomic tmp+rename; re-runs/task retries are
    # idempotent). No row passes through the driver. The `_STAGED`
    # marker (leading underscore => invisible to Spark file listings)
    # skips re-staging on warm calls. Executors write and the driver
    # reads the SAME directory, so the stage root must be visible to
    # both: in local mode the process-local tempdir qualifies; on a
    # real cluster it must be a shared filesystem supplied via
    # $DVI_STAGE_DIR (round-2 ADVICE — tempfile.gettempdir() on a
    # cluster would scatter files across executor-local disks).
    stage_root = os.environ.get("DVI_STAGE_DIR")
    if stage_root is None:
        master = spark.conf.get("spark.master", "")
        if not master.startswith("local"):
            raise RuntimeError(
                "q_source_binary stages fixture files from executors; on a "
                f"non-local master ({master!r}) set $DVI_STAGE_DIR to a "
                "shared filesystem path visible to driver and executors"
            )
        stage_root = tempfile.gettempdir()
    stage = os.path.join(
        stage_root,
        f"dvi_source_binary_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    marker = os.path.join(stage, "_STAGED")
    if not os.path.exists(marker):
        os.makedirs(stage, exist_ok=True)

        def dump(rows) -> None:
            for r in rows:
                tmp = os.path.join(stage, f"_doc_{r.doc_id}.tmp")
                with open(tmp, "w") as f:
                    f.write(r.text)
                os.replace(tmp, os.path.join(stage, f"doc_{r.doc_id}.txt"))

        docs.select("doc_id", "text").foreachPartition(dump)
        # failed/retried tasks may leave behind orphaned tmp files —
        # sweep them once staging has fully succeeded
        for leftover in os.listdir(stage):
            if leftover.startswith("_doc_") and leftover.endswith(".tmp"):
                os.remove(os.path.join(stage, leftover))
        open(marker, "w").close()
    got = read_documents(spark, stage)
    return got.agg(
        F.count("*").alias("n_files"),
        F.count_if(F.col("ok")).alias("n_ok"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
    )


SQL_SOURCE_BINARY = """
SELECT count(*) AS n_files, count(*) AS n_ok,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS BIGINT) AS total_bytes
FROM documents WHERE doc_id < 50
"""


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end (rows-only: fake decode kernels):
    synthesize media rows from documents, extract image features and
    sample video frames, aggregate."""
    from document_vector_indexer_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(16).alias("width"),
        F.lit(12).alias("height"),
        F.when(F.col("doc_id") % 2 == 1, F.lit(2500)).cast("long").alias("duration_ms"),
    )
    feats = MM.image_features(media).agg(
        F.count("*").alias("n_images"),
        F.count_if(F.col("thumbnail").isNotNull()).alias("n_decoded"),
    )
    frames = MM.frame_sample(media).agg(F.count("*").alias("n_frames"))
    return feats.crossJoin(frames)


_PINNED_IMG_N = 48


def _pinned_image(doc_id: int) -> "tuple[int, int, list[int], str]":
    """(width, height, grayscale pixels, format) of the planted image
    for ``doc_id`` — pure arithmetic shared by the Spark encode stage
    and the oracle literal generator (single source of truth, the
    q_embed_portable pattern). Dims vary per id so the oracle pins the
    DECODED geometry, not a constant."""
    w = 8 + doc_id % 5
    h = 6 + doc_id % 4
    px = [
        (doc_id * 7 + y * 31 + x * 3) % 256
        for y in range(h)
        for x in range(w)
    ]
    return w, h, px, ("png", "bmp", "pnm")[doc_id % 3]


def q_multimodal_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled sibling of q_multimodal (r9 VERDICT item 3): planted
    grayscale images ENCODED on executors (PNG with per-id filter types
    0-4, 24-bit BMP, binary P5), DECODED back by the stdlib tier
    (sources/miniimage.py), reduced to exact integers — sniffed format,
    decoded dims, pixel-value total. DuckDB mirrors the same pure
    arithmetic as literals. Grayscale is planted r=g=b so BMP's luma
    conversion is the identity and every value survives bit-exactly.
    Both stages are mapInPandas over the documents scan — per-partition
    Arrow batches, no media blob through the driver."""
    import pandas as pd

    from document_vector_indexer_spark.operators import multimodal as MM

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _PINNED_IMG_N)
        .select("doc_id")
    )
    media_cols = [f.name for f in MM.MEDIA_SCHEMA.fields]

    def encode(batches):
        from document_vector_indexer_spark.sources import miniimage

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h, px, fmt = _pinned_image(did)
                if fmt == "png":
                    content = miniimage.encode_png(
                        w, h, px, color_type=0, filter_type=did % 5
                    )
                elif fmt == "bmp":
                    content = miniimage.encode_bmp(
                        w, h, [(v, v, v) for v in px]
                    )
                else:
                    content = miniimage.encode_pnm(w, h, px, gray=True)
                rows.append((did, "image", content, None, None, None, None))
            yield pd.DataFrame(rows, columns=media_cols)

    media = docs.mapInPandas(encode, schema=MM.MEDIA_SCHEMA)
    stats = MM.image_stats(media, backend="stdlib")
    return stats.select(
        "media_id",
        "fmt",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "px_total",
    )


def _sql_multimodal_pinned() -> str:
    """Oracle generated from the SAME _pinned_image arithmetic, joined
    against documents so the row set is keyed to the actual table (a
    missing doc_id shrinks both sides identically)."""
    values = ", ".join(
        "({d}, '{f}', {w}, {h}, {t})".format(
            d=did, f=fmt, w=w, h=h, t=sum(px)
        )
        for did, (w, h, px, fmt) in (
            (i, _pinned_image(i)) for i in range(_PINNED_IMG_N)
        )
    )
    return f"""
SELECT CAST(d.doc_id AS BIGINT) AS media_id, v.fmt,
       CAST(v.w AS BIGINT) AS width, CAST(v.h AS BIGINT) AS height,
       CAST(v.t AS BIGINT) AS px_total
FROM documents d
JOIN (VALUES {values}) AS v(media_id, fmt, w, h, t)
  ON v.media_id = d.doc_id
"""


SQL_MULTIMODAL_PINNED = _sql_multimodal_pinned()


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulated without Delta (guide's CDC pattern): a base
    snapshot (orders before 2000) upserted with a change set (orders
    from 2000 on) via full outer join + coalesce merge. The oracle is
    the semantic definition — the aggregate over all orders — so the
    merge path must reproduce it exactly."""
    from document_vector_indexer_spark.queries.relational import TS_FMT, fsum

    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("2000-01-01").cast("timestamp")

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.rint(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
            F.max("o_orderdate").alias("last_dt"),
        )

    base = snap(orders.filter(F.col("o_orderdate") < cutoff))
    updates = snap(orders.filter(F.col("o_orderdate") >= cutoff))
    b = base.select(
        F.col("o_custkey").alias("k"),
        F.col("n_orders").alias("b_n"),
        F.col("cents").alias("b_c"),
        F.col("last_dt").alias("b_dt"),
    )
    u = updates.select(
        F.col("o_custkey").alias("k"),
        F.col("n_orders").alias("u_n"),
        F.col("cents").alias("u_c"),
        F.col("last_dt").alias("u_dt"),
    )
    merged = b.join(u, "k", "full").select(
        F.col("k").alias("o_custkey"),
        (F.coalesce("b_n", F.lit(0)) + F.coalesce("u_n", F.lit(0))).alias("n_orders"),
        (
            (F.coalesce("b_c", F.lit(0)) + F.coalesce("u_c", F.lit(0))).cast("double")
            / 100.0
        ).alias("total_price"),
        F.date_format(F.greatest("b_dt", "u_dt"), TS_FMT).alias("last_order"),
    )
    return merged


SQL_MERGE_UPSERT = """
SELECT o_custkey, count(*) AS n_orders,
       CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
         / 100.0 AS total_price,
       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_order
FROM orders GROUP BY o_custkey
"""


def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar surface (coalesce/nullif/nvl2/nanvl) over a
    left join that actually produces NULLs."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 280000.0)
    j = cust.join(big, cust.c_custkey == big.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce("o_orderkey", F.lit(-1)).alias("order_or_default"),
        F.nullif("o_orderstatus", F.lit("O")).alias("status_unless_open"),
        F.when(F.col("o_orderkey").isNotNull(), F.lit("has_big"))
        .otherwise(F.lit("none"))
        .alias("nvl2_equiv"),
        F.isnull("o_totalprice").alias("is_missing"),
        F.coalesce(F.col("o_totalprice"), F.col("c_acctbal")).alias("price_or_bal"),
    )


SQL_NULL_FUNCS = """
SELECT c_custkey,
       coalesce(o_orderkey, -1) AS order_or_default,
       nullif(o_orderstatus, 'O') AS status_unless_open,
       CASE WHEN o_orderkey IS NOT NULL THEN 'has_big' ELSE 'none' END AS nvl2_equiv,
       o_totalprice IS NULL AS is_missing,
       coalesce(o_totalprice, c_acctbal) AS price_or_bal
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 280000.0) o
  ON c_custkey = o_custkey
"""


def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: every/any/count_if per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.every(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.some(F.col("l_discount") >= 0.1).alias("any_max_discount"),
        F.count_if(F.col("l_tax") == 0.0).alias("n_tax_free"),
    )


SQL_AGG_BOOL = """
SELECT l_returnflag,
       bool_and(l_quantity > 0) AS all_positive_qty,
       bool_or(l_discount >= 0.1) AS any_max_discount,
       count(*) FILTER (l_tax = 0.0) AS n_tax_free
FROM lineitem GROUP BY l_returnflag
"""


def q_date_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar generation (sequence + explode) left-joined to data:
    every month in the order range appears, including empty ones."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    months = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("month_start")
    ).select(F.date_format("month_start", "yyyy-MM").alias("month"))
    per_month = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("n_orders"))
    return months.join(per_month, "month", "left").select(
        "month", F.coalesce("n_orders", F.lit(0)).alias("n_orders")
    )


SQL_DATE_SERIES = """
WITH bounds AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo,
         date_trunc('month', max(o_orderdate)) AS hi
  FROM orders
),
months AS (
  SELECT strftime(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)), '%Y-%m') AS month
  FROM bounds
),
per_month AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT m.month, coalesce(p.n_orders, 0) AS n_orders
FROM months m LEFT JOIN per_month p ON m.month = p.month
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-hygiene scrubbing: inject deterministic PII-shaped spans
    (the corpus has none), redact, verify counts + scrubbed text."""
    from document_vector_indexer_spark.operators.textanalysis import (
        redact,
        redaction_counts,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.replace(
            F.replace(F.col("text"), F.lit(" key "), F.lit(" bob@example.com ")),
            F.lit(" row "),
            F.lit(" 10.0.0.1 "),
        ),
    )
    counts = redaction_counts(F.col("text"))
    return docs.select(
        "doc_id",
        counts["EMAIL"].alias("n_email"),
        counts["IPV4"].alias("n_ip"),
        F.md5(redact(F.col("text")).cast("binary")).alias("redacted_md5"),
    )


SQL_REDACT_PII = r"""
WITH injected AS (
  SELECT doc_id,
         replace(replace(text, ' key ', ' bob@example.com '),
                 ' row ', ' 10.0.0.1 ') AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text,
            '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
       md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
            '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
            '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IPV4]', 'g'),
            '\+?[0-9][0-9()\-\s]{7,}[0-9]', '[PHONE]', 'g')) AS redacted_md5
FROM injected
"""


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column dataset profile (nulls/cardinality/ranges) — ingest
    step one for any training-data pipeline."""
    from document_vector_indexer_spark.operators.profiling import profile

    orders = load_table(spark, sf_dir, "orders")
    return profile(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )


SQL_PROFILE = """
SELECT * FROM (
  SELECT 'o_orderkey' AS column, count(*) AS n_rows,
         count(*) FILTER (o_orderkey IS NULL) AS n_nulls,
         count(DISTINCT o_orderkey) AS n_distinct,
         CAST(min(o_orderkey) AS VARCHAR) AS min_str,
         CAST(max(o_orderkey) AS VARCHAR) AS max_str FROM orders
  UNION ALL
  SELECT 'o_custkey', count(*), count(*) FILTER (o_custkey IS NULL),
         count(DISTINCT o_custkey),
         CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_orderstatus', count(*), count(*) FILTER (o_orderstatus IS NULL),
         count(DISTINCT o_orderstatus),
         min(o_orderstatus), max(o_orderstatus) FROM orders
  UNION ALL
  SELECT 'o_totalprice', count(*), count(*) FILTER (o_totalprice IS NULL),
         count(DISTINCT o_totalprice),
         CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_orderpriority', count(*), count(*) FILTER (o_orderpriority IS NULL),
         count(DISTINCT o_orderpriority),
         min(o_orderpriority), max(o_orderpriority) FROM orders
)
"""


# One SQL text, two engines: the passthrough surface restricts itself
# to the ANSI intersection both dialects execute identically — exact
# integer money math (round() on the cent grid is mode-proof), no
# engine-specific date/string functions. This is the reference's user
# journey (raw SQL against the store) carried over: spark.sql() over
# registered views IS the engine's SQL interface.
SQL_PASSTHROUGH = """
SELECT n_name, c_mktsegment, n_customers, total_bal
FROM (
  SELECT n_name, c_mktsegment, count(*) AS n_customers,
         CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) / 100
           AS total_bal,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY count(*) DESC, c_mktsegment) AS rk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, c_mktsegment
) AS t
WHERE rk = 1
"""


def q_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-SQL passthrough: the oracle string itself is executed by
    ``spark.sql`` over registered views — proving users can bring raw
    SQL (the way they query the reference's Postgres store) and get
    the same Catalyst plans the DataFrame API produces."""
    from document_vector_indexer_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_PASSTHROUGH)


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel with a 12-hour stage window over the
    events stream: per user, the earliest view, the earliest click
    strictly after that view AND within 12 hours of it, the earliest
    purchase strictly after that click and within 12 hours — the
    classic product-analytics shape. The window is what makes the
    check non-vacuous on the synthetic stream (sf0.01: 150 users, 150
    view, 37 click-convert, 7 purchase-convert — real drop-off, not
    everyone-passes). Every stage is a user-keyed aggregation or join
    (stage frames arrive pre-partitioned by user from their own aggs),
    timestamp comparisons only — no float, fully deterministic."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    # Stage joins are merge-pinned (r11 raw-layout audit): one side of
    # each is a RAW event-type slice of the corpus whose narrow
    # projection Catalyst broadcast at ~sf1 (the q_tpch_q4 class); the
    # other (per-user stage frame) is corpus-proportional too, so merge
    # per the r10 durable pin rule. The final left-joins below stay
    # unhinted — every side there is aggregate-bounded and the
    # size-estimate flip is the adaptive behavior we want.
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views.hint("merge"), "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 12 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks.hint("merge"), "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 12 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    total = ev.select("user_id").distinct()
    return (
        total.join(views, "user_id", "left")
        .join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .agg(
            F.count("*").alias("n_users"),
            F.count("t_view").alias("n_view"),
            F.count("t_click").alias("n_click_after_view"),
            F.count("t_purchase").alias("n_purchase_after_click"),
        )
    )


SQL_FUNNEL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
    AND e.ts <= v.t_view + INTERVAL '12 hours'
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    AND e.ts <= c.t_click + INTERVAL '12 hours'
  GROUP BY e.user_id
),
u AS (SELECT DISTINCT user_id FROM events)
SELECT count(*) AS n_users,
       count(v.t_view) AS n_view,
       count(c.t_click) AS n_click_after_view,
       count(p.t_purchase) AS n_purchase_after_click
FROM u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
"""


def q_vec_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in exact fixed point — the class-
    centroid primitive under SemDeDup clustering / centroid classifiers.
    Components quantize to 1e-6 longs BEFORE the sum (float addition is
    order-dependent across engines; integer addition is not), one
    division to double per output row. Scale: posexplode fans out
    rows x dim, then ONE (label, pos)-keyed partial+final agg — the
    shuffle carries nlabels x dim pre-aggregated rows, not the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label", "pos",
        F.rint(F.col("x").cast("double") * 1e6).cast("long").alias("xq"),
    )
    return (
        comp.groupBy("label", "pos")
        .agg(
            F.count("*").alias("n_vecs"),
            (
                (F.sum("xq").cast("double") / F.count("*")) / 1e6
            ).alias("centroid_x"),
        )
        .orderBy("label", "pos")
    )


# Correlated unnest over the ACTUAL array length — no hardcoded dim, so
# the oracle tracks the data exactly like Spark's posexplode does (a
# fixed-series cross join would emit NULL positions for any short row
# and silently skew n_vecs — round-4 review).
SQL_VEC_CENTROID = """
WITH comp AS (
  SELECT label, i - 1 AS pos,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6, 0) AS BIGINT) AS xq
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
)
SELECT label, pos, count(*) AS n_vecs,
       (CAST(sum(xq) AS DOUBLE) / count(*)) / 1e6 AS centroid_x
FROM comp GROUP BY label, pos ORDER BY label, pos
"""


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention: users cohorted by the calendar day of
    their first signup event; for offsets 0..6, how many are active
    (any event) on cohort_day + offset. Daily, not weekly, because the
    synthetic stream spans 30 days and every user is active every week
    — the weekly readout saturates (vacuous); daily shows real
    drop-off (sf0.01: 150 -> 131 on day 1). The offset is exact
    integer epoch arithmetic; counts are integers end-to-end."""
    ev = load_table(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("day", F.min("ts")).alias("cohort_day"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    offset = (
        (F.unix_timestamp("day") - F.unix_timestamp("cohort_day")) / 86400
    ).cast("long")
    sizes = cohort.groupBy("cohort_day").agg(
        F.count("*").alias("n_cohort")
    )
    return (
        activity.join(cohort, "user_id")
        .withColumn("day_offset", offset)
        .filter((F.col("day_offset") >= 0) & (F.col("day_offset") <= 6))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset", "n_active", "n_cohort",
        )
        .orderBy("cohort_day", "day_offset")
    )


SQL_RETENTION = """
WITH cohort AS (
  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
sizes AS (
  SELECT cohort_day, count(*) AS n_cohort FROM cohort GROUP BY cohort_day
),
r AS (
  SELECT c.cohort_day,
         CAST((epoch(a.day) - epoch(c.cohort_day)) / 86400 AS BIGINT)
           AS day_offset,
         a.user_id
  FROM activity a JOIN cohort c USING (user_id)
)
SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort_day,
       r.day_offset,
       count(DISTINCT r.user_id) AS n_active,
       s.n_cohort
FROM r JOIN sizes s ON r.cohort_day = s.cohort_day
WHERE r.day_offset BETWEEN 0 AND 6
GROUP BY 1, 2, s.n_cohort
ORDER BY 1, 2
"""


QUERIES: dict[str, QuerySpec] = {
    "q_funnel": QuerySpec(
        q_funnel,
        SQL_FUNNEL,
        "ordered view->click->purchase conversion funnel per user",
    ),
    "q_vec_centroid": QuerySpec(
        q_vec_centroid,
        SQL_VEC_CENTROID,
        "per-label embedding centroids, exact fixed-point accumulation",
    ),
    "q_retention": QuerySpec(
        q_retention,
        SQL_RETENTION,
        "daily signup-cohort retention, offsets 0-6",
    ),
    "q_stream_ingest": QuerySpec(
        q_stream_ingest,
        SQL_STREAM_INGEST,
        "continuous indexing: availableNow streaming ingest vs the "
        "batch chunking oracle",
    ),
    "q_sql_passthrough": QuerySpec(
        q_sql_passthrough,
        SQL_PASSTHROUGH,
        "identical SQL text executed by spark.sql and the oracle",
    ),
    "q_redact_pii": QuerySpec(q_redact_pii, SQL_REDACT_PII),
    "q_profile": QuerySpec(q_profile, SQL_PROFILE),
    "q_null_funcs": QuerySpec(q_null_funcs, SQL_NULL_FUNCS),
    "q_agg_bool": QuerySpec(q_agg_bool, SQL_AGG_BOOL),
    "q_date_series": QuerySpec(q_date_series, SQL_DATE_SERIES),
    "q_merge_upsert": QuerySpec(q_merge_upsert, SQL_MERGE_UPSERT),
    "q_join_skew": QuerySpec(q_join_skew, SQL_JOIN_SKEW),
    "q_agg_two_phase": QuerySpec(q_agg_two_phase, SQL_AGG_TWO_PHASE),
    "q_win_range_frame": QuerySpec(q_win_range_frame, SQL_WIN_RANGE_FRAME),
    "q_quality_score": QuerySpec(q_quality_score, SQL_QUALITY_SCORE),
    "q_source_binary": QuerySpec(
        q_source_binary, SQL_SOURCE_BINARY, "binaryFile source round-trip"
    ),
    "q_multimodal": QuerySpec(
        q_multimodal, None,
        "media decode/frame-sample plumbing — ROWS-ONLY BY DESIGN: the "
        "real decode kernels are env-gated (libs absent here); the "
        "deterministic fake path's schema/batching is pinned by "
        "tests/test_multimodal.py; the stdlib decode tier itself is "
        "oracle-checked by q_multimodal_pinned",
    ),
    "q_multimodal_pinned": QuerySpec(
        q_multimodal_pinned, SQL_MULTIMODAL_PINNED,
        "stdlib image decode tier, oracle-checked: executor-encoded "
        "PNG/BMP/PNM round-tripped to exact-integer stats vs mirrored "
        "pure-arithmetic literals",
    ),
    "q_agg_stats": QuerySpec(q_agg_stats, SQL_AGG_STATS),
    "q_agg_percentile": QuerySpec(q_agg_percentile, SQL_AGG_PERCENTILE),
    "q_hof_exists": QuerySpec(q_hof_exists, SQL_HOF_EXISTS),
    "q_tpch_q3": QuerySpec(q_tpch_q3, SQL_TPCH_Q3),
    "q_tpch_q5": QuerySpec(q_tpch_q5, SQL_TPCH_Q5),
    "q_tpch_q4": QuerySpec(q_tpch_q4, SQL_TPCH_Q4),
    "q_tpch_q6": QuerySpec(q_tpch_q6, SQL_TPCH_Q6),
    "q_tpch_q10": QuerySpec(q_tpch_q10, SQL_TPCH_Q10),
    "q_tpch_q12": QuerySpec(q_tpch_q12, SQL_TPCH_Q12),
    "q_tpch_q14": QuerySpec(q_tpch_q14, SQL_TPCH_Q14),
    "q_tpch_q18": QuerySpec(q_tpch_q18, SQL_TPCH_Q18),
    "q_tpch_q19": QuerySpec(q_tpch_q19, SQL_TPCH_Q19),
    "q_sink_roundtrip": QuerySpec(
        q_sink_roundtrip, SQL_SINK_ROUNDTRIP, "pipeline -> parquet sink -> read-back"
    ),
}
