"""Scalar-function packs (SURVEY.md §2B): string / date / math / array /
json / map functions, plus pivot/unpivot — each exercised end-to-end
over the corpus with a DuckDB oracle.

Portability rules observed here:
- transcendental fns (ln) may differ in the last ulp across libm
  implementations -> round(6), safe because outputs are never
  decimal-grid values;
- integer / exact ops (sqrt is IEEE-exact, abs/ceil/floor/mod) pass
  through unrounded;
- Spark year()/month() return int, DuckDB BIGINT -> cast both;
- DuckDB lists are 1-indexed, Spark arrays 0-indexed;
- Spark weekday() is Monday=0, DuckDB isodow Monday=1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from document_vector_indexer_spark.io import load_table
from document_vector_indexer_spark.queries.base import QuerySpec


def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.length("p_name").cast("long").alias("name_len"),
        F.upper("p_name").alias("name_upper"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.levenshtein("p_name", F.lower("p_type")).alias("lev_to_type"),
        F.reverse("p_name").alias("name_rev"),
        F.replace("p_name", F.lit(" "), F.lit("_")).alias("name_snake"),
    )


SQL_STR_FUNCS = """
SELECT p_partkey,
       CAST(length(p_name) AS BIGINT) AS name_len,
       upper(p_name) AS name_upper,
       string_split(p_name, ' ')[1] AS first_word,
       substr(p_name, 1, 5) AS name_prefix,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       concat_ws('/', p_brand, p_type) AS brand_type,
       levenshtein(p_name, lower(p_type)) AS lev_to_type,
       reverse(p_name) AS name_rev,
       replace(p_name, ' ', '_') AS name_snake
FROM part
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("isodow"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month_str"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since_95"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
            "plus3mo"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    )


SQL_DATE_FUNCS = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(isodow(o_orderdate) AS INTEGER) AS isodow,
       strftime(o_orderdate, '%Y-%m') AS month_str,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
         AS days_since_95,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
       CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) AS epoch_s,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr
FROM orders
"""


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_quantity").alias("sqrt_qty"),          # IEEE-exact
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),  # libm -> round
        F.pow("l_quantity", F.lit(2.0)).alias("qty_sq"),  # integral result, exact
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("long").alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_k_floor"),
        (F.col("l_partkey") % 7).cast("long").alias("part_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.sign(F.col("l_discount") - F.col("l_tax")).alias("rate_sign"),
    )


SQL_MATH_FUNCS = """
SELECT l_orderkey, l_linenumber,
       sqrt(l_quantity) AS sqrt_qty,
       round(ln(l_extendedprice), 6) AS ln_price,
       power(l_quantity, 2.0) AS qty_sq,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
       CAST(l_partkey % 7 AS BIGINT) AS part_mod7,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       CAST(sign(l_discount - l_tax) AS DOUBLE) AS rate_sign
FROM lineitem WHERE l_orderkey % 100 = 0
"""


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array HOFs over tokenized documents — the chunking substrate
    (transform/filter/aggregate/slice/sort/distinct/contains)."""
    from document_vector_indexer_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    words = TX.word_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.concat_ws("-", F.slice(words, 1, 3)).alias("first3"),
        F.concat_ws(",", F.slice(F.sort_array(F.array_distinct(words)), 1, 3)).alias(
            "top3_alpha"
        ),
        F.aggregate(words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)).alias(
            "total_word_len"
        ),
        F.size(F.filter(words, lambda w: F.length(w) > 5)).cast("long").alias(
            "n_long_words"
        ),
    )


SQL_ARRAY_FUNCS = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                                        '\\s+'), x -> x <> '') AS words
  FROM documents
)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
       list_contains(words, 'spark') AS has_spark,
       array_to_string(list_slice(words, 1, 3), '-') AS first3,
       array_to_string(list_slice(list_sort(list_distinct(words)), 1, 3), ',')
         AS top3_alpha,
       CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT)
         AS total_word_len,
       CAST(len(list_filter(words, x -> length(x) > 5)) AS BIGINT) AS n_long_words
FROM w
"""


def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.count_if(F.col("k") > 50).alias("n_k_gt50"),
        )
    )


SQL_JSON_FUNCS = """
SELECT event_type, count(*) AS n,
       CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       count(*) FILTER (CAST(json_extract_string(props, '$.k') AS INTEGER) > 50)
         AS n_k_gt50
FROM events GROUP BY event_type
"""


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a per-user map<event_type, count> (map_from_entries over
    sorted entries), then consume it with map_keys/map_values/size.
    The oracle reproduces the *values* relationally — map semantics are
    Spark-side, results are engine-neutral."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.concat_ws(",", F.map_keys("m")).alias("type_keys"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("total_events"),
        F.size("m").cast("int").alias("n_types"),
    )


SQL_MAP_FUNCS = """
WITH per AS (
  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2
)
SELECT user_id,
       string_agg(event_type, ',' ORDER BY event_type) AS type_keys,
       CAST(sum(cnt) AS BIGINT) AS total_events,
       CAST(count(*) AS INTEGER) AS n_types
FROM per GROUP BY user_id
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts into one column per type. Explicit value list
    -> single-pass pivot, no extra distinct-values job (the 100 TB
    pattern: never let pivot infer its columns)."""
    ev = load_table(spark, sf_dir, "events")
    out = ev.groupBy("user_id").pivot("event_type", list(EVENT_TYPES)).count()
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in EVENT_TYPES],
    )


SQL_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY user_id
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: pivot then unpivot (melt) back to long form and
    re-aggregate — totals must equal the plain group-by counts."""
    pivoted = q_pivot(spark, sf_dir)
    long = pivoted.unpivot(
        ids=["user_id"],
        values=list(EVENT_TYPES),
        variableColumnName="event_type",
        valueColumnName="n",
    )
    return (
        long.filter(F.col("n") > 0)
        .groupBy("event_type")
        .agg(F.sum("n").cast("long").alias("total_n"))
    )


SQL_UNPIVOT = """
SELECT event_type, count(*) AS total_n FROM events GROUP BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "q_str_funcs": QuerySpec(q_str_funcs, SQL_STR_FUNCS),
    "q_date_funcs": QuerySpec(q_date_funcs, SQL_DATE_FUNCS),
    "q_math_funcs": QuerySpec(q_math_funcs, SQL_MATH_FUNCS),
    "q_array_funcs": QuerySpec(q_array_funcs, SQL_ARRAY_FUNCS),
    "q_json_funcs": QuerySpec(q_json_funcs, SQL_JSON_FUNCS),
    "q_map_funcs": QuerySpec(q_map_funcs, SQL_MAP_FUNCS),
    "q_pivot": QuerySpec(q_pivot, SQL_PIVOT),
    "q_unpivot": QuerySpec(q_unpivot, SQL_UNPIVOT),
}
