"""Mining query keys: market-basket association rules, fixed-point
PageRank over the event-transition graph, and length-bucketed batch
packing (operators/mining.py).

Determinism discipline: every ratio ships as exact-integer ppm
(floor division — Spark ``DIV`` ≡ DuckDB ``//`` on nonnegative
longs), PageRank mass is scaled-integer end-to-end, and no float is
ever accumulated — the whole module's arithmetic is engine- and
partitioning-independent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from document_vector_indexer_spark.functions import text as TX
from document_vector_indexer_spark.io import load_table
from document_vector_indexer_spark.queries.base import QuerySpec
from document_vector_indexer_spark.queries.textops import _DUCK_WORDS, _duck_units

from document_vector_indexer_spark.operators.mining import PR_SCALE

PR_ITERATIONS = 10


def _brand_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(basket, item) = (order, part BRAND via the broadcast part dim)
    — the one definition both basket queries share, so q_basket_rules
    and q_triangles can never disagree about what a basket is."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))


def basket_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 brand-pair association rules over order baskets.

    Baskets are orders; items are part BRANDS (via the broadcast part
    dim): 25 brands over 15k orders at sf0.01 makes every surviving
    pair genuinely frequent — part-granularity pairs would almost all
    have support 1 (vacuous). impl="bitmask" (r14): 25 brands <= 64,
    so supports/item-counts/n_baskets all come off the distinct-mask
    frame — one 16-byte-row basket exchange, value-identical
    (parity-pinned; the set path OOM'd under adjacent load at ~sf100
    where this path completes, SCALE.md §r14)."""
    from document_vector_indexer_spark.operators.mining import basket_pairs

    return basket_pairs(
        _brand_baskets(spark, sf_dir), "basket", "item", top=50,
        impl="bitmask",
    )


SQL_BASKET_RULES = """
WITH b AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
ic AS (SELECT p_brand AS item, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM b),
p AS (
  SELECT a.p_brand AS item_a, c.p_brand AS item_b,
         CAST(count(*) AS BIGINT) AS support
  FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey AND a.p_brand < c.p_brand
  GROUP BY 1, 2
)
SELECT item_a, item_b, support,
       CAST((1000000 * support) // ia.cnt AS BIGINT) AS conf_ab_ppm,
       CAST((1000000 * support) // ib.cnt AS BIGINT) AS conf_ba_ppm,
       CAST((CAST(1000000 AS HUGEINT) * n_baskets * support)
            // (CAST(ia.cnt AS HUGEINT) * ib.cnt) AS BIGINT)
         AS lift_ppm
FROM p JOIN ic ia ON ia.item = p.item_a
       JOIN ic ib ON ib.item = p.item_b
       CROSS JOIN nb
ORDER BY support DESC, item_a, item_b
LIMIT 50
"""


def _event_k(col: str = "props") -> F.Column:
    return F.get_json_object(col, "$.k").cast("int")


def pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the page-transition graph implied by
    the event stream: nodes are props.k page ids (100 of them), edges
    are per-user consecutive-event transitions weighted by count.
    Integer mass units of 1e-12 — see operators/mining.pagerank for
    why that is what makes a PageRank ORACLE-able at all."""
    from document_vector_indexer_spark.operators.mining import pagerank

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", _event_k().alias("k")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.withColumn("src", F.lag("k").over(w)).filter(
        F.col("src").isNotNull()
    )
    edges = (
        trans.groupBy("src", F.col("k").alias("dst"))
        .agg(F.count("*").cast("long").alias("w"))
    )
    nodes = ev.select(F.col("k").alias("node")).distinct()
    out = pagerank(edges, nodes, iterations=PR_ITERATIONS, scale=PR_SCALE)
    return out.orderBy(F.col("rank_units").desc(), "node")


def _pagerank_sql(iterations: int, scale: int) -> str:
    head = f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
),
t AS (
  SELECT lag(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         k AS dst
  FROM e
),
ed AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
       FROM t WHERE src IS NOT NULL GROUP BY 1, 2),
ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM ed GROUP BY 1),
ew AS (SELECT ed.src, ed.dst, ed.w, ow.out_w FROM ed JOIN ow USING (src)),
n AS (SELECT DISTINCT k AS node FROM e),
nn AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM n),
base AS (SELECT node, CAST({scale} // cnt AS BIGINT) AS share
         FROM n CROSS JOIN nn),
r0 AS (SELECT node, share AS rank_units FROM base)"""
    iter_ctes = []
    prev = "r0"
    for i in range(1, iterations + 1):
        iter_ctes.append(
            f""",
r{i} AS (
  SELECT b.node,
         CAST((15 * b.share) // 100 + (85 * COALESCE(s.inc, 0)) // 100
              AS BIGINT) AS rank_units
  FROM base b LEFT JOIN (
    SELECT ew.dst AS node,
           sum((r.rank_units * ew.w) // ew.out_w) AS inc
    FROM {prev} r JOIN ew ON r.node = ew.src GROUP BY 1
  ) s ON b.node = s.node
)"""
        )
        prev = f"r{i}"
    return (
        head
        + "".join(iter_ctes)
        + f"\nSELECT node, rank_units FROM {prev}"
        + "\nORDER BY rank_units DESC, node"
    )


SQL_PAGERANK = _pagerank_sql(PR_ITERATIONS, PR_SCALE)


def length_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pad-to-pow-2-bucket batching profile of the documents corpus
    per source: bucket sizes, exact token sums, padded batch counts at
    16 sequences/batch, utilization in exact ppm."""
    from document_vector_indexer_spark.operators.mining import length_buckets

    docs = load_table(spark, sf_dir, "documents").select(
        "source", TX.token_count_ws(F.col("text")).alias("tokens")
    )
    out = length_buckets(docs, "tokens", "source", batch_size=16)
    return out.select(
        F.col("grp").alias("source"),
        "bucket_len",
        "n_docs",
        "sum_tokens",
        "n_batches",
        "util_ppm",
    )


SQL_LENGTH_BUCKETS = f"""
WITH t AS (
  SELECT source,
         CAST(len({_DUCK_WORDS.format(col="text")}) AS BIGINT) AS tokens
  FROM documents
),
bk AS (
  SELECT source, tokens,
         CAST(CASE WHEN tokens <= 16 THEN 16 WHEN tokens <= 32 THEN 32
                   WHEN tokens <= 64 THEN 64 WHEN tokens <= 128 THEN 128
                   WHEN tokens <= 256 THEN 256 WHEN tokens <= 512 THEN 512
                   WHEN tokens <= 1024 THEN 1024 WHEN tokens <= 2048 THEN 2048
                   WHEN tokens <= 4096 THEN 4096 ELSE 8192 END AS BIGINT)
           AS bucket_len
  FROM t
)
SELECT source, bucket_len, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS sum_tokens,
       CAST((count(*) + 15) // 16 AS BIGINT) AS n_batches,
       CAST((1000000 * sum(tokens)) // (count(*) * bucket_len) AS BIGINT)
         AS util_ppm
FROM bk GROUP BY 1, 2
ORDER BY 1, 2
"""


TRI_MIN_SUPPORT_PPM = 20_000  # edges need support >= 2% of baskets
ATTR_LOOKBACK_S = 7 * 86_400


def triangles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand triangle counts in the order co-occurrence graph,
    edges thresholded at a RELATIVE 2%-of-baskets support so the edge
    set stays selective (~the mean pair support) at every scale
    factor. impl="bitmask" (r14): the brand vocabulary is 25 <= 64,
    so pair supports ride per-basket bit_or masks — 16-byte exchange
    rows instead of string sets, pairs generated over distinct masks
    only; 265.1 -> measured-in-SCALE.md at ~sf100, value-identical
    (parity-pinned, in-plan vocab guard raises rather than degrade)."""
    from document_vector_indexer_spark.operators.mining import (
        cooccurrence_triangles,
    )

    return cooccurrence_triangles(
        _brand_baskets(spark, sf_dir), "basket", "item",
        min_support_frac_ppm=TRI_MIN_SUPPORT_PPM,
        impl="bitmask",
    )


SQL_TRIANGLES = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets FROM b),
p AS (
  SELECT x.item AS item_a, y.item AS item_b, CAST(count(*) AS BIGINT) AS support
  FROM b x JOIN b y ON x.bk = y.bk AND x.item < y.item GROUP BY 1, 2
),
ed AS (
  SELECT item_a AS a, item_b AS b FROM p CROSS JOIN nb
  WHERE support >= greatest(2, (n_baskets * {TRI_MIN_SUPPORT_PPM}) // 1000000)
),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM ed e1 JOIN ed e2 ON e1.b = e2.a
             JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b
),
x AS (SELECT unnest([a, b, c]) AS item FROM tri)
SELECT item, CAST(count(*) AS BIGINT) AS n_triangles
FROM x GROUP BY 1
ORDER BY n_triangles DESC, item
"""


def attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution of purchase value (exact cents)
    across view/click touches in a 7-day lookback; untouched
    conversions credit to 'direct'."""
    from document_vector_indexer_spark.operators.mining import linear_attribution

    ev = load_table(spark, sf_dir, "events")
    return linear_attribution(ev, lookback_s=ATTR_LOOKBACK_S)


SQL_ATTRIBUTION = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
conv AS (
  SELECT user_id, event_id AS conv_id, us AS conv_us, cents AS value_cents
  FROM e WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_type AS touch_type, us AS touch_us
  FROM e WHERE event_type IN ('view', 'click')
),
j AS (
  SELECT c.conv_id, c.value_cents, t.touch_type
  FROM conv c LEFT JOIN touch t
    ON t.user_id = c.user_id AND t.touch_us < c.conv_us
   AND t.touch_us >= c.conv_us - {ATTR_LOOKBACK_S * 1_000_000}
),
pct AS (
  SELECT conv_id, value_cents, touch_type,
         CAST(count(touch_type) AS BIGINT) AS n_type
  FROM j GROUP BY 1, 2, 3
),
pc AS (
  SELECT *, CAST(sum(n_type) OVER (PARTITION BY conv_id) AS BIGINT)
              AS n_touches
  FROM pct
),
cr AS (
  SELECT CASE WHEN n_touches = 0 THEN 'direct' ELSE touch_type END
           AS touch_type,
         CASE WHEN n_touches = 0 THEN value_cents
              ELSE (value_cents * n_type) // n_touches END AS cents,
         value_cents
  FROM pc
)
SELECT touch_type, count(*) AS n_conversions,
       CAST(sum(value_cents) AS BIGINT) AS touched_cents,
       CAST(sum(cents) AS BIGINT) AS attributed_cents
FROM cr GROUP BY 1 ORDER BY 1
"""


def rfm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation of purchasers (mining.rfm_segments):
    segment code = recency*100 + frequency*10 + monetary quartiles."""
    from document_vector_indexer_spark.operators.mining import rfm_segments

    return rfm_segments(load_table(spark, sf_dir, "events"))


SQL_RFM = """
WITH p AS (
  SELECT user_id, CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
t AS (
  SELECT user_id, cents,
         ntile(4) OVER (ORDER BY last_us, user_id) AS rq,
         ntile(4) OVER (ORDER BY freq, user_id) AS fq,
         ntile(4) OVER (ORDER BY cents, user_id) AS mq
  FROM p
)
SELECT CAST(rq * 100 + fq * 10 + mq AS BIGINT) AS segment,
       count(*) AS n_users, CAST(sum(cents) AS BIGINT) AS total_cents
FROM t GROUP BY 1 ORDER BY 1
"""


def ewma_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer EWMA (alpha = 1/8) of per-type daily mean cents with
    exact ppm deviation flags (mining.ewma_daily)."""
    from document_vector_indexer_spark.operators.mining import ewma_daily

    return ewma_daily(load_table(spark, sf_dir, "events"), shift=3)


SQL_EWMA = """
WITH RECURSIVE d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
              // count(*) AS BIGINT) AS mean_cents
  FROM events GROUP BY 1, 2
),
i AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                 AS BIGINT) AS idx
  FROM d
),
r AS (
  SELECT event_type, day, idx, mean_cents, mean_cents AS ewma
  FROM i WHERE idx = 1
  UNION ALL
  SELECT i.event_type, i.day, i.idx, i.mean_cents,
         CAST((i.mean_cents + 7 * r.ewma) >> 3 AS BIGINT)
  FROM r JOIN i ON i.event_type = r.event_type AND i.idx = r.idx + 1
)
SELECT event_type, CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num,
       mean_cents, CAST(ewma AS BIGINT) AS ewma_cents,
       CAST((abs(mean_cents - ewma) * 1000000) // greatest(ewma, 1)
            AS BIGINT) AS dev_ppm
FROM r ORDER BY event_type, day_num
"""


def paths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 3-step event-type paths (mining.common_paths)."""
    from document_vector_indexer_spark.operators.mining import common_paths

    return common_paths(load_table(spark, sf_dir, "events"), k=20, depth=3)


SQL_PATHS = """
WITH s AS (
  SELECT lag(event_type, 2) OVER w AS s0,
         lag(event_type, 1) OVER w AS s1,
         event_type AS s2
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT s0 || '>' || s1 || '>' || s2 AS path, count(*) AS n
FROM s WHERE s0 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 20
"""


def gini_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Gini spend concentration (mining.gini_concentration),
    exact ppm via the two-pass global rank."""
    from document_vector_indexer_spark.operators.mining import gini_concentration

    return gini_concentration(load_table(spark, sf_dir, "events"))


SQL_GINI = """
WITH p AS (
  SELECT event_type, user_id,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY event_type
                                    ORDER BY x, user_id) AS BIGINT) AS i
  FROM p
)
SELECT event_type, count(*) AS n_users, CAST(sum(x) AS BIGINT) AS total_cents,
       CAST((sum((2 * i) * x) - (count(*) + 1) * sum(x)) * 1000000
            // greatest(1, count(*) * sum(x)) AS BIGINT) AS gini_ppm
FROM r GROUP BY 1 ORDER BY 1
"""


def ks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer two-sample KS distance of each type's value
    distribution vs the 'view' baseline (mining.ks_drift)."""
    from document_vector_indexer_spark.operators.mining import ks_drift

    return ks_drift(load_table(spark, sf_dir, "events"), baseline_type="view")


SQL_KS = """
WITH e AS (
  SELECT event_type AS t, CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
),
tc AS (SELECT t, c, CAST(count(*) AS BIGINT) AS ct
       FROM e WHERE t <> 'view' GROUP BY 1, 2),
bc AS (SELECT c, CAST(count(*) AS BIGINT) AS cb
       FROM e WHERE t = 'view' GROUP BY 1),
grid AS (
  SELECT t, c FROM tc
  UNION
  SELECT ty.t, bc.c FROM (SELECT DISTINCT t FROM tc) ty CROSS JOIN bc
),
j AS (
  SELECT g.t, g.c, COALESCE(tc.ct, 0) AS ct, COALESCE(bc.cb, 0) AS cb
  FROM grid g LEFT JOIN tc ON tc.t = g.t AND tc.c = g.c
              LEFT JOIN bc ON bc.c = g.c
),
cum AS (
  SELECT t, c,
         CAST(sum(ct) OVER (PARTITION BY t ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_t,
         CAST(sum(cb) OVER (PARTITION BY t ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_b,
         CAST(sum(ct) OVER (PARTITION BY t) AS BIGINT) AS n_t,
         CAST(sum(cb) OVER (PARTITION BY t) AS BIGINT) AS n_b
  FROM j
)
SELECT t AS event_type, n_t, n_b,
       CAST(abs(cum_t * n_b - cum_b * n_t) * 1000000
            // greatest(1, n_t * n_b) AS BIGINT)
         AS ks_ppm,
       c AS at_cents
FROM cum
QUALIFY row_number() OVER (PARTITION BY t
          ORDER BY abs(cum_t * n_b - cum_b * n_t) DESC, c) = 1
ORDER BY event_type
"""


SAMPLE_CAP_TOKENS = 512


def sample_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted token-budget sampling
    (trainprep.length_weighted_sample): keep p = min(1, tokens/512),
    decided by the exact cross-multiplied integer test — bit-stable
    across engines/runs/partitionings/corpus growth."""
    from document_vector_indexer_spark.operators.trainprep import (
        length_weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", TX.token_count_ws(F.col("text")).alias("tokens")
    )
    out = length_weighted_sample(
        docs, tokens_col="tokens", id_col="doc_id",
        cap_tokens=SAMPLE_CAP_TOKENS,
    )
    return out.select("doc_id", "tokens", "p_ppm").orderBy("doc_id")


SQL_SAMPLE_TOKENS = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({_DUCK_WORDS.format(col="text")}) AS BIGINT) AS tokens
  FROM documents
)
SELECT doc_id, tokens,
       least(CAST(1000000 AS BIGINT),
             tokens * 1000000 // {SAMPLE_CAP_TOKENS}) AS p_ppm
FROM t
WHERE {_duck_units("'lw:' || CAST(doc_id AS VARCHAR)")}
        * {SAMPLE_CAP_TOKENS} < tokens * 2147483647
ORDER BY doc_id
"""


K_ANON_K = 5
K_ANON_BAND = 10_000  # $10k price bands: risky tail persists to sf0.01


def kanon_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of orders against the (customer nation,
    $10k total-price band) quasi-identifier, per nation
    (mining.k_anonymity_profile). More data genuinely improves
    anonymity here — sf0.001 is mostly risky, sf0.1 fully safe —
    and the per-scale outputs reflect that honestly."""
    from document_vector_indexer_spark.operators.mining import (
        k_anonymity_profile,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust.select("c_custkey", "c_nationkey")),
        orders["o_custkey"] == F.col("c_custkey"),
    ).select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.expr(f"CAST(o_totalprice AS BIGINT) DIV {K_ANON_BAND}").alias("band"),
    )
    return k_anonymity_profile(
        joined, quasi_cols=["band"], group_col="nation", k=K_ANON_K
    )


SQL_KANON = f"""
WITH g AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         CAST(floor(o_totalprice) AS BIGINT) // {K_ANON_BAND} AS band,
         CAST(count(*) AS BIGINT) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)
SELECT nation, CAST(sum(n) AS BIGINT) AS n_rows,
       count(*) AS n_groups,
       CAST(count(*) FILTER (n < {K_ANON_K}) AS BIGINT) AS n_risky_groups,
       CAST(COALESCE(sum(n) FILTER (n < {K_ANON_K}), 0) AS BIGINT)
         AS n_risky_rows,
       CAST(COALESCE(sum(n) FILTER (n < {K_ANON_K}), 0) * 1000000
            // sum(n) AS BIGINT) AS risk_ppm
FROM g GROUP BY 1 ORDER BY 1
"""


def markov_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event TYPES: P(next |
    current) in exact ppm from per-user consecutive-event transitions
    (the probability view of the q_pagerank edge build, at the
    5-type granularity where every cell is meaningful). One user-keyed
    lag pass + one tiny (cur, nxt) agg."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("cur", F.lag("event_type").over(w))
        .filter(F.col("cur").isNotNull())
        .groupBy("cur", F.col("event_type").alias("nxt"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    out_tot = trans.groupBy("cur").agg(F.sum("n").cast("long").alias("tot"))
    return (
        trans.join(F.broadcast(out_tot), "cur")
        .select(
            "cur",
            "nxt",
            "n",
            F.expr("n * 1000000 DIV tot").alias("p_ppm"),
        )
        .orderBy("cur", "nxt")
    )


SQL_MARKOV = """
WITH t AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS cur,
         event_type AS nxt
  FROM events
),
c AS (
  SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
  FROM t WHERE cur IS NOT NULL GROUP BY 1, 2
),
o AS (SELECT cur, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
SELECT c.cur, c.nxt, c.n, CAST(c.n * 1000000 // o.tot AS BIGINT) AS p_ppm
FROM c JOIN o USING (cur)
ORDER BY cur, nxt
"""


QUERIES: dict[str, QuerySpec] = {
    "q_basket_rules": QuerySpec(
        basket_rules_q,
        SQL_BASKET_RULES,
        "market-basket brand-pair rules: support/confidence/lift, exact ppm",
    ),
    "q_pagerank": QuerySpec(
        pagerank_q,
        SQL_PAGERANK,
        "damped PageRank over event transitions, scaled-integer exact",
    ),
    "q_length_buckets": QuerySpec(
        length_buckets_q,
        SQL_LENGTH_BUCKETS,
        "pow-2 length-bucket batch packing profile, exact ppm utilization",
    ),
    "q_triangles": QuerySpec(
        triangles_q,
        SQL_TRIANGLES,
        "per-item triangle counts in the thresholded co-occurrence graph",
    ),
    "q_attribution": QuerySpec(
        attribution_q,
        SQL_ATTRIBUTION,
        "linear multi-touch purchase attribution, exact-cents credit",
    ),
    "q_rfm": QuerySpec(
        rfm_q,
        SQL_RFM,
        "RFM quartile segmentation via two-pass global rank (no global window)",
    ),
    "q_ewma": QuerySpec(
        ewma_q,
        SQL_EWMA,
        "integer EWMA of daily means with exact ppm deviation flags",
    ),
    "q_paths": QuerySpec(
        paths_q,
        SQL_PATHS,
        "top-20 3-step event-type paths (sequential-pattern head)",
    ),
    "q_gini": QuerySpec(
        gini_q,
        SQL_GINI,
        "per-type Gini spend concentration, exact ppm via two-pass rank",
    ),
    "q_ks_drift": QuerySpec(
        ks_q,
        SQL_KS,
        "exact integer two-sample KS distance vs the view baseline",
    ),
    "q_sample_tokens": QuerySpec(
        sample_tokens_q,
        SQL_SAMPLE_TOKENS,
        "length-weighted token-budget sampling, cross-multiplied exact",
    ),
    "q_kanonymity": QuerySpec(
        kanon_q,
        SQL_KANON,
        "k-anonymity risk audit per nation, exact integer profile",
    ),
    "q_markov": QuerySpec(
        markov_q,
        SQL_MARKOV,
        "first-order event-type Markov transition matrix, exact ppm",
    ),
}
