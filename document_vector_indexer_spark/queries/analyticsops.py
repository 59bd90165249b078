"""Event-stream & index-build analytics queries: batch sessionization,
SCD2 interval builds, value histograms, inverted-index postings, and
the oracled sign-LSH kNN tier.

These extend SURVEY §2B's north-star surface on the side a production
deployment actually exercises daily: clickstream sessionization and
dimension-table (CDC) builds over the ``events`` stream, profiling
histograms, and the search-index artifacts (postings lists) that the
BM25/hybrid retrieval queries consume. ``q_knn_lsh_pinned`` upgrades
the LSH ANN tier from rows-only to value-checked, the same
pinned-literals move that oracled the IVF tier in round 4
(vectorops.q_knn_ivf) and semantic dedup in round 3.

Determinism discipline: timestamps become exact epoch microseconds
(Spark ``unix_micros`` ≡ DuckDB ``epoch_us``; the parquet values are
µs-precision so no truncation divergence), money becomes integer
cents before any arithmetic, and every aggregate output is CAST to
BIGINT in the oracle (the DuckDB HUGEINT rule — round-3's red rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from document_vector_indexer_spark.io import load_table
from document_vector_indexer_spark.queries.base import QuerySpec
from document_vector_indexer_spark.queries.textops import _DUCK_WORDS
from document_vector_indexer_spark.queries.vectorops import (
    SQL_COSINE,
    lsh_band_union_sql,
)

# 12-hour session gap: the synthetic events stream's median per-user
# inter-event gap is ~7.3 h (p90 ~25 h), so 12 h yields a real mix of
# multi-event sessions and splits — a web-default 30-min gap would
# make every event its own session (vacuous green row).
SESSION_GAP_S = 43_200

HIST_BIN_CENTS = 5_000  # $50 bins over events.value ∈ [0.01, 490.02]


def sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup of the gap-sessionized event stream
    (operators/profiling.sessionize): events, exact µs duration,
    purchases, cents-exact value total."""
    from document_vector_indexer_spark.operators.profiling import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, gap_s=SESSION_GAP_S)
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
            F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
            F.sum(F.rint(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )
        .orderBy("user_id", "session_id")
    )


SQL_SESSIONIZE = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, value, ts, epoch_us(ts) AS us
  FROM events
),
m AS (
  SELECT *, CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > {SESSION_GAP_S * 1_000_000}
            THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_id
  FROM m
)
SELECT user_id, session_id, count(*) AS n_events,
       CAST(max(us) - min(us) AS BIGINT) AS duration_us,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
         AS n_purchases,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


def scd2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD intervals from the event stream
    (operators/profiling.scd2_intervals): per-user runs of the same
    event_type with half-open µs validity bounds."""
    from document_vector_indexer_spark.operators.profiling import scd2_intervals

    ev = load_table(spark, sf_dir, "events")
    return scd2_intervals(ev).orderBy("user_id", "valid_from_us")


SQL_SCD2 = """
WITH e AS (
  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us FROM events
),
m AS (
  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
            THEN 1 ELSE 0 END AS chg
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
r AS (
  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS run
  FROM m
),
runs AS (
  SELECT user_id, run, min(event_type) AS event_type,
         CAST(min(us) AS BIGINT) AS valid_from_us,
         count(*) AS n_events
  FROM r GROUP BY 1, 2
)
SELECT user_id, event_type, valid_from_us,
       lead(valid_from_us) OVER w2 AS valid_to_us, n_events,
       CAST(CASE WHEN lead(valid_from_us) OVER w2 IS NULL
            THEN 1 ELSE 0 END AS INTEGER) AS is_current
FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY run)
ORDER BY user_id, valid_from_us
"""


def histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cents-exact fixed-width value histogram per event type
    (operators/profiling.value_histogram)."""
    from document_vector_indexer_spark.operators.profiling import value_histogram

    ev = load_table(spark, sf_dir, "events")
    return value_histogram(ev, bin_cents=HIST_BIN_CENTS).orderBy(
        "event_type", "bin"
    )


SQL_HISTOGRAM = f"""
WITH c AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, cents // {HIST_BIN_CENTS} AS bin,
       (cents // {HIST_BIN_CENTS}) * {HIST_BIN_CENTS} AS bin_lo_cents,
       count(*) AS n,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM c GROUP BY 1, 2 ORDER BY 1, 2
"""


def postings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index head build (operators/search.build_postings):
    top-100 terms by df with df, total tf, and top-5 postings."""
    from document_vector_indexer_spark.operators.search import build_postings

    docs = load_table(spark, sf_dir, "documents")
    return build_postings(docs, head=5, top_words=100)


SQL_POSTINGS = f"""
WITH w AS (
  SELECT doc_id, unnest({_DUCK_WORDS.format(col="text")}) AS word
  FROM documents
),
tf AS (
  SELECT word, doc_id, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2
),
agg AS (
  SELECT word, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(tf) AS BIGINT) AS tf_total
  FROM tf GROUP BY 1
),
rk AS (
  SELECT word, doc_id, tf,
         row_number() OVER (PARTITION BY word ORDER BY tf DESC, doc_id) AS r
  FROM tf
),
heads AS (
  SELECT word, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY tf DESC, doc_id)
           AS postings_head
  FROM rk WHERE r <= 5 GROUP BY 1
)
SELECT word, df, tf_total, postings_head
FROM agg JOIN heads USING (word)
ORDER BY df DESC, word LIMIT 100
"""


def knn_lsh_pinned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH kNN with pinned hyperplanes
    (operators/similarity.knn_lsh_pinned): deterministic bucketed
    candidate generation + exact cosine rerank, value-checked against
    the mirrored hyperplane literals — the oracled LSH ANN tier."""
    from document_vector_indexer_spark.operators.similarity import knn_lsh_pinned

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") != 0)
    query = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("qid"), "embedding"
    )
    out = knn_lsh_pinned(corpus, query, k=10, dim=64)
    return out.select("id", (F.round("sim", 6) + 0.0).alias("cos_sim"), "rk")


SQL_KNN_LSH_PINNED = f"""
WITH q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
cb AS ({lsh_band_union_sql("vec_id <> 0")}),
qb AS ({lsh_band_union_sql("vec_id = 0")}),
cand AS (
  SELECT DISTINCT c.vec_id AS id
  FROM cb c JOIN qb b ON c.band = b.band AND c.bucket = b.bucket
),
scored AS (
  SELECT cand.id, {SQL_COSINE('e.embedding', 'q.q_vec')} AS sim
  FROM cand JOIN embeddings e ON e.vec_id = cand.id, q
)
SELECT id, round(sim, 6) + 0.0 AS cos_sim,
       row_number() OVER (ORDER BY sim DESC, id) AS rk
FROM scored QUALIFY rk <= 10
"""


def mad_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outlier flags per event type
    (operators/profiling.mad_outliers) — the masking-resistant
    companion to q_outliers' z-score; exact half-integer medians."""
    from document_vector_indexer_spark.operators.profiling import mad_outliers

    ev = load_table(spark, sf_dir, "events")
    return mad_outliers(
        ev, F.rint(F.col("value") * 100).cast("long")
    ).orderBy("event_id")


SQL_MAD_OUTLIERS = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS v
  FROM events
),
m AS (SELECT event_type, quantile_cont(v, 0.5) AS med FROM c GROUP BY 1),
d AS (
  SELECT c.*, med, abs(CAST(v AS DOUBLE) - med) AS dev
  FROM c JOIN m USING (event_type)
),
s AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad,
         CAST(count(*) AS BIGINT) AS group_n
  FROM d GROUP BY 1
)
SELECT event_id, d.event_type, v AS value_cents, med, mad, group_n
FROM d JOIN s USING (event_type)
WHERE dev * 10000.0 > 44478.0 * mad
ORDER BY event_id
"""


def changepoint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint per event type
    (operators/profiling.changepoint_cusum): argmax of the n-scaled
    cumulative deviation over daily milli-cent means — all-integer
    until the reported before/after means."""
    from document_vector_indexer_spark.operators.profiling import (
        changepoint_cusum,
    )

    ev = load_table(spark, sf_dir, "events")
    return changepoint_cusum(
        ev, F.round(F.col("value") * F.lit(100.0)).cast("long")
    ).orderBy("event_type")


SQL_CHANGEPOINT = """
WITH c AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         CAST(round(value * 100.0) AS BIGINT) AS v
  FROM events
),
daily AS (
  SELECT event_type, d,
         CAST(floor(CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) * 1000.0
                    / count(v)) AS BIGINT) AS y
  FROM c GROUP BY 1, 2
),
scored AS (
  SELECT event_type, d,
         CAST(sum(y) OVER (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
           AS BIGINT) AS i,
         CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days
  FROM daily
),
dev AS (
  SELECT *, n_days * cum - i * tot AS dv FROM scored
),
pick AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY abs(dv) DESC, d) AS rk
  FROM dev
)
SELECT event_type, n_days, d AS cp_day, abs(dv) AS max_absdev,
       CAST(floor(CAST(cum AS DOUBLE) / i) AS BIGINT) AS mean_before_milli,
       CASE WHEN i < n_days THEN
         CAST(floor(CAST(tot - cum AS DOUBLE) / (n_days - i)) AS BIGINT)
       END AS mean_after_milli
FROM pick WHERE rk = 1 ORDER BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "q_sessionize": QuerySpec(
        sessionize_q,
        SQL_SESSIONIZE,
        "batch gap-sessionization of the event stream, µs-exact rollup",
    ),
    "q_scd2": QuerySpec(
        scd2_q,
        SQL_SCD2,
        "type-2 SCD intervals (gaps-and-islands CDC build) per user",
    ),
    "q_histogram": QuerySpec(
        histogram_q,
        SQL_HISTOGRAM,
        "cents-exact fixed-width value histogram per event type",
    ),
    "q_postings": QuerySpec(
        postings_q,
        SQL_POSTINGS,
        "inverted-index head: df/tf + top-5 postings for top-100 terms",
    ),
    "q_knn_lsh_pinned": QuerySpec(
        knn_lsh_pinned_q,
        SQL_KNN_LSH_PINNED,
        "sign-LSH kNN, pinned hyperplanes: oracled approximate ANN tier",
    ),
    "q_mad_outliers": QuerySpec(
        mad_outliers_q,
        SQL_MAD_OUTLIERS,
        "robust MAD outlier flags per group, exact half-integer medians",
    ),
    "q_changepoint": QuerySpec(
        changepoint_q,
        SQL_CHANGEPOINT,
        "CUSUM changepoint per group over daily means, all-integer",
    ),
}
