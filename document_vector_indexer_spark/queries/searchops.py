"""Search & data-quality analytics queries: BM25 ranked retrieval,
TF-IDF keyword extraction, C4-style line cleaning, exact z-score
outlier detection.

The reference delegates retrieval to pgvector (reference
README.md:16,170-172); a production RAG/training-data store pairs
vector search with lexical BM25 (hybrid retrieval), per-doc keywords,
line-level corpus hygiene (C4, Raffel et al. 2020 §2.2) and telemetry
anomaly flags — none exist in the reference; all are SURVEY §2B
north-star surface.

The word-soup corpus has only single-line docs and no C4-trigger
lines, so ``q_c4_lines`` PLANTS its line structure deterministically
inside the query and the oracle mirrors the construction — the same
precedent as q_dedup_lines / q_redact_pii (green rows check real
filtering, not a vacuous pass-through).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from document_vector_indexer_spark.io import load_table
from document_vector_indexer_spark.operators.profiling import zscore_outliers
from document_vector_indexer_spark.operators.search import bm25_topk, tfidf_keywords
from document_vector_indexer_spark.operators.textanalysis import c4_line_stats
from document_vector_indexer_spark.queries.base import QuerySpec
from document_vector_indexer_spark.queries.textops import _DUCK_WORDS
from document_vector_indexer_spark.queries.vectorops import SQL_COSINE

# Fixed bag-of-words query for q_bm25; mid-df corpus words so tf and
# doc-length normalization (not mere presence) drive the ranking.
BM25_TERMS = ("vector", "stream", "hash")


def bm25_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 docs for BM25_TERMS (operators/search.bm25_topk):
    map-side term filter -> |query|-group df agg broadcast back ->
    per-term fixed-point scores integer-summed per doc -> TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=20)


_TERMS_VALUES = ", ".join(f"('{t}')" for t in BM25_TERMS)

# Shared CTE body: per-doc BM25 aggregates (doc_id, n_hit_terms,
# score_q), no LIMIT — q_bm25 cuts top-20, q_hybrid_rrf ranks top-50.
_SQL_BM25_CORE = f"""
WITH w AS (
  SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS words FROM documents
),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(words)) AS BIGINT) AS sum_dl
  FROM w
),
per_term AS (
  SELECT doc_id, CAST(len(words) AS BIGINT) AS dl, t.term,
         CAST(len(list_filter(words, x -> x = t.term)) AS BIGINT) AS tf
  FROM w, (VALUES {_TERMS_VALUES}) t(term)
  WHERE len(list_filter(words, x -> x = t.term)) > 0
),
dft AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df_t FROM per_term GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         CAST(floor(
           ln(1.0 + (CAST(c.n_docs AS DOUBLE) - CAST(d.df_t AS DOUBLE) + 0.5)
                    / (CAST(d.df_t AS DOUBLE) + 0.5))
           * ((CAST(p.tf AS DOUBLE) * 2.2)
              / (CAST(p.tf AS DOUBLE)
                 + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(p.dl AS DOUBLE)
                     / (CAST(c.sum_dl AS DOUBLE) / CAST(c.n_docs AS DOUBLE))))))
           * 1e6) AS BIGINT) AS term_q
  FROM per_term p JOIN dft d USING (term) CROSS JOIN corpus c
)
,
bm25_agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
         CAST(sum(term_q) AS BIGINT) AS score_q
  FROM scored GROUP BY doc_id
)"""

SQL_BM25 = (
    _SQL_BM25_CORE
    + """
SELECT doc_id, n_hit_terms, score_q
FROM bm25_agg ORDER BY score_q DESC, doc_id LIMIT 20
"""
)


def keywords_tfidf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per doc (operators/search.tfidf_keywords):
    (doc,word) agg -> word-keyed df agg -> shuffle-hash join (vocab is
    never broadcast) -> per-doc window top-3."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_keywords(docs, topn=3)


SQL_KEYWORDS_TFIDF = f"""
WITH w AS (
  SELECT doc_id, unnest({_DUCK_WORDS.format(col="text")}) AS word
  FROM documents
),
tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2
),
dfw AS (SELECT word, CAST(count(*) AS BIGINT) AS df_w FROM tf GROUP BY 1),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, word,
         CAST(floor(CAST(tf AS DOUBLE)
           * ln(CAST(n_docs AS DOUBLE) / CAST(df_w AS DOUBLE))
           * 1e6) AS BIGINT) AS tfidf_q
  FROM tf JOIN dfw USING (word) CROSS JOIN nd
),
r AS (
  SELECT doc_id, word, tfidf_q,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_q DESC, word) AS rn
  FROM scored
)
SELECT doc_id, CAST(rn AS BIGINT) AS kw_rank, word, tfidf_q
FROM r WHERE rn <= 3
"""


def outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z>3 outliers over events.value
    (operators/profiling.zscore_outliers): cents-exact integer
    variance test; tiny stats agg broadcast back, map-side filter —
    the event stream itself never shuffles."""
    events = load_table(spark, sf_dir, "events")
    return zscore_outliers(
        events, F.round(F.col("value") * F.lit(100.0)).cast("long")
    ).orderBy("event_id")


SQL_OUTLIERS = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(round(value * 100.0) AS BIGINT) AS v
  FROM events
),
s AS (
  -- HUGEINT (int128) mirrors the Spark side's DECIMAL(38,0)
  -- promotion (r10): at ~sf1 the num² term passes 2^63, so the
  -- whole comparison runs in 128-bit on both engines
  SELECT event_type, CAST(count(v) AS BIGINT) AS n,
         CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS HUGEINT) AS q
  FROM c GROUP BY 1
),
f AS (
  SELECT c.event_id, c.event_type, c.v, s.n,
         CAST(s.n AS HUGEINT) * CAST(c.v AS HUGEINT) - s.s AS num,
         CAST(s.n AS HUGEINT) * s.q - s.s * s.s AS den
  FROM c JOIN s USING (event_type)
)
SELECT event_id, event_type, v AS value_cents, n AS group_n,
       CAST(floor(abs(num)::DOUBLE / sqrt(den::DOUBLE) * 1000.0)
            AS BIGINT) AS z_milli_obs
FROM f WHERE num * num > CAST(9 AS HUGEINT) * den ORDER BY event_id
"""


def c4_lines_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-filter over deterministically planted line structure
    (see module docstring): per surviving doc, line counts + cleaned-
    text md5. Entirely map-side."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.filter(F.split("text", "[ ]+"), lambda w: w != "")
    planted = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.array_join(F.slice(words, 1, 6), " "), F.lit(".")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("menu { javascript }")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.element_at(words, 1), F.lit(" ok.")),
            ),
            F.when(F.col("doc_id") % 2 == 0, F.array_join(F.slice(words, 7, 5), " ")),
            F.when(F.col("doc_id") % 11 == 0, F.lit("Lorem ipsum dolor sit amet.")),
            F.concat(
                F.lit("ref doc "),
                F.col("doc_id").cast("string"),
                F.lit(" endline."),
            ),
        ).alias("text"),
    )
    st = c4_line_stats(F.col("text"))
    return (
        planted.filter(~st["doc_drop"])
        .select(
            "doc_id",
            st["n_lines"].alias("n_lines"),
            st["n_kept"].alias("n_kept"),
            F.md5(st["cleaned"].cast("binary")).alias("cleaned_md5"),
        )
        .orderBy("doc_id")
    )


SQL_C4_LINES = f"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, ' +'), x -> x <> '') AS w
  FROM documents
),
planted AS (
  SELECT doc_id,
         concat_ws(chr(10),
           array_to_string(w[1:6], ' ') || '.',
           CASE WHEN doc_id % 3 = 0 THEN 'menu {{ javascript }}' END,
           CASE WHEN doc_id % 4 = 0 THEN w[1] || ' ok.' END,
           CASE WHEN doc_id % 2 = 0 THEN array_to_string(w[7:11], ' ') END,
           CASE WHEN doc_id % 11 = 0 THEN 'Lorem ipsum dolor sit amet.' END,
           'ref doc ' || CAST(doc_id AS VARCHAR) || ' endline.'
         ) AS text
  FROM words
),
l AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines
  FROM planted
  WHERE NOT contains(lower(text), 'lorem ipsum')
),
k AS (
  SELECT doc_id, lines,
         list_filter(lines, x ->
           len(list_filter(string_split_regex(x, ' +'), y -> y <> '')) >= 3
           AND (ends_with(x, '.') OR ends_with(x, '!') OR ends_with(x, '?')
                OR ends_with(x, '."') OR ends_with(x, '!"')
                OR ends_with(x, '?"'))
           AND NOT contains(lower(x), '{{')
           AND NOT contains(lower(x), '}}')
           AND NOT contains(lower(x), 'javascript')) AS kept
  FROM l
)
SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       md5(array_to_string(kept, chr(10))) AS cleaned_md5
FROM k ORDER BY doc_id
"""


def hybrid_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators/search.rrf_fuse): BM25 top-50 for
    BM25_TERMS fused with cosine kNN top-50 for the vec_id=0 query
    vector (embeddings.vec_id aligns 1:1 with documents.doc_id in the
    testdata) by reciprocal-rank fusion, top-10 out. Both inputs are
    top-k'-bounded before the fuse, so the rank windows and the
    full-outer join run on ≤50-row frames — never the corpus."""
    from document_vector_indexer_spark.operators.search import rrf_fuse
    from document_vector_indexer_spark.operators.similarity import knn_brute
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    lex = bm25_topk(docs, BM25_TERMS, k=50).withColumn(
        "rank_a",
        F.row_number()
        .over(Window.orderBy(F.col("score_q").desc(), F.col("doc_id")))
        .cast("long"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("qid"), "embedding"
    )
    vec = knn_brute(emb.filter(F.col("vec_id") != 0), query, k=50).select(
        F.col("id").alias("doc_id"), F.col("rk").alias("rank_b")
    )
    return rrf_fuse(lex, vec, k=10)


SQL_HYBRID_RRF = (
    _SQL_BM25_CORE
    + f""",
lex AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS BIGINT)
           AS ra
  FROM bm25_agg QUALIFY ra <= 50
),
qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
knn AS (
  SELECT vec_id AS doc_id,
         CAST(row_number() OVER (
           ORDER BY {SQL_COSINE('embedding', 'q_vec')} DESC, vec_id
         ) AS BIGINT) AS rb
  FROM embeddings, qv WHERE vec_id <> 0
  QUALIFY rb <= 50
),
fused AS (
  SELECT COALESCE(lex.doc_id, knn.doc_id) AS doc_id,
         COALESCE(CAST(floor(1000000000 / (60 + ra)) AS BIGINT), 0)
         + COALESCE(CAST(floor(1000000000 / (60 + rb)) AS BIGINT), 0)
           AS rrf_q,
         COALESCE(ra, 0) AS rank_lex, COALESCE(rb, 0) AS rank_vec
  FROM lex FULL OUTER JOIN knn ON lex.doc_id = knn.doc_id
)
SELECT doc_id, rrf_q, rank_lex, rank_vec
FROM fused ORDER BY rrf_q DESC, doc_id LIMIT 10
"""
)


def trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend over daily mean value
    (operators/profiling.group_trend): two tiny partial+final aggs,
    all-integer closed-form sums, one double expression per output
    row. 'Is this metric drifting, and how linear is the drift?'"""
    from document_vector_indexer_spark.operators.profiling import group_trend

    events = load_table(spark, sf_dir, "events")
    return group_trend(
        events, F.round(F.col("value") * F.lit(100.0)).cast("long")
    ).orderBy("event_type")


SQL_TREND = """
WITH c AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(round(value * 100.0) AS BIGINT) AS v
  FROM events
),
daily AS (
  SELECT event_type, x,
         CAST(floor(CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) * 1000.0
                    / count(v)) AS BIGINT) AS y
  FROM c GROUP BY 1, 2
),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM daily GROUP BY 1
)
SELECT event_type, n_days,
       CASE WHEN n_days * sxx - sx * sx > 0 THEN
         CAST(floor(CAST(n_days * sxy - sx * sy AS DOUBLE)
                    / CAST(n_days * sxx - sx * sx AS DOUBLE) * 1e6)
              AS BIGINT) END AS slope_micro,
       CASE WHEN n_days * sxx - sx * sx > 0
             AND n_days * syy - sy * sy > 0 THEN
         CAST(floor(CAST(n_days * sxy - sx * sy AS DOUBLE)
                    * CAST(n_days * sxy - sx * sy AS DOUBLE)
                    / (CAST(n_days * sxx - sx * sx AS DOUBLE)
                       * CAST(n_days * syy - sy * sy AS DOUBLE)) * 1e6)
              AS BIGINT) END AS r2_ppm
FROM s ORDER BY event_type
"""


def bigram_lm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram-LM NLL per doc
    (operators/textanalysis.bigram_logprob_scores) — the next quality
    rung above q_unigram_logprob: random word order scores high even
    when the words are common."""
    from document_vector_indexer_spark.operators.textanalysis import (
        bigram_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob_scores(docs)


SQL_BIGRAM_LM = f"""
WITH w AS (
  SELECT doc_id, {_DUCK_WORDS.format(col="text")} AS w FROM documents
),
st AS (
  SELECT doc_id, b['w1'] AS w1, b['bg'] AS bg
  FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w) - 1),
             i -> struct_pack(w1 := w[i], bg := w[i] || ' ' || w[i + 1])))
             AS b
    FROM w WHERE len(w) >= 2
  )
),
bgc AS (SELECT w1, bg, CAST(count(*) AS BIGINT) AS c_ab FROM st GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM st GROUP BY 1),
vs AS (
  SELECT CAST(count(DISTINCT word) AS BIGINT) AS v
  FROM (SELECT unnest(w) AS word FROM w)
),
wt AS (
  SELECT bg,
         CAST(floor(ln(CAST(c_ab + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE))
                    * 1e6) AS BIGINT) AS w_b
  FROM bgc JOIN ctx USING (w1) CROSS JOIN vs
)
SELECT doc_id, count(*) AS n_bigrams,
       -CAST(CAST(sum(w_b) AS BIGINT) AS DOUBLE)
         / (CAST(count(*) AS DOUBLE) * 1e6) AS avg_nll2
FROM st JOIN wt USING (bg)
GROUP BY doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "q_bm25": QuerySpec(
        bm25_q,
        SQL_BM25,
        "BM25 top-20 lexical retrieval (Lucene idf), fixed-point exact",
    ),
    "q_keywords_tfidf": QuerySpec(
        keywords_tfidf_q,
        SQL_KEYWORDS_TFIDF,
        "top-3 TF-IDF keywords per document, fixed-point exact",
    ),
    "q_outliers": QuerySpec(
        outliers_q,
        SQL_OUTLIERS,
        "per-type z>3 outliers on events.value, cents-exact integer test",
    ),
    "q_c4_lines": QuerySpec(
        c4_lines_q,
        SQL_C4_LINES,
        "C4-style line filtering on planted line structure, md5-verified",
    ),
    "q_hybrid_rrf": QuerySpec(
        hybrid_rrf_q,
        SQL_HYBRID_RRF,
        "hybrid retrieval: BM25 + cosine kNN fused by reciprocal rank",
    ),
    "q_trend": QuerySpec(
        trend_q,
        SQL_TREND,
        "per-group daily-mean least-squares trend, all-integer sums",
    ),
    "q_bigram_lm": QuerySpec(
        bigram_lm_q,
        SQL_BIGRAM_LM,
        "add-one bigram-LM NLL quality score per document",
    ),
}
