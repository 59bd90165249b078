"""Full-text retrieval operators: BM25 ranked search and per-document
TF-IDF keyword extraction.

The reference delegates ALL retrieval to pgvector's vector similarity
(reference README.md:16, 170-172 — "foundation for semantic search and
RAG-style pipelines"); a production RAG store pairs that with lexical
(BM25) retrieval for hybrid search, which is what this module adds,
Spark-natively.

Determinism discipline (same as textanalysis.collocations_pmi /
unigram_logprob_scores): every count stays an exact integer through the
shuffles; exactly ONE double expression per scored row, written with
explicit parenthesization mirrored verbatim in the DuckDB oracle, then
quantized ``floor(x * 1e6)`` to a long so ordering, top-k cuts and the
driver hash are integer-exact. Division and sqrt are IEEE
correctly-rounded (identical cross-engine on identical inputs); ln is
the one last-ulp risk, accepted since round 3 (collocations precedent —
the 1e6 quantum makes a boundary flip astronomically unlikely).

Scale shapes (100 TB):
- ``bm25_topk``: the query-term filter is applied MAP-SIDE before any
  aggregation, so the per-term frame holds only docs containing a query
  term; document length is computed in the same projection (no second
  scan of the token stream). The df-per-term aggregate has at most
  |query| groups and joins back as a true broadcast (bounded by the
  query, not the corpus). Corpus totals (N, avgdl) ride a 1-row
  broadcast. Final top-k is TakeOrdered — never a global sort.
- ``tfidf_keywords``: one (doc, word) aggregation, one word-keyed df
  aggregation, one word-keyed shuffle join (shuffle_hash pinned, NOT
  broadcast — a web corpus's vocabulary need not fit an executor), then
  a per-doc window for the top-n cut (partitioned by doc_id — bounded
  by the doc's distinct words, never global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from document_vector_indexer_spark.functions import text as TX

# Lucene-style BM25 constants, as exactly-representable-or-shared
# double literals (both engines parse "1.2"/"0.75" to the same bits).
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25 (Robertson &
    Spärck Jones; the Lucene ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    non-negative idf variant).

    Per (doc, term): score = idf(term) * (tf * (k1+1)) /
    (tf + k1 * (1 - b + b * dl/avgdl)), quantized to
    ``floor(score * 1e6)`` per TERM and integer-summed per doc — the
    per-term quantization is what makes the cross-engine doc score
    exact (a float sum over terms would be association-sensitive).

    Output: (doc_id, n_hit_terms, score_q) — top k by (score_q desc,
    doc_id) so the LIMIT set is unique.
    """
    terms = tuple(dict.fromkeys(query_terms))  # dedup, keep order
    if not terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    words = F.filter(
        TX.word_tokens(F.col(text_col)), lambda w: w.isin(*terms)
    )
    # One projection computes doc length AND all per-term tfs map-side.
    per_term = (
        df.select(
            F.col(id_col),
            F.size(TX.word_tokens(F.col(text_col))).cast("long").alias("dl"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"),
                            F.size(
                                F.filter(words, lambda w: w == F.lit(t))
                            )
                            .cast("long")
                            .alias("tf"),
                        )
                        for t in terms
                    ]
                )
            ).alias("ht"),
        )
        .select(id_col, "dl", "ht.term", "ht.tf")
        .filter(F.col("tf") > 0)
    )
    corpus = df.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(TX.word_tokens(F.col(text_col))).cast("long"))
        .cast("long")
        .alias("sum_dl"),
    )
    df_t = per_term.groupBy("term").agg(
        F.count("*").cast("long").alias("df_t")
    )
    joined = per_term.join(F.broadcast(df_t), "term").join(F.broadcast(corpus))
    # ONE double expression, parenthesization mirrored in the oracle.
    n = F.col("n_docs").cast("double")
    dft = F.col("df_t").cast("double")
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(F.lit(1.0) + (n - dft + F.lit(0.5)) / (dft + F.lit(0.5)))
    denom = tf + F.lit(BM25_K1) * (
        F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * (dl / avgdl)
    )
    term_q = F.floor(
        idf * ((tf * F.lit(BM25_K1 + 1.0)) / denom) * F.lit(1e6)
    ).cast("long")
    scored = joined.select(F.col(id_col), term_q.alias("term_q"))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_hit_terms"),
            F.sum("term_q").cast("long").alias("score_q"),
        )
        .orderBy(F.col("score_q").desc(), F.col(id_col))
        .limit(k)
    )


def tfidf_keywords(
    df: DataFrame,
    topn: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-n keywords per document by tf·idf, idf = ln(N/df) over
    document frequency. Output (doc_id, kw_rank, word, tfidf_q) with
    tfidf_q = floor(tf * ln(N/df) * 1e6); ties broken by word so the
    per-doc cut is unique. Corpus-frequency words get idf 0 and rank
    below rarer words — the classic keyword signal."""
    # Map-side explode + PARTIAL aggregation, then one (doc, word)
    # shuffle of the already-combined tf triples — deliberately NOT a
    # repartition-by-doc first: that would shuffle the full text,
    # while the partial agg shrinks the shuffle to the per-doc
    # distinct-word table.
    toks = df.select(
        F.col(id_col), F.explode(TX.word_tokens(F.col(text_col))).alias("word")
    )
    tf = toks.groupBy(id_col, "word").agg(
        F.count("*").cast("long").alias("tf")
    )
    dfreq = tf.groupBy("word").agg(F.count("*").cast("long").alias("df_w"))
    n_docs = df.agg(F.count("*").cast("long").alias("n_docs"))
    score_q = F.floor(
        F.col("tf").cast("double")
        * F.log(F.col("n_docs").cast("double") / F.col("df_w").cast("double"))
        * F.lit(1e6)
    ).cast("long")
    scored = (
        tf.join(dfreq.hint("shuffle_hash"), "word")
        .join(F.broadcast(n_docs))
        .select(F.col(id_col), "word", score_q.alias("tfidf_q"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_q").desc(), F.col("word")
    )
    return (
        scored.withColumn("kw_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("kw_rank") <= topn)
        .select(id_col, "kw_rank", "word", "tfidf_q")
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    rank_a_col: str = "rank_a",
    rank_b_col: str = "rank_b",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of two
    ranked retrieval lists — the standard hybrid-search combiner for a
    lexical (BM25) + vector (kNN) RAG store.

    RRF(d) = Σ_r 1/(c + rank_r(d)), computed in exact integer space as
    ``floor(1e9 / (c + rank))`` per list then integer-summed, so the
    fused ordering is deterministic cross-engine (rank-based fusion is
    the point: the two retrievers' raw scores never mix).

    Inputs are (id, rank) frames ALREADY cut to top-k' by their
    retrievers, so both sides are bounded by k', never by the corpus —
    the join is trivially broadcastable and the final top-k sorts a
    ≤ 2k'-row frame.
    """
    # Input contract: ranks are 1-based. Guarded because this operator's
    # OWN output uses rank 0 for "not retrieved" — feeding a fused list
    # back in unguarded would award 1e9/(c+0) credit for absent docs.
    a = ranked_a.filter(F.col(rank_a_col) >= 1).select(
        F.col(id_col), F.col(rank_a_col).alias("__ra")
    )
    b = ranked_b.filter(F.col(rank_b_col) >= 1).select(
        F.col(id_col), F.col(rank_b_col).alias("__rb")
    )
    fused = a.join(b, id_col, "full_outer").select(
        F.col(id_col),
        (
            F.coalesce(
                F.floor(F.lit(1_000_000_000) / (F.lit(c) + F.col("__ra"))), F.lit(0)
            )
            + F.coalesce(
                F.floor(F.lit(1_000_000_000) / (F.lit(c) + F.col("__rb"))), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_q"),
        # rank 0 = "not retrieved by this list" — kept non-null so the
        # output hashes as pure integers in any engine/dataframe bridge
        F.coalesce(F.col("__ra"), F.lit(0)).cast("long").alias("rank_lex"),
        F.coalesce(F.col("__rb"), F.lit(0)).cast("long").alias("rank_vec"),
    )
    return fused.orderBy(F.col("rrf_q").desc(), F.col(id_col)).limit(k)


def build_postings(
    df: DataFrame,
    head: int = 5,
    top_words: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the head of an inverted index: per term, document
    frequency, total term frequency, and the top-``head`` posting doc
    ids by (tf desc, doc_id) — the artifact a lexical search engine
    (the BM25 consumer above) builds at ingest time; restricted to the
    ``top_words`` highest-df terms so the output is bounded and the
    driver hash stable. Postings render as a comma-joined string (the
    q_agg_collect precedent: list-order-proof hashing).

    Scale shape: explode -> ONE (word, doc) partial/final aggregation
    carries (word, doc_id, tf) triples — never text — through the
    single corpus-sized shuffle. Both downstream frames reuse that
    word-keyed partitioning: the df/tf rollup aggregates in place, and
    the per-word top-``head`` cut is a word-partitioned window that
    Catalyst executes as WindowGroupLimit (partial top-k before any
    further movement), so the collect_list holds at most ``head``
    structs per word — a stopword with df = |corpus| contributes
    exactly ``head`` rows, not |corpus|. Final top_words cut is
    TakeOrdered, never a global sort.
    """
    tf = (
        df.select(
            F.col(id_col), F.explode(TX.word_tokens(F.col(text_col))).alias("word")
        )
        .groupBy("word", id_col)
        .agg(F.count("*").cast("long").alias("tf"))
    )
    stats = tf.groupBy("word").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("tf_total"),
    )
    w = Window.partitionBy("word").orderBy(F.col("tf").desc(), F.col(id_col))
    heads = (
        tf.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= head)
        .groupBy("word")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                (-F.col("tf")).alias("ntf"),
                                F.col(id_col).alias("d"),
                            )
                        )
                    ),
                    lambda x: x["d"].cast("string"),
                ),
            ).alias("postings_head")
        )
    )
    return (
        stats.join(heads, "word")
        .orderBy(F.col("df").desc(), "word")
        .limit(top_words)
        .select("word", "df", "tf_total", "postings_head")
    )
