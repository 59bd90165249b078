"""Deduplication operators for LLM training-data pipelines.

Five tiers (SURVEY.md §2B vector ops + north-star extensions):
- exact         — hash group-by / keep-first (one shuffle on the hash)
- ngram_jaccard — exact n-gram set Jaccard over blocked candidate
                  pairs (explode -> equi-join on shingle; linear in
                  total shingles, never a cross join)
- simhash       — portable 32-bit SimHash as pure integer column
                  arithmetic (bit-identical in any engine)
- minhash_lsh   — MLlib MinHashLSH approx similarity join (the 100 TB
                  path: band-bucket join, candidates only)
- embedding_cosine — near-dup by embedding similarity with blocking

Everything except minhash_lsh is deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from document_vector_indexer_spark.functions import text as TX
from document_vector_indexer_spark.functions import vector as V

SIMHASH_BITS = 32
_CHAR_MOD = 2147483647  # 2^31 - 1, keeps the char-fold in long range


def exact_dedup_keep_first(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per distinct text (md5 key). One shuffle
    on the 16-byte hash, never on the full text — the at-scale form of
    dropDuplicates with a deterministic survivor."""
    w = Window.partitionBy("_text_key").orderBy(F.col(id_col))
    return (
        df.withColumn("_text_key", F.md5(F.col(text_col).cast("binary")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_text_key", "_rn")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a text column (array<string>)."""
    words = TX.word_tokens(text)
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    block_cols: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact Jaccard similarity of word n-gram sets for candidate pairs
    inside a blocking key. Explode-join shape: cost is linear in total
    shingles x average bucket size, not |df|^2 — candidate generation
    and scoring both distribute. Returns (id_a, id_b, inter, n_a, n_b,
    jaccard) with id_a < id_b.
    """
    shingled = df.select(
        *block_cols,
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).withColumn("n_shingles", F.size("shingles"))
    exploded = shingled.select(
        *block_cols, "id", "n_shingles", F.explode("shingles").alias("shingle")
    )
    a = exploded.select(
        *[F.col(c).alias(f"a_{c}") for c in block_cols],
        F.col("id").alias("id_a"),
        F.col("n_shingles").alias("n_a"),
        "shingle",
    )
    b = exploded.select(
        *[F.col(c).alias(f"b_{c}") for c in block_cols],
        F.col("id").alias("id_b"),
        F.col("n_shingles").alias("n_b"),
        "shingle",
    )
    cond = [a["shingle"] == b["shingle"]] + [
        a[f"a_{c}"] == b[f"b_{c}"] for c in block_cols
    ]
    pairs = (
        a.join(b, cond)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("inter"))
    )
    return pairs.withColumn(
        "jaccard",
        F.col("inter").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("inter")),
    )


def _word_hash(w: Column) -> Column:
    """Portable char-fold hash: fold(chars, 0, a -> (a*131 + ascii) % M).
    Pure integer arithmetic over substr/ascii — reproducible in any
    engine, unlike murmur-based builtins."""
    return F.aggregate(
        F.sequence(F.lit(1), F.length(w)),
        F.lit(0).cast("long"),
        lambda a, i: (a * 131 + F.ascii(F.substring(w, i, F.lit(1))))
        % F.lit(_CHAR_MOD).cast("long"),
    )


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash: per-bit majority vote over word hashes, as a pure
    column expression. bit b of the result is 1 iff
    ``sum over words of (word_hash bit b ? +1 : -1) > 0``.
    """
    hashes = F.transform(TX.word_tokens(text), _word_hash)
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(
                (h.cast("long") / F.pow(F.lit(2.0), b.cast("double")).cast("long"))
                .cast("long") % 2 == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        ),
    )
    # fold bit votes into the integer: sum of 2^b over positive-vote bits
    return F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, b: F.when(
                v > 0, F.pow(F.lit(2.0), b.cast("double")).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hash_tables: int = 8,
    num_features: int = 1 << 16,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs via MinHashLSH over hashed word-set
    features: shingle -> HashingTF sparse vector -> minhash bands ->
    approxSimilarityJoin (equi-join on band buckets — the standard
    web-scale dedup pipeline). Returns (id_a, id_b, jaccard_dist).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    words = df.select(
        F.col(id_col).alias("id"), TX.word_tokens(F.col(text_col)).alias("words")
    ).filter(F.size("words") > 0)
    tf = HashingTF(inputCol="words", outputCol="features", numFeatures=num_features, binary=True)
    feat = tf.transform(words)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    ).fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, 1.0 - threshold, distCol="jaccard_dist")
    return (
        joined.select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            "jaccard_dist",
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    block_col: str | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-dup pairs by embedding cosine >= threshold, optionally
    blocked (e.g. by cluster label / LSH bucket) so the self-join is
    per-block instead of global. Returns (id_a, id_b, sim)."""
    a = df.select(
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = df.select(
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    joined = a.join(b, on="blk" if block_col else None, how="inner") if block_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", V.cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
