"""Training-data preparation operators: deterministic splits, sequence
packing, and repetition scoring — the ops a pretraining pipeline runs
between dedup and the trainer.

Everything here is deterministic pure-column arithmetic (no RNG state,
no UDFs), so results are reproducible run-to-run, engine-portable, and
oracle-checkable — at 100 TB that determinism is what makes a split or
a pack assignment auditable and resumable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from document_vector_indexer_spark.functions import text as TX

_M31 = 2147483647  # the engine's portable-hash modulus (operators/dedup.py)


def portable_hash_fraction(key: Column, salt: str = "") -> Column:
    """Map a key to a deterministic fraction in [0, 1): char-fold hash
    of ``salt:key``, then three Lehmer/minstd scrambling rounds
    (h <- h*48271 mod M31), divided by M31. Pure integer arithmetic
    reproducible in any engine; the salt decorrelates independent uses
    (split vs sampling vs sharding) of the same key.

    The Lehmer rounds are load-bearing: the raw char fold of a short
    sequential key ('split:123' is ~9 chars) wraps the modulus only a
    few times and lands wildly non-uniform (measured deciles up to 5x
    over/under on 20k sequential ids); two full-period MLCG rounds
    already restore every decile to 1.00 +/- 0.01, three adds margin.

    Map-side only: at any scale this is a projection, no shuffle."""
    s = F.concat_ws(":", F.lit(salt), key.cast("string"))
    h = F.aggregate(
        F.sequence(F.lit(1), F.length(s)),
        F.lit(0).cast("long"),
        lambda a, i: (a * 131 + F.ascii(F.substring(s, i, F.lit(1))))
        % F.lit(_M31).cast("long"),
    )
    for _ in range(3):
        h = (h * 48271) % F.lit(_M31).cast("long")
    return h.cast("double") / F.lit(float(_M31))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashing its id against
    cumulative weight thresholds. Unlike ``randomSplit`` this is stable
    across runs, partitionings, and engines: a doc's split is a pure
    function of (salt, id), so re-running the pipeline on a grown
    corpus never moves an existing doc between train and test
    (the leakage-on-refresh failure mode of sampled splits).

    Adds a ``split`` column; no shuffle."""
    total = sum(w for _, w in weights)
    frac = portable_hash_fraction(F.col(id_col), salt=salt)
    expr = None
    acc = 0.0
    for name, w in weights[:-1]:
        acc += w / total
        cond = frac < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = weights[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def pack_sequences(
    df: DataFrame,
    context_len: int,
    token_col: Column | str,
    order_col: str = "doc_id",
    part_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign docs to fixed-budget packs by running-token offset — the
    concat-then-chunk sequence packing used to build pretraining
    batches. Pack p of stream s covers token offsets
    [p*context_len, (p+1)*context_len); a doc starts in the pack its
    cumulative offset falls into and ``straddles`` marks docs crossing
    a pack boundary (split across two training sequences).

    Deterministic: the (part_col, order_col) stream order fully fixes
    the assignment. Scale: one shuffle — the window partitions by
    ``part_col`` (stream id); production packs per shard/date stream,
    so no global ordering is ever needed. The whole assignment is one
    window cumsum, no iteration.

    Adds (tokens, pack_id, pack_offset, straddles)."""
    tokens = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn("tokens", tokens.cast("long"))
    cum_before = F.coalesce(F.sum("tokens").over(w), F.lit(0).cast("long"))
    return (
        out.withColumn("pack_offset", cum_before % context_len)
        .withColumn(
            "pack_id",
            F.concat_ws(
                ":", F.col(part_col), (cum_before / context_len).cast("long")
            ),
        )
        .withColumn(
            "straddles",
            (F.col("pack_offset") + F.col("tokens")) > F.lit(context_len),
        )
    )


def repetition_ratio_from_words(words: Column, n: int = 2) -> Column:
    """Within-document repetition: 1 - distinct/total word n-grams —
    the duplicate-n-gram-fraction quality signal (high values flag
    boilerplate and degenerate repetition). NULL when the doc has no
    n-grams.

    Takes a MATERIALIZED words array: element_at inside the transform
    lambda re-evaluates the words expression per element (lambda
    boundary CSE, see ngram_jaccard_pairs), so bulk callers must put an
    Exchange between tokenization and this expression."""
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    return F.when(
        total > 0,
        1.0 - F.size(F.array_distinct(grams)).cast("double") / total.cast("double"),
    )


def repetition_ratio(text: Column | str, n: int = 2) -> Column:
    """``repetition_ratio_from_words`` over freshly tokenized text —
    fine ad hoc / unit scale; for bulk use the from_words form behind
    an Exchange (the tokenizer re-evaluates per element here)."""
    col = F.col(text) if isinstance(text, str) else text
    return repetition_ratio_from_words(TX.word_tokens(col), n=n)
