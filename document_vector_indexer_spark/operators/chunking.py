"""Document chunking as a distributed DataFrame operator.

Re-expresses the reference's three strategies
(``/root/reference/index_documents.py:67-134``: fixed / sentence /
paragraph) Spark-first: per-document arrays built with pure column
expressions (functions.text), then ``posexplode`` into a chunk table.

Scale design:
- The chunk array is built row-local (no shuffle); ``posexplode`` is a
  narrow transformation. The only shuffle in the whole chunking path is
  the optional deterministic-id window at the end.
- Chunk ordinal (``chunk_pos``) comes from ``posexplode`` — free and
  deterministic. A *global* dense id (the reference's SERIAL column,
  index_documents.py:217) requires a total order; we derive it with
  ``operators.ranking.global_id`` over ``(doc order, chunk_pos)`` —
  the sample-boundaries two-pass form, never an empty-partitionBy
  window (single-task at scale), only applied when the caller asks
  (``with_global_id=True``). Never ``monotonically_increasing_id`` in
  checked output (unstable across retries/partitionings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from document_vector_indexer_spark.functions import text as TX

STRATEGIES = ("fixed", "sentence", "paragraph")


def chunk_array(
    text_col: Column | str,
    strategy: str,
    chunk_size: int = 1200,
    overlap: int = 200,
) -> Column:
    """array<string> of chunks for one document's text column.

    Dispatch mirrors ``split_to_chunks`` (index_documents.py:106-134),
    including its parameter validation (index_documents.py:83-86) and
    unknown-strategy error (index_documents.py:134).
    """
    if strategy == "paragraph":
        return TX.split_paragraphs(text_col)
    if strategy == "sentence":
        return TX.group_sentences(TX.split_sentences(text_col), chunk_size)
    if strategy == "fixed":
        return TX.fixed_windows(text_col, chunk_size, overlap)
    raise ValueError(f"Unknown strategy: {strategy}")


def chunk_documents(
    df: DataFrame,
    strategy: str = "fixed",
    chunk_size: int = 1200,
    overlap: int = 200,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    with_global_id: bool = False,
) -> DataFrame:
    """documents -> chunk table ``(id_cols..., chunk_pos, chunk_text,
    split_strategy)`` with one row per chunk, document order preserved
    in ``chunk_pos`` (0-based).

    ``strategy="cdc"`` routes to the content-defined chunker (4th
    strategy beyond the reference's three): word rolling-hash
    boundaries, so chunk-level dedup stays stable under edits.
    ``chunk_size``/``overlap`` do not apply there (expected chunk
    length is CDC_DIVISOR words); single id column only.
    """
    if strategy == "cdc":
        if len(id_cols) != 1:
            raise ValueError(
                "cdc chunking keys on exactly one id column; join extra "
                f"columns back afterwards (got {id_cols})"
            )
        out = (
            chunk_cdc(df, text_col=text_col, id_col=id_cols[0])
            .drop("n_words")
            .withColumn("split_strategy", F.lit("cdc"))
        )
        if with_global_id:
            from document_vector_indexer_spark.operators.ranking import global_id

            out = global_id(out, [*id_cols, "chunk_pos"], "id")
            out = out.withColumn("id", F.col("id").cast("long"))
        return out
    arr = chunk_array(F.col(text_col), strategy, chunk_size, overlap)
    out = (
        df.select(*id_cols, F.posexplode(arr).alias("chunk_pos", "chunk_text"))
        .withColumn("split_strategy", F.lit(strategy))
    )
    if with_global_id:
        from document_vector_indexer_spark.operators.ranking import global_id

        out = global_id(out, [*id_cols, "chunk_pos"], "id")
        out = out.withColumn("id", F.col("id").cast("long"))
    return out


# --- content-defined chunking (CDC) ----------------------------------

# Rolling-window parameters: boundary after word i when the hash of
# the trailing CDC_WINDOW words ≡ CDC_DIVISOR-1 (mod CDC_DIVISOR) —
# expected chunk length = CDC_DIVISOR words. Plain Rabin-style CDC
# (no min/max clamps — FastCDC's clamps need a sequential scan; the
# unclamped form is stateless per position, hence exactly
# SQL-expressible AND embarrassingly parallel).
CDC_WINDOW = 4
CDC_DIVISOR = 64
CDC_BASE = 257
CDC_MOD = 1_000_000_007


def _cdc_word_code(w: Column) -> Column:
    """Full char-fold word hash (a*131 + codepoint) % CDC_MOD — the
    dedup._word_hash fold SHAPE, but with THIS module's modulus
    (1e9+7, not dedup's M31): the three lockstep implementations
    (this, textops._SQL_CDC_CHUNKS, tests' _py_cdc_cuts) share
    CDC_MOD, so do not consolidate with _word_hash. The earlier
    len*17+first-codepoint code was too weak here: a vocabulary
    sharing one first letter (caught by a planted adversarial test)
    yields so few distinct codes that the boundary condition can
    NEVER fire and CDC degrades to whole-doc chunks. Boundary
    diversity is load-bearing for a chunker in a way it is not for
    the fingerprint that code came from."""
    # fold over split(w, "") rather than sequence+substring: per-char
    # substring(w, i, 1) re-seeks the UTF8 string from the start (O(i)
    # — quadratic per word on the chunking hot path, measured r5:
    # chunk_cdc data cost 3.9 s -> 1.x s at sf0.1 with this + the
    # window-hash rewrite). ascii(c) == ascii(substring(w, i, 1))
    # codepoint-for-codepoint (probe-verified incl. non-ASCII), so the
    # hash VALUE is bit-identical — the SQL mirror and the pure-Python
    # test oracle are untouched.
    return F.aggregate(
        F.split(w, ""),
        F.lit(0).cast("long"),
        lambda a, c: (a * 131 + F.ascii(c)) % F.lit(CDC_MOD).cast("long"),
    )


def _cdc_window_hash(codes: Column, i: Column) -> Column:
    """Integer hash of the ≤CDC_WINDOW word CODES ending at 1-based
    ``i`` — fold (acc*B + code) % M, bit-identical in any engine.
    Unrolled to CDC_WINDOW O(1) ``element_at`` lookups on the
    precomputed code array; out-of-range leading positions contribute
    0, which is fold-identity ((0*B + 0) % M == 0), so short prefixes
    hash exactly like a clamped-slice fold. The previous
    slice+aggregate form allocated a sub-array per window POSITION —
    the r5 scaling measurement put chunk_cdc's data cost at 3.9 s for
    sf0.1 with most of it right here; hash VALUES are unchanged, so
    the SQL mirror and the pure-Python oracle are untouched."""
    mod = F.lit(CDC_MOD).cast("long")
    h = F.lit(0).cast("long")
    for back in range(CDC_WINDOW - 1, -1, -1):
        code = (
            F.when(i > back, F.element_at(codes, (i - back).cast("int")))
            .otherwise(F.lit(0))
            .cast("long")
        )
        h = (h * CDC_BASE + code) % mod
    return h


def _cdc_codes_arrow(words_df: DataFrame, id_col: str) -> DataFrame:
    """Per-word CDC codes ((charfold mod CDC_MOD) per token) computed by
    the vectorized prefix-hash kernel (dedup._gram_hash_arrays with
    k=1: a 1-word gram IS the word, so its hash is exactly
    ``_cdc_word_code``'s fold — same base 131, this module's modulus).
    Takes (id_col, words) and returns (id_col, words, codes), keeping
    the array shape the downstream window-hash expressions need.

    NOT the default route — measured and rejected (see chunk_cdc's
    ``impl`` note): the words array pays the Arrow boundary in both
    directions here, which exceeds the interpreted-fold cost it
    removes at every measured scale. Kept as the receipted dead end
    plus its exact-parity test."""
    from pyspark.sql import types as T

    from document_vector_indexer_spark.operators.dedup import _gram_hash_arrays

    out_schema = T.StructType(
        list(words_df.schema.fields)
        + [T.StructField("codes", T.ArrayType(T.LongType(), False), False)]
    )

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            out["codes"] = _gram_hash_arrays(pdf["words"], 1, CDC_MOD)
            yield out

    return words_df.mapInPandas(batches, schema=out_schema)


def chunk_cdc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "expr",
) -> DataFrame:
    """Content-defined chunking over word tokens: cut after word i
    whenever the rolling window hash hits the divisor target. The
    boundary depends only on a local window, so edits shift chunking
    for O(window) words instead of the whole document tail — THE
    chunker property that keeps chunk-level dedup stable under
    insertions (the failure mode of fixed-size chunking).

    Returns (id_col, chunk_pos, n_words, chunk_text). Scale: one
    Exchange barrier on the id (the lambda-boundary CSE rule —
    vocab_topk precedent: tokenizing behind the barrier keeps every
    downstream HOF referencing plain attributes), then everything is
    map-side; cost O(n_words × (word_len + window)) per document
    (codes fold once per word, window hashes fold over ints).

    ``impl`` (r13): ``"expr"`` (default) is the pure-JVM interpreted
    char fold; ``"arrow"`` computes the per-word codes via the
    vectorized prefix-hash kernel (``_cdc_codes_arrow`` — exact
    modular equality with the fold, arrow-vs-expr parity pinned).
    The arrow route was MEASURED AND REJECTED as the default — the
    r12 substrings transplant hypothesis was wrong here: the words
    array must round-trip the Arrow boundary both ways (385 M tokens
    materialized as Python objects at ~sf100), and that costs more
    than the interpreted fold it replaces at every measured scale
    (engine-conf ramps: 15.8 → 23.1 s at ~sf10, 104.0 → 144.4 s at
    ~sf100). By subtraction the per-word fold is a MINOR term of
    chunk_cdc's cost (≲20 s of 104 at sf100 — the window hashes, cut
    assembly, chunk slicing and explode dominate), unlike
    dup_substring_stats where per-GRAM hashing is ~k× the token
    stream and the kernel cut the op 2.6×. Kept (with its parity
    test) as the measured negative receipt so no later round
    re-litigates it. Code values are identical either way, so the SQL
    mirror (textops._SQL_CDC_CHUNKS) and the pure-Python test oracle
    are untouched by the choice.
    """
    if impl not in ("arrow", "expr"):
        raise ValueError(f"impl must be 'arrow' or 'expr': {impl!r}")
    n = F.size(F.col("words"))
    interior = F.when(
        n > 1,
        F.filter(
            F.sequence(F.lit(1), n - 1),
            lambda i: _cdc_window_hash(F.col("codes"), i)
            % CDC_DIVISOR
            == CDC_DIVISOR - 1,
        ),
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.concat(F.array(F.lit(0)), interior, F.array(n))
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(F.col("cuts")) - 1),
        lambda k: F.array_join(
            F.slice(
                F.col("words"),
                F.element_at(F.col("cuts"), k) + 1,
                F.element_at(F.col("cuts"), k + 1)
                - F.element_at(F.col("cuts"), k),
            ),
            " ",
        ),
    )
    words_df = df.repartition(F.col(id_col)).select(  # CSE barrier
        F.col(id_col), TX.word_tokens(F.col(text_col)).alias("words")
    )
    if impl == "arrow":
        coded = _cdc_codes_arrow(words_df, id_col)
    else:
        # per-word codes ONCE (multi-use alias — CollapseProject keeps
        # the stage; each window position then folds 4 ints, not 4
        # whole words)
        coded = words_df.select(
            id_col,
            "words",
            F.transform(F.col("words"), _cdc_word_code).alias("codes"),
        )
    return (
        coded.select(id_col, "words", cuts.alias("cuts"))
        .select(id_col, F.posexplode(chunks).alias("chunk_pos", "chunk_text"))
        .filter(F.length("chunk_text") > 0)
        .select(
            id_col,
            "chunk_pos",
            TX.token_count_ws(F.col("chunk_text")).alias("n_words"),
            "chunk_text",
        )
    )
