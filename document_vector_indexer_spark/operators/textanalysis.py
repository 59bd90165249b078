"""Text-analysis operators for LLM training-data pipelines:
language-ID, quality scoring, token counting, fingerprinting.

All pure column expressions (JVM-side, codegen-friendly) so they run
at full scan speed over 100 TB — no Python in the hot path. Each is a
deterministic function of the text, so each is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from document_vector_indexer_spark.functions import text as TX

# Tiny per-language stopword signals for the n-gram/stopword heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "is", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}

CJK_RANGE = "[\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}]"
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
FP_MOD = 1_000_000_007


def _stop_count(words: Column, stops: tuple[str, ...]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*stops)))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: CJK script detection, then stopword-count
    argmax over the language table, defaulting to 'en'.

    Deliberately rule-based and deterministic (no model) so it is
    SQL-expressible and auditable; swap in a real classifier via the
    same column contract when available.
    """
    c = F.col(text) if isinstance(text, str) else text
    words = TX.word_tokens(F.lower(c))
    scores = {lang: _stop_count(words, stops) for lang, stops in LANG_STOPWORDS.items()}
    best_non_en = (
        F.when(
            (scores["de"] >= scores["fr"]) & (scores["de"] >= scores["es"]),
            F.lit("de"),
        )
        .when(scores["fr"] >= scores["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    best_score = F.greatest(scores["de"], scores["fr"], scores["es"])
    return (
        F.when(c.rlike(CJK_RANGE), F.lit("zh"))
        .when(best_score > scores["en"], best_non_en)
        .otherwise(F.lit("en"))
    )


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, word stats, stopword ratio,
    punctuation density, type-token ratio. Divisions are int/int ->
    double (single IEEE op, engine-exact)."""
    c = F.col(text) if isinstance(text, str) else text
    words = TX.word_tokens(c)
    n_words = F.size(words)
    n_chars = F.length(c)
    distinct_words = F.size(F.array_distinct(words))
    stop_cnt = _stop_count(words, STOPWORDS)
    punct_cnt = n_chars - F.length(F.regexp_replace(c, "[.,;:!?]", ""))
    word_len_sum = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "n_distinct_words": distinct_words.cast("long"),
        "ttr": distinct_words.cast("double") / n_words,
        "stop_ratio": stop_cnt.cast("double") / n_words,
        "punct_ratio": punct_cnt.cast("double") / n_chars,
        "avg_word_len": word_len_sum.cast("double") / n_words,
    }


def quality_score(text: Column | str) -> Column:
    """Composite [0,1]-ish quality score from hard-coded feature weights
    (a transparent heuristic, not a trained model)."""
    f = quality_features(text)
    length_ok = (f["n_chars"] >= 100).cast("double")
    ttr_term = F.least(f["ttr"] * 2, F.lit(1.0))
    stop_term = F.least(f["stop_ratio"] * 5, F.lit(1.0))
    return (0.4 * length_ok + 0.3 * ttr_term + 0.3 * stop_term).alias("quality")


# PII-ish patterns, RE2/Java-portable (no lookaround). Deliberately
# simple: production scrubbing layers domain-specific patterns on the
# same redact() contract.
# Order is load-bearing (dict order = application order): EMAIL first
# (digits inside emails must not half-match phones), SSN before PHONE
# (an SSN is also a valid phone-pattern match), PHONE last.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "SSN": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "IPV4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "PHONE": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
}


def redact(text: Column | str, kinds: tuple[str, ...] = tuple(PII_PATTERNS)) -> Column:
    """Scrub PII-shaped spans, replacing each with ``[KIND]`` — the
    standard pre-training text-hygiene pass, as pure regexp_replace
    chain (scan-speed, no UDF). Applied in PII_PATTERNS order — see
    the ordering note there."""
    c = F.col(text) if isinstance(text, str) else text
    for kind in kinds:
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"[{kind}]")
    return c


def redaction_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind count of PII-shaped spans in a text column."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("long")
        for kind, pat in PII_PATTERNS.items()
    }


def fingerprint(text: Column | str) -> Column:
    """Order-sensitive rolling hash over word tokens (mod 1e9+7):
    ``fp = fold(words, 0, (acc, w) -> (acc*31 + len(w)*17 + ascii(w)) % M)``.
    Pure integer arithmetic — bit-identical in any engine."""
    words = TX.word_tokens(text)
    mapped = F.transform(words, lambda w: F.length(w) * 17 + F.ascii(w))
    return F.aggregate(
        mapped,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(FP_MOD).cast("long"),
    )


def vocab_topk(
    df,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Corpus vocabulary: top-``k`` words by document frequency (ties
    broken by total occurrences, then the word itself — a total order,
    so the cut at ``k`` is deterministic). The tokenizer-vocabulary /
    stopword-discovery pass of a corpus build.

    Scale shape: tokenize behind the Exchange barrier (lambda-boundary
    CSE), explode, then ONE word-keyed aggregation computing both
    counts — ``count_distinct(id)`` runs as a partial-agg expand, never
    a second pass over the corpus — and a TakeOrdered for the top-k
    (no global sort). Word keys are zipf-skewed; the partial (map-side)
    aggregation absorbs the hot keys before the shuffle.

    Returns (word, n_docs, n_occur) with exactly ``k`` rows (fewer only
    if the vocabulary itself is smaller)."""
    from pyspark.sql import functions as F

    words = df.repartition(F.col(id_col)).select(
        F.col(id_col).alias("_id"), TX.word_tokens(F.col(text_col)).alias("words")
    )
    exploded = words.select("_id", F.explode("words").alias("word"))
    agg = exploded.groupBy("word").agg(
        F.countDistinct("_id").alias("n_docs"),
        F.count("*").alias("n_occur"),
    )
    return agg.orderBy(
        F.col("n_docs").desc(), F.col("n_occur").desc(), F.col("word")
    ).limit(k)


def unigram_logprob_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-document average negative log-likelihood under the corpus's
    own unigram model — the CCNet/KenLM-style perplexity-proxy quality
    filter (Wenzek et al. 2020, public paper), reduced to its unigram
    core so it is exact, self-contained, and oracle-checkable: low
    score = built from common words, high score = rare-word soup.

    Determinism: per-word weights are computed once at the vocabulary
    level — ``floor(ln(cnt/total) * 1e6)`` as a fixed-point long (floor
    has no round-half mode to disagree on, and ln of the identical
    exactly-rounded quotient is the only cross-engine 1-ulp surface,
    sub-1e-9-per-word boundary risk) — then per-doc aggregation is an
    exact integer sum; the single division to double happens once per
    output row. No float accumulates across rows anywhere.

    Scale shape: tokenize behind the Exchange barrier (lambda-boundary
    CSE rule, SCALE.md); ONE word-keyed aggregation builds the
    vocabulary (zipf-hot keys absorbed by the partial agg); the
    1-row total rides a broadcast; the token->weight lookup is a
    shuffle join on the word key — deliberately NOT a broadcast: a web
    corpus's vocabulary (hundreds of millions of subword types) need
    not fit in one executor, and the weights side arrives already
    partitioned by word from its own aggregation, so only the token
    side shuffles.

    Returns (doc_id, n_words, avg_nll) for docs with >= 1 token.
    """
    from pyspark.sql import functions as F

    # Tokenize BELOW the barrier + explode_outer + no-op isNotNull
    # filter: one tokenizer pass materialized in the shuffle, and the
    # vocabulary aggregation and the final token->weight probe share
    # byte-identical subtrees so ReuseExchange fires (r14 — same
    # rework as collocations_pmi / bigram_logprob_scores).
    words = df.select(
        F.col(id_col), TX.word_tokens(F.col(text_col)).alias("words")
    ).repartition(F.col(id_col))
    toks = words.select(id_col, F.explode_outer("words").alias("word")).filter(
        F.col("word").isNotNull()
    )
    vocab = toks.groupBy("word").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    weights = vocab.join(F.broadcast(total)).select(
        "word",
        F.floor(
            F.log(F.col("cnt").cast("double") / F.col("total").cast("double"))
            * F.lit(1e6)
        )
        .cast("long")
        .alias("w_u"),
    )
    # shuffle_hash hint, build = weights: without it Catalyst's size
    # estimate at test scale broadcasts the EXPLODED TOKEN STREAM
    # (corpus-sized — the one frame that must never be broadcast;
    # caught by tests/test_plans.py). With the hint both sides hash-
    # partition on word and the per-partition vocab chunk is the build
    # side — the declared plan that holds at any scale.
    return (
        toks.join(weights.hint("shuffle_hash"), "word")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_words"), F.sum("w_u").alias("s_u"))
        .select(
            id_col,
            "n_words",
            (
                -F.col("s_u").cast("double")
                / (F.col("n_words").cast("double") * F.lit(1e6))
            ).alias("avg_nll"),
        )
    )


# Gopher-style document-quality rules (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", Table A1 heuristics — public paper).
# Bounds kept as module constants so the oracle SQL can mirror them.
GOPHER_MIN_WORDS = 20       # paper: 50; the synthetic corpus runs short
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_AVG_WORD_LEN = 3.0
GOPHER_MAX_AVG_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1   # '#' or '...' per word
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_DISTINCT_STOPWORDS = 2


def gopher_rules(text: Column | str) -> dict[str, Column]:
    """Per-document Gopher quality-rule booleans plus the composite
    ``keep`` flag (AND of all rules). Pure column expressions; a doc
    with zero words fails every ratio rule explicitly (no NULL/NaN
    leakage into the AND).

    Returned keys: rule_word_count, rule_avg_word_len, rule_symbol,
    rule_alpha, rule_stopwords, keep."""
    c = F.col(text) if isinstance(text, str) else text
    words = TX.word_tokens(c)
    n_words = F.size(words)
    has_words = n_words > 0
    word_len_sum = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    # try_divide, not `/`: under ANSI mode (Spark 4 default) a plain
    # division raises DIVIDE_BY_ZERO on empty docs even behind a
    # `has_words &` guard (both AND operands are evaluated); try_divide
    # yields NULL, and `false & NULL = false` keeps the rules
    # fail-closed.
    avg_len = F.try_divide(word_len_sum.cast("double"), n_words)
    n_symbols = F.size(F.regexp_extract_all(c, F.lit(r"#|\.\.\."), F.lit(0)))
    alpha_frac = F.try_divide(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double"),
        n_words,
    )
    n_stop = F.size(
        F.array_distinct(
            F.filter(F.transform(words, F.lower), lambda w: w.isin(*STOPWORDS))
        )
    )
    rules = {
        "rule_word_count": (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS),
        "rule_avg_word_len": has_words
        & (avg_len >= GOPHER_MIN_AVG_WORD_LEN)
        & (avg_len <= GOPHER_MAX_AVG_WORD_LEN),
        "rule_symbol": has_words
        & (F.try_divide(n_symbols.cast("double"), n_words) <= GOPHER_MAX_SYMBOL_RATIO),
        "rule_alpha": has_words & (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC),
        "rule_stopwords": n_stop >= GOPHER_MIN_DISTINCT_STOPWORDS,
    }
    keep = None
    for r in rules.values():
        keep = r if keep is None else keep & r
    rules["keep"] = keep
    return rules


def collocations_pmi(
    df,
    min_count: int = 5,
    topk: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Top-k bigram collocations by pointwise mutual information — the
    classic corpus-analysis signal for multiword expressions (Church &
    Hanks 1990). PMI = ln( P(w1,w2) / (P(w1) P(w2)) ) with bigram
    probability over total bigram count and unigram probabilities over
    total token count.

    Determinism (same fixed-point discipline as unigram_logprob_scores):
    every probability stays an exact integer count until one double
    expression per OUTPUT row — num = c_ab * n_uni * n_uni, den =
    n_big * c_a * c_b, both left-associated double products of exact
    longs — and the PMI is quantized ``floor(ln(num/den) * 1e6)`` so
    ordering and the top-k cut are integer comparisons. Tiebreak
    (w1, w2) makes the LIMIT set unique.

    Scale shape (r14): ONE tokenizer pass materialized by the barrier
    exchange feeds all four consumers (bigram agg, unigram agg, both
    totals — one parquet scan total, ReuseExchange-unified); TWO
    aggregations follow — a (w1, w2)-keyed bigram count and a
    word-keyed unigram count, each with map-side partial agg absorbing
    zipf-hot keys, each consumed via its own reused exchange (the
    n_big/n_uni totals read the agg exchanges, never the corpus). The
    c_a/c_b lookups are word-keyed shuffle joins — shuffle-hash
    pinned, NOT broadcast (a web corpus's vocabulary need not fit an
    executor), the two 1-row totals ride broadcasts, and the top-k is
    TakeOrdered, never a global sort. (A tagged single-aggregation
    variant — unigrams as w2-NULL rows in the bigram agg — was
    considered r15 and NOT landed: it would merge the two agg
    exchanges but re-keys the combined frame to (w1, w2), so the
    c_a/c_b joins lose the word-keyed partitioning the separate
    unigram agg already gives them and must re-exchange; net exchange
    count is unchanged while the one merged exchange gets hotter.)
    """
    from pyspark.sql import functions as F

    # Tokenize BELOW the barrier exchange (select before repartition)
    # so the shuffle materializes the words ARRAY and the regexp
    # tokenizer runs exactly once per row — the old
    # repartition-then-select shape re-tokenized in every consumer
    # branch (4x here: bigram agg, unigram agg, and both totals). The
    # branches explode via explode_outer + an isNotNull filter on the
    # GENERATED column: a plain explode makes the optimizer infer and
    # push a branch-specific size(arr) > 0 predicate below the
    # exchange, which de-duplicates the barrier subtree and split the
    # plan into TWO parquet scans (r14 plan diff: 2 scans -> 1,
    # 9 Exchanges -> 7; guide §2.4 / §2.3 project-before-exchange).
    words = (
        df.select(
            F.col(id_col), TX.word_tokens(F.col(text_col)).alias("words")
        )
        .repartition(F.col(id_col))
        .select("words")
    )
    n = F.size("words")
    bigrams = (
        words.select(
            F.explode_outer(
                F.when(
                    n >= 2,
                    F.transform(
                        F.sequence(F.lit(1), n - 1),
                        lambda i: F.struct(
                            F.element_at("words", i).alias("w1"),
                            F.element_at("words", i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<w1:string,w2:string>>")
                )
            ).alias("bg")
        )
        .filter(F.col("bg").isNotNull())
        .select("bg.w1", "bg.w2")
        # semantically a no-op (tokens are never null) — placed here so
        # the pair-count subtree BELOW its aggregation exchange is
        # byte-identical whether the consumer is the c_a/c_b join
        # (which infers these isnotnulls) or the n_big total (which
        # doesn't): identical subtrees are what ReuseExchange keys on,
        # so the total reads the aggregation's exchange instead of
        # re-exploding the corpus (r14)
        .filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    )
    toks = words.select(F.explode_outer("words").alias("word")).filter(
        F.col("word").isNotNull()
    )

    pair_cnt = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c_ab"))
    uni_cnt = toks.groupBy("word").agg(F.count("*").alias("c"))
    n_big = pair_cnt.agg(F.sum("c_ab").cast("long").alias("n_big"))
    n_uni = uni_cnt.agg(F.sum("c").cast("long").alias("n_uni"))

    cand = (
        pair_cnt.filter(F.col("c_ab") >= min_count)
        .join(
            uni_cnt.hint("shuffle_hash").select(
                F.col("word").alias("w1"), F.col("c").alias("c_a")
            ),
            "w1",
        )
        .join(
            uni_cnt.hint("shuffle_hash").select(
                F.col("word").alias("w2"), F.col("c").alias("c_b")
            ),
            "w2",
        )
        .join(F.broadcast(n_big))
        .join(F.broadcast(n_uni))
    )
    num = (
        F.col("c_ab").cast("double")
        * F.col("n_uni").cast("double")
        * F.col("n_uni").cast("double")
    )
    den = (
        F.col("n_big").cast("double")
        * F.col("c_a").cast("double")
        * F.col("c_b").cast("double")
    )
    scored = cand.select(
        "w1",
        "w2",
        "c_ab",
        F.floor(F.log(num / den) * F.lit(1e6)).cast("long").alias("pmi_q"),
    )
    return scored.orderBy(
        F.col("pmi_q").desc(), "w1", "w2"
    ).limit(topk)


# --- C4-style line-level cleaning (Raffel et al. 2020, §2.2) ---------
# Portable subset of the C4 heuristics: a line survives iff it has >=
# C4_MIN_LINE_WORDS words, ends in terminal punctuation, and contains
# neither a curly brace nor the word "javascript"; a document is
# dropped wholesale if it contains "lorem ipsum". All pure column
# expressions (scan-speed map-side; no shuffle, no UDF).
C4_MIN_LINE_WORDS = 3
C4_TERMINALS = (".", "!", "?", '."', '!"', '?"')


def _c4_line_ok(line: Column) -> Column:
    words = F.filter(F.split(line, "[ ]+"), lambda w: w != "")
    ends_ok = None
    for t in C4_TERMINALS:
        e = line.endswith(F.lit(t))
        ends_ok = e if ends_ok is None else ends_ok | e
    low = F.lower(line)
    return (
        (F.size(words) >= C4_MIN_LINE_WORDS)
        & ends_ok
        & ~low.contains("{")
        & ~low.contains("}")
        & ~low.contains("javascript")
    )


def c4_line_stats(text: Column | str) -> dict[str, Column]:
    """C4 line-filter outputs for one text column: kept/dropped line
    counts, the cleaned text (kept lines re-joined with newlines), and
    the document-level lorem-ipsum drop flag."""
    c = F.col(text) if isinstance(text, str) else text
    # Space-only trim (NOT TX.strip's full-Unicode class) — mirrored
    # verbatim by DuckDB trim() in the oracle; a wider class here would
    # silently diverge on tab/NBSP-only lines.
    lines = F.filter(F.split(c, "\n"), lambda l: F.trim(l) != "")
    kept = F.filter(lines, _c4_line_ok)
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept": F.size(kept).cast("long"),
        "cleaned": F.array_join(kept, "\n"),
        "doc_drop": F.lower(c).contains("lorem ipsum"),
    }


def bigram_logprob_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-document average negative log-likelihood under the corpus's
    own add-one-smoothed bigram model — the next rung above
    unigram_logprob_scores on the KenLM-style quality ladder: word-soup
    that passes the unigram filter (common words, random order) scores
    high here, because P(w2|w1) = (c(w1 w2)+1)/(c(w1·)+V) punishes
    never-seen transitions.

    Same determinism discipline as the unigram scorer: one fixed-point
    weight ``floor(ln((c_ab+1)/(c1+V)) * 1e6)`` per distinct bigram,
    exact integer sums per doc, one double division per output row.
    Bigrams ride a single space-joined string key (tokens are
    whitespace-split, so the key is unambiguous).

    Scale shape: tokenize behind the Exchange barrier; one bigram-keyed
    aggregation + one first-word-keyed aggregation (both absorb
    zipf-hot keys map-side); the vocabulary size V is a 1-row
    broadcast; the context-count lookup joins on the first word and
    the per-occurrence weight lookup joins on the bigram key — both
    shuffle-hash pinned, never broadcast (web-scale bigram tables are
    corpus-sized). Docs with < 2 tokens have no bigrams and drop out.
    """
    from pyspark.sql import functions as F

    # Tokenize BELOW the barrier (select before repartition) so the
    # shuffle materializes the words array and the regexp tokenizer
    # runs once per row, not once per consumer branch; explode_outer +
    # explicit isNotNull filters keep every consumer's subtree
    # byte-identical so ReuseExchange can share the barrier and the
    # bigram aggregation across the three readers (r14 — the same
    # rework as collocations_pmi; the old shape re-scanned the parquet
    # for the vocabulary branch and re-tokenized per branch).
    words = df.select(
        F.col(id_col), TX.word_tokens(F.col(text_col)).alias("words")
    ).repartition(F.col(id_col))
    n = F.size("words")
    stream = (
        words.select(
            id_col,
            F.explode_outer(
                F.when(
                    n >= 2,
                    F.transform(
                        F.sequence(F.lit(1), n - 1),
                        lambda i: F.struct(
                            F.element_at("words", i).alias("w1"),
                            F.concat_ws(
                                " ",
                                F.element_at("words", i),
                                F.element_at("words", i + 1),
                            ).alias("bg"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<w1:string,bg:string>>")
                )
            ).alias("b"),
        )
        .filter(F.col("b").isNotNull())
        .select(id_col, "b.w1", "b.bg")
        # no-op filters (tokens are never null) that mirror what the
        # downstream joins infer, keeping both aggregation consumers'
        # subtrees identical for ReuseExchange (r14)
        .filter(F.col("w1").isNotNull() & F.col("bg").isNotNull())
    )
    bg_cnt = stream.groupBy("w1", "bg").agg(F.count("*").alias("c_ab"))
    # c(w1·) = sum of c(w1 w2) over w2 — derived from the ALREADY
    # COMBINED bigram table instead of a second aggregation over the
    # raw occurrence stream, which re-ran the explode + partial agg
    # over the whole corpus (r14, guide §2.3 "aggregate before you
    # shuffle": the ctx branch now reads bg_cnt's exchange via
    # ReuseExchange; one fewer corpus-wide pass; values identical).
    ctx_cnt = bg_cnt.groupBy("w1").agg(
        F.sum("c_ab").cast("long").alias("c1")
    )
    vocab_n = (
        words.select(F.explode_outer("words").alias("word"))
        .filter(F.col("word").isNotNull())
        .agg(F.countDistinct("word").cast("long").alias("v"))
    )
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
