"""Corpus-hygiene queries: boilerplate-line dedup, Gopher quality
rules, stratified sampling, deterministic corpus shuffle, JSONL
round-trip — the pre-training data-curation surface beyond near-dup
(SURVEY §2B north-star; none exist in the reference, whose corpus
hygiene is delegated to whoever prepared the input PDFs).

The synthetic corpus has no naturally repeated lines (each doc is one
line of word-soup), so ``q_dedup_lines`` PLANTS boilerplate
deterministically inside the query — same precedent as the planted
near-dup vectors behind ``q_dedup_embed`` — and the oracle mirrors the
construction, so the green row checks real drop behavior, not a
vacuous 0=0.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from document_vector_indexer_spark.io import SCHEMAS, load_table
from document_vector_indexer_spark.operators.ranking import global_rank
from document_vector_indexer_spark.operators.textanalysis import (
    GOPHER_MAX_AVG_WORD_LEN,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_WORD_FRAC,
    GOPHER_MIN_AVG_WORD_LEN,
    GOPHER_MIN_DISTINCT_STOPWORDS,
    GOPHER_MIN_WORDS,
    STOPWORDS,
    gopher_rules,
)
from document_vector_indexer_spark.operators.trainprep import (
    drop_boilerplate_lines,
    stratified_sample,
)
from document_vector_indexer_spark.queries.base import QuerySpec
from document_vector_indexer_spark.sources.jsonl import read_jsonl, write_jsonl

# Planted boilerplate for q_dedup_lines (see module docstring).
BOILER_A = "Subscribe to our newsletter today."
BOILER_B = "All rights reserved."
LINE_MAX_DF = 2


def _planted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic boilerplate lines appended: every
    doc_id % 3 == 0 gets BOILER_A, % 5 == 0 gets BOILER_B, and every
    doc gets a unique 'ref:' line that must survive the dedup.
    concat_ws skips NULL branches, so unplanted docs gain no blank
    lines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.withColumn(
        "text",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(BOILER_A)),
            F.when(F.col("doc_id") % 5 == 0, F.lit(BOILER_B)),
            F.concat(F.lit("ref: "), F.col("doc_id").cast("string")),
        ),
    )


def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus boilerplate-line removal over the planted corpus; per-doc
    line counts before/after + md5 of the cleaned text."""
    planted = _planted_docs(spark, sf_dir)
    cleaned = drop_boilerplate_lines(
        planted, text_col="text", id_col="doc_id", max_df=LINE_MAX_DF
    )
    return cleaned.select(
        "doc_id",
        F.size(F.split("text", "\n")).cast("long").alias("n_lines_in"),
        F.size(F.split("clean_text", "\n")).cast("long").alias("n_lines_out"),
        F.md5("clean_text").alias("clean_md5"),
    )


_SQL_PLANTED = """
planted AS (
  SELECT doc_id,
         concat_ws(chr(10), text,
                   CASE WHEN doc_id %% 3 = 0 THEN '%(a)s' END,
                   CASE WHEN doc_id %% 5 = 0 THEN '%(b)s' END,
                   'ref: ' || CAST(doc_id AS VARCHAR)) AS t
  FROM documents
)
""" % {"a": BOILER_A, "b": BOILER_B}

SQL_DEDUP_LINES = f"""
WITH {_SQL_PLANTED},
lines AS (
  SELECT doc_id, regexp_replace(l, '^\\s+|\\s+$', '', 'g') AS k
  FROM planted, unnest(string_split(t, chr(10))) AS u(l)
),
boiler AS (
  SELECT k FROM lines WHERE k <> ''
  GROUP BY k HAVING count(DISTINCT doc_id) > {LINE_MAX_DF}
),
barr AS (SELECT coalesce(list(k), []) AS ks FROM boiler),
kept AS (
  SELECT p.doc_id, p.t,
         list_filter(string_split(p.t, chr(10)),
                     l -> NOT list_contains(barr.ks,
                            regexp_replace(l, '^\\s+|\\s+$', '', 'g'))) AS ls
  FROM planted p, barr
)
SELECT doc_id,
       CAST(len(string_split(t, chr(10))) AS BIGINT) AS n_lines_in,
       CAST(len(ls) AS BIGINT) AS n_lines_out,
       md5(array_to_string(ls, chr(10))) AS clean_md5
FROM kept
"""


def gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules per document: rule booleans + composite
    keep flag (map-side column expressions only — scan-speed at any
    scale)."""
    docs = load_table(spark, sf_dir, "documents")
    r = gopher_rules(F.col("text"))
    return docs.select(
        "doc_id",
        *[
            r[k].alias(k)
            for k in (
                "rule_word_count",
                "rule_avg_word_len",
                "rule_symbol",
                "rule_alpha",
                "rule_stopwords",
                "keep",
            )
        ],
    )


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

SQL_GOPHER_FILTER = f"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                                        '\\s+'), x -> x <> '') AS words
  FROM documents
),
f AS (
  SELECT doc_id,
         len(words) AS n_words,
         list_sum(list_transform(words, x -> length(x))) AS wl_sum,
         len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_symbols,
         len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
         len(list_distinct(list_filter(list_transform(words, x -> lower(x)),
                                       x -> x IN ({_STOP_IN})))) AS n_stop
  FROM w
)
SELECT doc_id,
  n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS} AS rule_word_count,
  n_words > 0 AND wl_sum / CAST(n_words AS DOUBLE) >= {GOPHER_MIN_AVG_WORD_LEN}
            AND wl_sum / CAST(n_words AS DOUBLE) <= {GOPHER_MAX_AVG_WORD_LEN}
    AS rule_avg_word_len,
  n_words > 0 AND n_symbols / CAST(n_words AS DOUBLE) <= {GOPHER_MAX_SYMBOL_RATIO}
    AS rule_symbol,
  n_words > 0 AND n_alpha / CAST(n_words AS DOUBLE) >= {GOPHER_MIN_ALPHA_WORD_FRAC}
    AS rule_alpha,
  n_stop >= {GOPHER_MIN_DISTINCT_STOPWORDS} AS rule_stopwords,
  (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
  AND (n_words > 0 AND wl_sum / CAST(n_words AS DOUBLE) >= {GOPHER_MIN_AVG_WORD_LEN}
                   AND wl_sum / CAST(n_words AS DOUBLE) <= {GOPHER_MAX_AVG_WORD_LEN})
  AND (n_words > 0 AND n_symbols / CAST(n_words AS DOUBLE) <= {GOPHER_MAX_SYMBOL_RATIO})
  AND (n_words > 0 AND n_alpha / CAST(n_words AS DOUBLE) >= {GOPHER_MIN_ALPHA_WORD_FRAC})
  AND (n_stop >= {GOPHER_MIN_DISTINCT_STOPWORDS}) AS keep
FROM f
"""

SAMPLE_K = 2


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-(lang, source) sample — exact and stable
    across runs (md5 rank), unlike sampleBy."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, ("lang", "source"), k=SAMPLE_K, id_col="doc_id", salt="sample"
    ).select("doc_id", "lang", "source", "sample_rk")


SQL_SAMPLE_STRATIFIED = f"""
SELECT doc_id, lang, source, CAST(rk AS BIGINT) AS sample_rk FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang, source
             ORDER BY md5('sample:' || CAST(doc_id AS VARCHAR))) AS rk
  FROM documents
) WHERE rk <= {SAMPLE_K}
"""


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle order for training-data emission:
    rank every doc by a salted md5 of its id. Uses the two-pass
    ``global_rank`` (operators/ranking.py) — the scale-safe form of
    ``row_number() OVER (ORDER BY ...)`` — so no single task ever sees
    the whole corpus."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.withColumn(
        "skey",
        F.md5(F.concat_ws(":", F.lit("shuffle42"), F.col("doc_id").cast("string"))),
    )
    ranked = global_rank(
        keyed, ["skey"], rank_col="shuffle_ord", total_col="total_docs"
    )
    return ranked.select(
        "doc_id",
        "skey",
        F.col("shuffle_ord").cast("long").alias("shuffle_ord"),
        F.col("total_docs").cast("long").alias("total_docs"),
    )


SQL_CORPUS_SHUFFLE = """
SELECT doc_id,
       md5('shuffle42:' || CAST(doc_id AS VARCHAR)) AS skey,
       CAST(row_number() OVER (
            ORDER BY md5('shuffle42:' || CAST(doc_id AS VARCHAR))) AS BIGINT)
         AS shuffle_ord,
       CAST(count(*) OVER () AS BIGINT) AS total_docs
FROM documents
"""


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> JSONL -> read back with explicit schema; per-row
    value fingerprints prove the round-trip lossless (newlines and
    unicode in ``text`` survive JSON escaping)."""
    docs = load_table(spark, sf_dir, "documents")
    dest = os.path.join(
        tempfile.gettempdir(),
        "dvi_jsonl_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    write_jsonl(docs, dest)
    back = read_jsonl(spark, dest, SCHEMAS["documents"])
    return back.select(
        "doc_id", "lang", "source", "n_chars", F.md5("text").alias("text_md5")
    )


SQL_JSONL_ROUNDTRIP = """
SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5 FROM documents
"""


# Appended to every doc before the CSV write: an embedded newline, a
# quote, and a delimiter — the three characters that break naive CSV.
# The synthetic corpus is single-line word soup, so without this the
# round-trip would never exercise quoting at all (vacuous green).
_CSV_NASTY = '\n"quoted, piece"'


def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents (with a planted newline+quote+comma suffix) -> RFC-4180
    CSV -> multiLine read with explicit schema; per-row md5 proves the
    quoting/escaping round-trips losslessly
    (sources/csv.write_csv / read_csv)."""
    from document_vector_indexer_spark.sources.csv import read_csv, write_csv

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.concat(F.col("text"), F.lit(_CSV_NASTY))
    )
    dest = os.path.join(
        tempfile.gettempdir(),
        "dvi_csv_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    write_csv(docs.select(*[f.name for f in SCHEMAS["documents"].fields]), dest)
    back = read_csv(spark, dest, SCHEMAS["documents"])
    return back.select(
        "doc_id", "lang", "source", "n_chars", F.md5("text").alias("text_md5")
    )


SQL_CSV_ROUNDTRIP = """
SELECT doc_id, lang, source, n_chars,
       md5(text || chr(10) || '"quoted, piece"') AS text_md5
FROM documents
"""


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram perplexity-proxy quality score per document
    (see operators/textanalysis.unigram_logprob_scores for the
    determinism and scale analysis)."""
    from document_vector_indexer_spark.operators.textanalysis import (
        unigram_logprob_scores,
    )

    return unigram_logprob_scores(load_table(spark, sf_dir, "documents"))


SQL_UNIGRAM_LOGPROB = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                                               '\\s+'), x -> x <> '')) AS word
  FROM documents
),
vocab AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
weights AS (
  SELECT word,
         CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) * 1e6) AS BIGINT)
           AS w_u
  FROM vocab, tot
)
SELECT doc_id, count(*) AS n_words,
       -CAST(CAST(sum(w_u) AS BIGINT) AS DOUBLE)
         / (CAST(count(*) AS DOUBLE) * 1e6) AS avg_nll
FROM toks JOIN weights USING (word)
GROUP BY doc_id
"""


# Fixed 12-word passage appended to every 7th doc: the synthetic corpus
# is word-soup with no naturally repeated 8-grams (31-word vocab,
# 31^8 >> window count), so the duplicated-passage signal is PLANTED —
# same precedent as q_dedup_lines / q_dedup_embed — and the oracle
# mirrors the construction.
_PLANT_PASSAGE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
)
_SUBSTR_K = 8


def dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level duplicated-window stats per document
    (operators/dedup.dup_substring_stats — Lee et al. exact-substring
    dedup at word-8-gram granularity) over the corpus with a planted
    shared passage on every 7th doc. Planted docs must report >= 5
    duplicated windows (the passage's fully-internal 8-grams);
    unplanted docs 0."""
    from document_vector_indexer_spark.operators.dedup import dup_substring_stats

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" " + _PLANT_PASSAGE)),
        ).otherwise(F.col("text")),
    )
    return dup_substring_stats(docs, k=_SUBSTR_K).orderBy("doc_id")


_DUCK_CHARFOLD = """list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(generate_series(1, length({s})),
                     j -> CAST(ascii(substr({s}, j, 1)) AS BIGINT))),
      (a, c) -> (a * 131 + c) % 2147483647)"""

SQL_DEDUP_SUBSTRINGS = f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' {_PLANT_PASSAGE}'
              ELSE text END AS text
  FROM documents
),
w AS (
  SELECT doc_id,
         list_filter(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                                        '\\s+'), x -> x <> '') AS words
  FROM planted
),
g AS (
  SELECT doc_id,
         unnest(list_transform(
           list_transform(generate_series(1, len(words) - {_SUBSTR_K - 1}),
                          i -> array_to_string(list_slice(words, i, i + {_SUBSTR_K - 1}), ' ')),
           s -> {_DUCK_CHARFOLD.format(s='s')})) AS gh
  FROM w
),
byh AS (SELECT gh, count(DISTINCT doc_id) AS nd FROM g GROUP BY gh),
per AS (
  SELECT g.doc_id, count(*) AS n_windows,
         count(*) FILTER (nd > 1) AS n_dup_windows
  FROM g JOIN byh USING (gh) GROUP BY g.doc_id
)
SELECT d.doc_id,
       COALESCE(n_windows, 0) AS n_windows,
       COALESCE(n_dup_windows, 0) AS n_dup_windows,
       COALESCE((n_dup_windows * 1000000) // n_windows, 0) AS dup_ppm
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""


def collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 bigram collocations by quantized PMI
    (operators/textanalysis.collocations_pmi)."""
    from document_vector_indexer_spark.operators.textanalysis import (
        collocations_pmi,
    )

    return collocations_pmi(
        load_table(spark, sf_dir, "documents"), min_count=5, topk=50
    )


SQL_COLLOCATIONS = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                                        '\\s+'), x -> x <> '') AS words
  FROM documents
),
b AS (
  SELECT unnest(list_transform(generate_series(1, len(words) - 1), i ->
           struct_pack(w1 := words[i], w2 := words[i + 1]))) AS bg
  FROM w
),
pairs AS (SELECT (bg).w1 AS w1, (bg).w2 AS w2, count(*) AS c_ab FROM b GROUP BY 1, 2),
uni AS (SELECT unnest(words) AS word FROM w),
uc AS (SELECT word, count(*) AS c FROM uni GROUP BY word),
nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_big FROM pairs),
nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uc)
SELECT p.w1, p.w2, p.c_ab,
       CAST(floor(ln(
           (CAST(p.c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE) * CAST(n_uni AS DOUBLE))
         / (CAST(n_big AS DOUBLE) * CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))
       ) * 1e6) AS BIGINT) AS pmi_q
FROM pairs p
JOIN (SELECT word AS w1, c AS c_a FROM uc) a USING (w1)
JOIN (SELECT word AS w2, c AS c_b FROM uc) b2 USING (w2)
CROSS JOIN nb CROSS JOIN nu
WHERE p.c_ab >= 5
ORDER BY pmi_q DESC, w1, w2
LIMIT 50
"""


def curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLI curate composition (cmd_curate minus the write) as a
    driver-checked query — Gopher quality rules -> exact dedup (keep
    lowest id) -> deterministic hash split — reported per split with an
    id checksum so membership is proven, not just counts (closes the
    round-3 R13 'pipeline weak' note with an oracle over the whole
    composition)."""
    from document_vector_indexer_spark.operators.dedup import (
        exact_dedup_keep_first,
    )
    from document_vector_indexer_spark.operators.trainprep import hash_split

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(gopher_rules(F.col("text"))["keep"])
    deduped = exact_dedup_keep_first(kept, text_col="text", id_col="doc_id")
    split = hash_split(deduped, id_col="doc_id")
    return (
        split.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("split")
    )


def _sql_curate_pipeline() -> str:
    from document_vector_indexer_spark.queries.textops import _duck_frac

    frac = _duck_frac("'split:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH g AS ({SQL_GOPHER_FILTER}),
kd AS (
  SELECT d.doc_id, d.text, d.n_chars
  FROM documents d JOIN g USING (doc_id) WHERE g.keep
),
dd AS (
  SELECT doc_id, n_chars FROM kd
  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
),
s AS (
  SELECT doc_id, n_chars,
         CASE WHEN {frac} < 0.8 THEN 'train'
              WHEN {frac} < 0.9 THEN 'val'
              ELSE 'test' END AS split
  FROM dd
)
SELECT split, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM s GROUP BY split ORDER BY split
"""


SQL_CURATE_PIPELINE = _sql_curate_pipeline()


QUERIES: dict[str, QuerySpec] = {
    "q_curate_pipeline": QuerySpec(
        curate_pipeline,
        SQL_CURATE_PIPELINE,
        "gopher -> exact dedup -> hash split, whole-pipeline oracle "
        "with per-split id checksum (the CLI curate composition)",
    ),
    "q_dedup_substrings": QuerySpec(
        dedup_substrings,
        SQL_DEDUP_SUBSTRINGS,
        "Lee-et-al-style duplicated-passage (word-8-gram) stats per doc",
    ),
    "q_collocations": QuerySpec(
        collocations,
        SQL_COLLOCATIONS,
        "top-50 bigram collocations by fixed-point PMI",
    ),
    "q_unigram_logprob": QuerySpec(
        unigram_logprob,
        SQL_UNIGRAM_LOGPROB,
        "CCNet-style unigram NLL quality score per document",
    ),
    "q_dedup_lines": QuerySpec(
        dedup_lines,
        SQL_DEDUP_LINES,
        "corpus boilerplate-line dedup (C4-style) on planted boilerplate",
    ),
    "q_gopher_filter": QuerySpec(
        gopher_filter,
        SQL_GOPHER_FILTER,
        "Gopher quality-rule booleans + keep flag per document",
    ),
    "q_sample_stratified": QuerySpec(
        sample_stratified,
        SQL_SAMPLE_STRATIFIED,
        "deterministic exact k-per-stratum sample",
    ),
    "q_corpus_shuffle": QuerySpec(
        corpus_shuffle,
        SQL_CORPUS_SHUFFLE,
        "deterministic global corpus shuffle via two-pass global_rank",
    ),
    "q_jsonl_roundtrip": QuerySpec(
        jsonl_roundtrip,
        SQL_JSONL_ROUNDTRIP,
        "JSONL sink + explicit-schema source round-trip, md5-verified",
    ),
    "q_csv_roundtrip": QuerySpec(
        csv_roundtrip,
        SQL_CSV_ROUNDTRIP,
        "RFC-4180 CSV sink + multiLine source round-trip over planted "
        "newline/quote/comma text, md5-verified",
    ),
}
