"""Literal-fixture tests for the corpus-hygiene operators
(drop_boilerplate_lines, gopher_rules, stratified_sample, JSONL
round-trip) — edge cases the sf parity run can't reach."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from document_vector_indexer_spark.operators.textanalysis import gopher_rules
from document_vector_indexer_spark.operators.trainprep import (
    drop_boilerplate_lines,
    stratified_sample,
)
from document_vector_indexer_spark.sources.jsonl import read_jsonl, write_jsonl

BOILER = "Subscribe now"


def _clean(spark, rows, max_df=2):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = drop_boilerplate_lines(df, max_df=max_df)
    return {r["doc_id"]: r["clean_text"] for r in out.collect()}


def test_boilerplate_dropped_everywhere_unique_kept(spark):
    rows = [
        (1, f"alpha one\n{BOILER}\nkeep me 1"),
        (2, f"{BOILER}\nbeta two"),
        (3, f"gamma three\n{BOILER}"),
        (4, "delta four"),
    ]
    got = _clean(spark, rows, max_df=2)
    assert got[1] == "alpha one\nkeep me 1"
    assert got[2] == "beta two"
    assert got[3] == "gamma three"
    assert got[4] == "delta four"


def test_max_df_boundary_and_blank_lines(spark):
    # BOILER in exactly max_df docs -> kept (strictly-greater contract);
    # blank lines are never dropped (their key is '').
    rows = [
        (1, f"a\n\n{BOILER}"),
        (2, f"{BOILER}\n\nb"),
        (3, "c"),
    ]
    got = _clean(spark, rows, max_df=2)
    assert got[1] == f"a\n\n{BOILER}"
    assert got[2] == f"{BOILER}\n\nb"
    assert got[3] == "c"


def test_trim_insensitive_matching(spark):
    # The same line with different surrounding whitespace is one key;
    # the kept/dropped decision applies to the raw (untrimmed) line.
    rows = [
        (1, f"  {BOILER}  \nx"),
        (2, f"{BOILER}\ny"),
        (3, f"\t{BOILER}\nz"),
    ]
    got = _clean(spark, rows, max_df=2)
    assert got == {1: "x", 2: "y", 3: "z"}


def _rules(spark, text):
    df = spark.createDataFrame([(text,)], ["text"])
    r = gopher_rules(F.col("text"))
    row = df.select(*[v.alias(k) for k, v in r.items()]).collect()[0]
    return row.asDict()


def test_gopher_empty_text_fails_closed(spark):
    got = _rules(spark, "")
    assert got["rule_word_count"] is False
    assert got["rule_avg_word_len"] is False
    assert got["rule_symbol"] is False
    assert got["rule_alpha"] is False
    assert got["rule_stopwords"] is False
    assert got["keep"] is False


def test_gopher_good_text_passes(spark):
    text = (
        "the quick brown fox jumps over a lazy dog and runs to the barn "
        "where it finds food and water in the morning light of day"
    )
    got = _rules(spark, text)
    assert all(got.values()), got


def test_gopher_symbol_and_alpha_rules(spark):
    words = "the and " + " ".join(["word"] * 20)
    got = _rules(spark, words + " # # # # # # #")
    assert got["rule_symbol"] is False
    got2 = _rules(spark, "the and " + " ".join(["123"] * 20))
    assert got2["rule_alpha"] is False
    assert got2["rule_word_count"] is True


def test_stratified_sample_exact_and_deterministic(spark):
    rows = [(i, "g1" if i < 10 else "g2") for i in range(13)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    a = stratified_sample(df, ("grp",), k=4).collect()
    b = stratified_sample(df, ("grp",), k=4).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    by_grp = {}
    for r in a:
        by_grp.setdefault(r["grp"], []).append(r["sample_rk"])
    # g1 has 10 rows -> exactly 4; g2 has 3 rows (< k) -> all 3
    assert sorted(by_grp["g1"]) == [1, 2, 3, 4]
    assert sorted(by_grp["g2"]) == [1, 2, 3]
    # ranks match the reference window formulation exactly
    key = F.md5(F.concat_ws(":", F.lit("sample"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("grp").orderBy(key)
    want = (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 4)
        .collect()
    )
    assert {(r["doc_id"], r["rk"]) for r in want} == {
        (r["doc_id"], r["sample_rk"]) for r in a
    }


def test_jsonl_roundtrip_hostile_strings(spark):
    rows = [
        (1, 'line1\nline2\ttab "quoted" back\\slash'),
        (2, "unicode: café 中文  sep"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dest = os.path.join(tempfile.mkdtemp(), "jl")
    write_jsonl(df, dest)
    back = read_jsonl(spark, dest, df.schema)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    want = dict(rows)
    # Spark's JSON writer omits null fields; explicit schema reads them
    # back as null — the round-trip is still value-faithful.
    assert got == want


def test_semantic_dedup_merges_identical_vectors(spark):
    """Identical vectors must share an LSH cell (survivor = lowest id,
    member count right); a far-away vector must not join their cell."""
    from document_vector_indexer_spark.operators.dedup import (
        semantic_dedup_survivors,
    )

    base = [float((i * 37) % 19 - 9) for i in range(64)]
    anti = [-v for v in base]
    rows = [(1, base), (2, base), (7, base), (9, anti)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup_survivors(df, dim=64).collect()
    by_survivor = {r["survivor_id"]: r["n_members"] for r in out}
    assert by_survivor[1] == 3  # 1, 2, 7 merged; 1 survives
    assert by_survivor[9] == 1  # antipode lands alone (all bits flip)
    assert len(out) == 2


def test_unigram_logprob_ranks_rare_words_higher(spark):
    """A doc of corpus-common words must score a lower NLL than a doc
    of corpus-unique words; n_words must count tokens, not types."""
    from document_vector_indexer_spark.operators.textanalysis import (
        unigram_logprob_scores,
    )

    rows = [
        (1, "the the the cat cat"),
        (2, "xylophone quixotic zephyr"),
        (3, "the cat the cat the cat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_logprob_scores(df).collect()}
    assert out[1]["n_words"] == 5 and out[2]["n_words"] == 3
    assert out[1]["avg_nll"] < out[2]["avg_nll"]
    assert out[3]["avg_nll"] < out[2]["avg_nll"]
    # empty-text doc contributes no row
    df2 = spark.createDataFrame([(4, "   ")], "doc_id long, text string")
    assert unigram_logprob_scores(df2).count() == 0
