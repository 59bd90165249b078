"""Direct tests for operators/ranking.py (round-2 VERDICT #4 / ADVICE):
the two-pass global_rank and the closed-form ntile/percent_rank/
cume_dist must equal Spark's own global-window functions on
multi-partition frames, including total < k and total % k != 0."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from document_vector_indexer_spark.operators.ranking import (
    cume_dist_from_rank,
    global_rank,
    ntile_from_rank,
    percent_rank_from_rank,
)


def _frame(spark, total: int, n_part: int = 7):
    """A deterministic multi-partition frame with a unique sort key
    deliberately uncorrelated with insertion order."""
    return (
        spark.range(total)
        .repartition(n_part)
        .select(((F.col("id") * 48271) % 2147483647).alias("key"))
    )


@pytest.mark.parametrize("total", [1, 2, 7, 32, 100, 257])
def test_global_rank_equals_window_row_number(spark, total):
    df = _frame(spark, total)
    got = global_rank(df, ["key"], num_partitions=5)
    want = df.withColumn("_grank", F.row_number().over(Window.orderBy("key")))
    got_rows = {(r.key, r._grank) for r in got.select("key", "_grank").collect()}
    want_rows = {(r.key, r._grank) for r in want.collect()}
    assert got_rows == want_rows
    totals = {r._gtotal for r in got.select("_gtotal").collect()}
    assert totals == {total}


@pytest.mark.parametrize(
    "total,k",
    [
        (1, 4),  # total < k, single row
        (3, 5),  # total < k
        (32, 5),  # total % k != 0
        (100, 4),  # total % k == 0
        (257, 7),  # prime total
        (10, 10),  # total == k
    ],
)
def test_ntile_matches_spark_window(spark, total, k):
    df = _frame(spark, total)
    ranked = global_rank(df, ["key"])
    got = ranked.select(
        "key", ntile_from_rank(F.col("_grank"), F.col("_gtotal"), k).alias("t")
    )
    want = df.select(
        "key", F.ntile(k).over(Window.orderBy("key")).alias("t")
    )
    assert {(r.key, r.t) for r in got.collect()} == {
        (r.key, r.t) for r in want.collect()
    }


@pytest.mark.parametrize("total", [1, 2, 32, 100])
def test_percent_rank_and_cume_dist_match_spark_window(spark, total):
    df = _frame(spark, total)
    ranked = global_rank(df, ["key"], num_partitions=3)
    got = {
        (r.key, r.pr, r.cd)
        for r in ranked.select(
            "key",
            percent_rank_from_rank(F.col("_grank"), F.col("_gtotal")).alias("pr"),
            cume_dist_from_rank(F.col("_grank"), F.col("_gtotal")).alias("cd"),
        ).collect()
    }
    w = Window.orderBy("key")
    want = {
        (r.key, r.pr, r.cd)
        for r in df.select(
            "key",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    # floats computed by identical formulas on exact integers: bit-equal
    assert got == want


def test_global_rank_explicit_num_partitions_more_than_rows(spark):
    # more range partitions than rows -> empty partitions must not
    # perturb offsets
    df = _frame(spark, 5)
    got = global_rank(df, ["key"], num_partitions=16)
    ranks = sorted(r._grank for r in got.collect())
    assert ranks == [1, 2, 3, 4, 5]


def test_global_rank_large_frame_sampled_boundaries(spark):
    # Regression for the round-3 rank-corruption bug: at sizes where
    # the boundary sample is a strict subset of the keys (here 8k rows
    # vs a 4*128 cap), the old repartitionByRange form let the counts
    # and join branches sample DIFFERENT boundaries (RangePartitioner
    # seeds with the per-execution RDD id) and ~88% of ranks came out
    # wrong. Literal pinned boundaries must agree across branches.
    total = 8000
    df = _frame(spark, total, n_part=11)
    got = global_rank(df, ["key"], num_partitions=4)
    want = df.withColumn("rk", F.row_number().over(Window.orderBy("key")))
    got_rows = {(r.key, r._grank) for r in got.select("key", "_grank").collect()}
    want_rows = {(r.key, r.rk) for r in want.collect()}
    assert got_rows == want_rows


def test_global_rank_multi_column_key(spark):
    # lexicographic boundaries: first column has heavy ties, the pair
    # is unique (the q_win_ntile shape: acctbal + custkey tiebreak)
    df = (
        spark.range(3000)
        .repartition(9)
        .select(
            (F.col("id") % 50).alias("a"),
            ((F.col("id") * 48271) % 2147483647).alias("b"),
        )
    )
    got = global_rank(df, ["a", "b"], num_partitions=6)
    want = df.withColumn("rk", F.row_number().over(Window.orderBy("a", "b")))
    got_rows = {(r.a, r.b, r._grank) for r in got.select("a", "b", "_grank").collect()}
    want_rows = {(r.a, r.b, r.rk) for r in want.collect()}
    assert got_rows == want_rows


def test_global_rank_string_keys(spark):
    # md5-style string keys (the q_corpus_shuffle shape)
    df = (
        spark.range(2000)
        .repartition(7)
        .select(F.md5(F.col("id").cast("string")).alias("key"))
    )
    got = global_rank(df, ["key"], num_partitions=5)
    want = df.withColumn("rk", F.row_number().over(Window.orderBy("key")))
    got_rows = {(r.key, r._grank) for r in got.select("key", "_grank").collect()}
    want_rows = {(r.key, r.rk) for r in want.collect()}
    assert got_rows == want_rows


def test_global_rank_null_keys_not_dropped(spark):
    """Round-4 review regression: NULL key components made the bucket
    expression NULL and the offsets join silently dropped those rows.
    NULLs must rank FIRST (Spark asc nulls-first) and never vanish —
    the frame is large enough that boundary sampling yields literal
    bounds, which is where the old expression went wrong."""
    df = (
        spark.range(600)
        .repartition(7)
        .select(
            F.when(F.col("id") % 100 == 0, F.lit(None))
            .otherwise(F.md5(F.col("id").cast("string")))
            .alias("key"),
            F.col("id"),
        )
    )
    got = global_rank(df, ["key", "id"], num_partitions=8)
    assert got.count() == 600, "rows with NULL keys were dropped"
    want = df.withColumn(
        "rk", F.row_number().over(Window.orderBy("key", "id"))
    )
    got_rows = {(r.id, r._grank) for r in got.select("id", "_grank").collect()}
    want_rows = {(r.id, r.rk) for r in want.collect()}
    assert got_rows == want_rows


def test_ensure_doc_id_keeps_null_order_rows(spark, tmp_path):
    """The CLI doc_id fallback over a parquet whose first column has
    NULLs must keep every row (the reviewed scenario: 302 docs, 2 NULL,
    300 survived)."""
    from document_vector_indexer_spark.cli import _ensure_doc_id

    src = spark.range(302).select(
        F.when(F.col("id") < 2, F.lit(None))
        .otherwise(F.concat(F.lit("f_"), F.col("id")))
        .alias("filename"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )
    out = _ensure_doc_id(src, ["filename"])
    assert out.count() == 302
    ids = [r.doc_id for r in out.select("doc_id").collect()]
    assert sorted(ids) == list(range(1, 303)), "ids not dense 1..n"


def test_multi_global_rank_matches_independent_global_ranks(spark):
    """multi_global_rank's shared-sample form must produce exactly the
    ranks three independent global_rank runs produce (boundary CHOICE
    may differ — only balance, never rank values)."""
    from document_vector_indexer_spark.operators.ranking import (
        global_rank,
        multi_global_rank,
    )

    df = spark.range(500).select(
        F.col("id"),
        (F.col("id") * 37 % 101).alias("a"),
        (F.col("id") * 53 % 89).alias("b"),
        F.concat(F.lit("s"), (F.col("id") * 11 % 7).cast("string")).alias("s"),
    )
    got = multi_global_rank(
        df,
        [
            (["a", "id"], "ra", "ta"),
            (["b", "id"], "rb", "tb"),
            (["s", "id"], "rs", "ts"),
        ],
        num_partitions=8,
    )
    rows = {r.id: r for r in got.collect()}
    assert len(rows) == 500
    for cols, rcol, tcol in (
        (["a", "id"], "ra", "ta"),
        (["b", "id"], "rb", "tb"),
        (["s", "id"], "rs", "ts"),
    ):
        want = {
            r.id: (r._grank, r._gtotal)
            for r in global_rank(df, cols, num_partitions=8).collect()
        }
        for rid, r in rows.items():
            assert (getattr(r, rcol), getattr(r, tcol)) == want[rid], (
                rcol,
                rid,
            )


def test_multi_global_rank_null_keys_not_dropped(spark):
    from document_vector_indexer_spark.operators.ranking import multi_global_rank

    df = spark.range(40).select(
        F.col("id"),
        F.when(F.col("id") < 3, F.lit(None)).otherwise(F.col("id") % 5).alias("a"),
    )
    got = multi_global_rank(df, [(["a", "id"], "ra", "ta")], num_partitions=4)
    rows = got.collect()
    assert len(rows) == 40  # NULL keys rank, never dropped
    by_rank = sorted(rows, key=lambda r: r.ra)
    assert [r.id for r in by_rank[:3]] == [0, 1, 2]  # NULLs first, id tiebreak
