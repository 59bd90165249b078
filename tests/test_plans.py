"""Physical-plan quality assertions — the 100 TB guarantees.

Correctness tests prove the right rows come back; these prove the
*plan* is the one that survives a 1000-executor cluster: predicates
reach the parquet scan, projections prune columns, dimension joins
broadcast (no shuffle), top-k never global-sorts, as-of joins never
join, and nothing degenerates into a cartesian product.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    from document_vector_indexer_spark.queries.registry import all_queries

    df = all_queries()[name].fn(spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filters_push_to_parquet_scan(spark):
    p = _plan(spark, "q_project_filter")
    assert "GreaterThanOrEqual(l_shipdate" in p, "range predicate not pushed"
    assert "In(l_returnflag" in p, "IN predicate not pushed"
    # column pruning: untouched columns must not reach the scan
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_tax" not in read_schema and "l_partkey" not in read_schema


def test_dimension_joins_broadcast(spark):
    p = _plan(spark, "q_join_broadcast")
    assert p.count("BroadcastHashJoin") >= 2, "dimension chain must broadcast"
    assert "SortMergeJoin" not in p, "no shuffle join for tiny dims"


def test_topk_is_take_ordered(spark):
    p = _plan(spark, "q_topk")
    assert "TakeOrderedAndProject" in p, (
        "global top-k must plan TakeOrderedAndProject (per-partition k + "
        "merge), not a global sort"
    )


def test_agg_has_partial_and_final(spark):
    p = _plan(spark, "q_agg_basic")
    assert p.count("HashAggregate") >= 2, "map-side partial aggregation missing"
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p


def test_asof_join_is_join_free(spark):
    """The union-window as-of plan must contain no join at all — one
    shuffle on user_id, then a window."""
    p = _plan(spark, "q_join_asof")
    assert "Join" not in p
    assert "Window" in p


def test_blocked_similarity_join_is_hash_join(spark):
    """Embedding near-dup with label blocking must plan an equi hash
    join — never CartesianProduct/BroadcastNestedLoopJoin."""
    p = _plan(spark, "q_dedup_embed")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_range_join_is_equi_on_buckets(spark):
    p = _plan(spark, "q_join_range")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # bucketized range join resolves to a hash join on (user, bucket)
    assert "HashJoin" in p


def test_chunking_needs_no_shuffle(spark):
    """Chunk build is row-local: the only exchange allowed in the full
    chunk-table aggregate is the final group-by's."""
    p = _plan(spark, "q_chunk_fixed")
    # tree section lists each Exchange node once as "+- Exchange" /ends
    tree = p.split("\n\n")[0]
    n_exchanges = sum("Exchange" in l for l in tree.splitlines())
    assert n_exchanges <= 1, f"chunking introduced extra shuffles:\n{tree}"


def test_ngram_tokenizer_behind_exchange(spark):
    """The repartition before tokenization in ngram_jaccard_pairs is
    LOAD-BEARING (see operators/dedup.py): without the exchange the
    tokenizer inlines into the shingle lambda and re-evaluates per
    element (measured 120 s vs 0.6 s). Guard its presence."""
    p = _plan(spark, "q_dedup_ngram")
    assert "REPARTITION_BY_COL" in p and "hashpartitioning(doc_id" in p, (
        "the tokenizer materialization barrier disappeared"
    )


def test_queries_rerun_safely(spark):
    """The driver may invoke a query more than once per session —
    the stateful/side-effecting ones must not collide with themselves
    (temp views, memory sinks, staged /tmp paths)."""
    from document_vector_indexer_spark.queries.registry import all_queries

    specs = all_queries()
    for name in ("q_agg_gsets", "q_sink_roundtrip", "q_source_binary",
                 "q_stream_stateful"):
        a = specs[name].fn(spark, SF).count()
        b = specs[name].fn(spark, SF).count()
        assert a == b > 0, name


def test_whole_stage_codegen_active(spark):
    """AQE's AdaptiveSparkPlan wrapper hides codegen markers in
    formatted output, so assert with AQE off: the whole scan->agg path
    must sit inside WholeStageCodegen subtrees."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = _plan(spark, "q_agg_basic")
        # formatted mode annotates generated operators with
        # "[codegen id : N]"; the filter and both aggregate stages
        # must all carry one
        hot = [
            l
            for l in p.splitlines()
            if l.lstrip("(0123456789) ").startswith(("Filter", "HashAggregate"))
            and "[" in l
        ]
        assert hot, f"no hot operators found in plan:\n{p[:800]}"
        for line in hot:
            assert "codegen id" in line, f"operator not codegen'd: {line}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
