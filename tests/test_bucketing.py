"""Bucketed co-located joins: the pay-the-shuffle-once-at-ingest
layout. The plan assertions ARE the feature — a bucketed fact-fact
join must not exchange either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_vector_indexer_spark.io import load_table, write_bucketed

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bucketed"))
    write_bucketed(
        spark, load_table(spark, SF, "orders"), "b_orders", "o_orderkey",
        location=f"{base}/orders",
    )
    write_bucketed(
        spark,
        load_table(spark, SF, "lineitem"), "b_lineitem", "l_orderkey",
        location=f"{base}/lineitem",
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    # disable broadcast: at test scale Catalyst would broadcast the
    # small side, which hides the layout property under test — the
    # 100 TB regime where neither fact side broadcasts is exactly when
    # bucketing pays
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("b_lineitem")
        orders = spark.table("b_orders")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    # the only exchange allowed is the final tiny groupBy on priority;
    # below the join there must be NO exchange — both bucketed scans
    # feed the join in place
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_part, (
        f"bucketed join re-shuffled a side:\n{plan}"
    )
    assert plan.count("Bucketed: true") == 2


def test_bucketed_join_matches_plain_join(spark, bucketed):
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    want = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority").collect()
    )
    got = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority").collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_ingest_engine_layout_is_reentrant_over_ingested_dirs(
    spark, tmp_path
):
    """r8 review: ingesting FROM an already-ingested dir makes two pool
    threads race load_table('events') -> _load_events_bucketed's
    CREATE TABLE (the source dir has events_by_user). With IF NOT
    EXISTS the ingest must complete and the re-ingested events must
    match the original exactly."""
    from document_vector_indexer_spark.io import (
        ingest_engine_layout,
        load_table,
    )

    src = "/root/testdata/sf0.001"
    first = str(tmp_path / "ingest1")
    second = str(tmp_path / "ingest2")
    ingest_engine_layout(spark, src, first)
    ingest_engine_layout(spark, first, second)  # source IS ingested
    a = sorted(map(tuple, load_table(spark, first, "events").collect()))
    b = sorted(map(tuple, load_table(spark, second, "events").collect()))
    assert a == b
