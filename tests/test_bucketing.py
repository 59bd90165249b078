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


def test_partial_bucketed_dir_is_not_registered(spark, tmp_path):
    """r9 regression (r8 ADVICE): a bucketed dir WITHOUT the writer's
    _SUCCESS marker (crashed ingest) must not register — Spark trusts
    catalog bucket metadata to elide exchanges, so a partial dir would
    silently drop the missing buckets' rows. The reader must fall back
    to the plain events.parquet copy with full row parity."""
    import os

    from document_vector_indexer_spark.io import (
        _load_events_bucketed,
        ingest_engine_layout,
    )

    src = "/root/testdata/sf0.001"
    dest = str(tmp_path / "crashed")
    ingest_engine_layout(spark, src, dest)
    os.remove(os.path.join(dest, "events_by_user", "_SUCCESS"))
    assert _load_events_bucketed(spark, dest) is None
    n_src = load_table(spark, src, "events").count()
    assert load_table(spark, dest, "events").count() == n_src


def test_bucketed_dir_with_foreign_bucket_id_is_not_registered(tmp_path):
    """A data file whose bucket-id suffix exceeds the bucket count is
    not a write this reader's metadata describes — refuse it."""
    from document_vector_indexer_spark.io import _bucketed_dir_committed

    loc = tmp_path / "evil"
    loc.mkdir()
    (loc / "_SUCCESS").touch()
    # marker but ZERO data files (partial cleanup): registering would
    # crash the read (UNABLE_TO_INFER_SCHEMA) instead of falling back
    assert not _bucketed_dir_committed(str(loc))
    (loc / "part-00000-x_00000.c000.snappy.parquet").touch()
    assert _bucketed_dir_committed(str(loc))
    (loc / "part-00008-x_00008.c000.snappy.parquet").touch()
    assert not _bucketed_dir_committed(str(loc))


def test_schema_ddl_round_trips(spark):
    """The public-API DDL builder must parse back to the identical
    schema for every engine table (the contract CREATE TABLE needs;
    string-exact parity with the JVM's own toDDL is not required —
    casing/backticks differ, both are valid DDL)."""
    from pyspark.sql import types as T

    from document_vector_indexer_spark.io import TABLES, _schema_ddl

    for t in TABLES:
        schema = load_table(spark, SF, t).schema
        assert T.StructType.fromDDL(_schema_ddl(schema)) == schema, t
