"""io.SCHEMAS must match what the fixtures actually contain — the
declared schemas are the engine's contract (no inference in core,
SURVEY §1.3), so drift between declaration and data is a bug."""

from __future__ import annotations

import pytest

from document_vector_indexer_spark.io import SCHEMAS, TABLES, load_table

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", TABLES)
def test_declared_schema_matches_fixture(spark, name):
    got = load_table(spark, SF, name).schema
    want = SCHEMAS[name]
    got_fields = [(f.name, f.dataType.simpleString()) for f in got.fields]
    want_fields = [(f.name, f.dataType.simpleString()) for f in want.fields]
    assert got_fields == want_fields, (
        f"{name}: declared schema drifted from fixture:\n"
        f"  declared: {want_fields}\n  actual:   {got_fields}"
    )


def test_unknown_table_rejected(spark):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, SF, "nope")


def test_events_ts_is_timestamp_after_nanos_handling(spark):
    ev = load_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # sub-second precision survives the ns->us truncation
    from pyspark.sql import functions as F

    n_subsec = ev.filter(F.date_trunc("second", "ts") != F.col("ts")).count()
    assert n_subsec > 0


def test_csv_null_vs_empty_string_roundtrip(spark, tmp_path):
    """The CSV sink's nullValue sentinel must keep NULL and '' distinct
    through a round-trip — the classic CSV data-loss bug."""
    from pyspark.sql import types as T

    from document_vector_indexer_spark.sources.csv import read_csv, write_csv

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, 'a,"b"\nc'), (4, "\\N")], schema
    )
    dest = str(tmp_path / "csv_nulls")
    write_csv(df, dest)
    back = {r.id: r.s for r in read_csv(spark, dest, schema).collect()}
    assert back[1] is None
    assert back[2] == ""
    assert back[3] == 'a,"b"\nc'
    # documented sentinel collision (sources/csv.py): literal "\N"
    # content is indistinguishable from NULL even when quoted — the
    # parser applies nullValue after unquoting. Pin it so a behavior
    # change (e.g. a Spark upgrade fixing quoted sentinels) surfaces.
    assert back[4] is None
