"""Runs every registered query against its DuckDB oracle at sf0.01 —
the same check the driver performs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import os

import pytest

from tests.parity_util import compare, duckdb_conn

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")


def _specs():
    from document_vector_indexer_spark.queries.registry import all_queries

    return all_queries()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_specs().keys()))
def test_query_parity(spark, con, name):
    spec = _specs()[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0
        return
    compare(df, con, spec.oracle, name)
