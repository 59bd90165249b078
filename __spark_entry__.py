"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``document_vector_indexer_spark/``; this file
is a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from document_vector_indexer_spark.queries.registry import all_queries  # noqa: E402
from document_vector_indexer_spark.session import ensure_oracle_confs  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_oracle_confs(spark)
    from document_vector_indexer_spark.queries.textops import flagship_chunk_topk

    return flagship_chunk_topk(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_oracle_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(spec.fn) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted -> rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
