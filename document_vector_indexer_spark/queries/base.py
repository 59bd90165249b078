"""QuerySpec plumbing shared by all query modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One operator showcase: Spark implementation + DuckDB oracle SQL.

    ``oracle`` is None for ops whose semantics are not exactly
    SQL-expressible (approximate / model-dependent / stateful-streaming)
    — the driver then records a weaker rows-only check.
    """

    fn: SparkQuery
    oracle: str | None = None
    description: str = ""
