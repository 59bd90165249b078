"""Dataset profiling: per-column statistics in long format — the
first step of any training-data ingest (nulls, cardinality, ranges).

One pass per profile call: all per-column aggregates compute in a
single hash-free global aggregation (no shuffle beyond the final
1-row combine), then pivot to long format driver-side-free via stack.
Portable output (strings for min/max) so it is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """-> (column, n_rows, n_nulls, n_distinct, min_str, max_str)."""
    cols = cols or df.columns
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.count_if(F.col(c).isNull()).alias(f"__nulls_{c}"),
            F.countDistinct(c).alias(f"__dist_{c}"),
            # min/max of the VALUE, stringified after (not lexicographic)
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n_nulls, n_distinct, min_str, max_str)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")
