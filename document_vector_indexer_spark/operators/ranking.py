"""Distributed global ranking — the scale-safe replacement for
``Window.orderBy(...)`` with no ``partitionBy``.

A global window funnels the entire table through ONE WindowExec task;
fine at unit scale, fatal at 100 TB. The standard two-pass shape used
here instead:

1. ``repartitionByRange`` on the sort key (range partitioner guarantees
   partition i's keys all sort before partition i+1's),
2. per-partition ``row_number`` (parallel — window is partitioned by
   ``spark_partition_id()``),
3. per-partition counts (one tiny row per partition) -> cumulative
   offsets on the driver-sized counts frame -> broadcast back,
4. global rank = offset + local row number.

Total cost: one range shuffle + one broadcast of #partitions rows —
same order as the sort any engine would need, with no single-task
bottleneck. ntile/percent_rank/cume_dist are then closed-form in
(rank, total) when the sort key is unique.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "_grank",
    total_col: str = "_gtotal",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a dense 1-based global rank over ``order_cols`` plus the
    total row count, without a global single-partition window.

    ``order_cols`` must be a unique key of ``df`` (ties would make the
    rank nondeterministic — same contract as any order-based id).
    """
    if num_partitions is not None:
        n_part = num_partitions
    else:
        # sparkContext is absent under Spark Connect (round-2 ADVICE);
        # fall back to the shuffle-partition conf there.
        try:
            n_part = df.sparkSession.sparkContext.defaultParallelism
        except Exception:
            n_part = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
            )
    ranged = df.repartitionByRange(n_part, *[F.col(c) for c in order_cols])
    local = ranged.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_lrn",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
        ),
    )
    # counts is one row per partition — driver-sized by construction, so
    # the single-partition cumulative window over it is bounded (this is
    # the one allow-listed empty-partitionBy window: #rows == n_part).
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_ofs = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_ofs), F.lit(0)).alias("_ofs"),
        F.sum("_cnt").over(w_tot).alias(total_col),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, F.col("_ofs") + F.col("_lrn"))
        .drop("_pid", "_lrn", "_ofs")
    )


def ntile_from_rank(rank: Column, total: Column, k: int) -> Column:
    """SQL ``ntile(k)`` as a closed form of (global rank, total rows):
    the first ``total % k`` tiles hold ``total/k + 1`` rows, the rest
    ``total/k`` (the ANSI distribution both Spark and DuckDB use)."""
    base = (total / k).cast("long")
    rem = total % k
    big = rem * (base + 1)  # rows covered by the size-(base+1) tiles
    return (
        F.when(rank <= big, F.ceil(rank / (base + 1)))
        .otherwise(rem + F.ceil((rank - big) / F.greatest(base, F.lit(1))))
        .cast("long")
    )


def percent_rank_from_rank(rank: Column, total: Column) -> Column:
    """``percent_rank()`` for a unique sort key: (rank-1)/(total-1)."""
    return F.when(total > 1, (rank - 1).cast("double") / (total - 1)).otherwise(
        F.lit(0.0)
    )


def cume_dist_from_rank(rank: Column, total: Column) -> Column:
    """``cume_dist()`` for a unique sort key: rank/total."""
    return rank.cast("double") / total
