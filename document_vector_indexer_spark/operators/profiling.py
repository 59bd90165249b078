"""Dataset profiling: per-column statistics in long format — the
first step of any training-data ingest (nulls, cardinality, ranges).

One pass per profile call: all per-column aggregates compute in a
single hash-free global aggregation (no shuffle beyond the final
1-row combine), then pivot to long format driver-side-free via stack.
Portable output (strings for min/max) so it is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def zscore_outliers(
    df: DataFrame,
    value_cents: Column,
    key_col: str = "event_type",
    id_col: str = "event_id",
    z: int = 3,
) -> DataFrame:
    """Exact distributed z-score outlier detection per group — the
    standard telemetry/data-quality anomaly flag, done with integer
    arithmetic so it is deterministic cross-engine.

    ``value_cents`` must be an exact integer (long) column (quantize
    the raw measure first, e.g. ``F.round(value * 100).cast("long")``).
    With per-group n, s = Σv, q = Σv², the test |v − μ| > z·σ is
    equivalent to the all-integer comparison

        (n·v − s)²  >  z² · (n·q − s²)

    Long-range bound: safe while z²·n²·max(v)² < 2⁶³ — at sf0.1
    (n ≈ 2·10⁴, v ≤ 3.3·10⁴) both sides stay < 3·10¹⁸; at 100 TB
    promote s/q and the products to DECIMAL(38,0) (same shape — noted
    rather than paid here because the decimal path costs ~2× in
    codegen and the driver hash is over the long outputs).
    A reporting column z_milli_obs = floor(|n·v − s| / sqrt(n·q − s²)
    · 1000) is the ONE double expression per row; IEEE division and
    sqrt are correctly-rounded, so it is cross-engine exact.

    Scale shape: one tiny per-group aggregate (|groups| rows) joined
    back as a broadcast, then a map-side filter — the corpus never
    shuffles.
    """
    stats = (
        df.select(F.col(key_col), value_cents.alias("__v"))
        .groupBy(key_col)
        # count the VALUE column, not rows: NULL measures must drop out
        # of n the same way sum() drops them from s/q, or mu/sigma skew
        .agg(
            F.count("__v").cast("long").alias("__n"),
            F.sum("__v").cast("long").alias("__s"),
            F.sum(F.col("__v") * F.col("__v")).cast("long").alias("__q"),
        )
    )
    flagged = (
        df.withColumn("__v", value_cents)
        .join(F.broadcast(stats), key_col)
        .withColumn("__num", F.col("__n") * F.col("__v") - F.col("__s"))
        .withColumn(
            "__den", F.col("__n") * F.col("__q") - F.col("__s") * F.col("__s")
        )
        .filter(
            F.col("__num") * F.col("__num")
            > F.lit(int(z) * int(z)) * F.col("__den")
        )
    )
    z_obs = F.floor(
        F.abs(F.col("__num")).cast("double")
        / F.sqrt(F.col("__den").cast("double"))
        * F.lit(1000.0)
    ).cast("long")
    return flagged.select(
        F.col(id_col),
        F.col(key_col),
        F.col("__v").alias("value_cents"),
        F.col("__n").alias("group_n"),
        z_obs.alias("z_milli_obs"),
    )


def group_trend(
    df: DataFrame,
    value_cents: Column,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Exact per-group least-squares trend over daily means — "is this
    metric drifting?" — computed so the result is deterministic
    cross-engine.

    Two tiny aggregations: (group, day) -> (sum, count), then per
    group the classic closed-form sums Σx, Σy, Σxy, Σx², Σy² with
    x = days-since-epoch and y = floor(1000·sum/count) (milli-cents
    daily mean; the division is double but both engines floor the same
    correctly-rounded quotient — inputs stay < 2⁵³). The slope and fit
    leave integer space only in the LAST expression per output row:
    slope_micro = floor(num/den · 1e6), r2_ppm = floor(num²/(den·dy)
    · 1e6) with num = nΣxy − ΣxΣy, den = nΣx² − (Σx)², dy = nΣy² −
    (Σy)² — every operand an exact long, every double op correctly
    rounded, so both engines produce identical longs.

    Scale shape: partial+final agg to (groups × days) rows, then a
    second partial+final agg to |groups| rows — the event stream is
    touched once, map-side; nothing is ever broadcast or windowed.
    Degenerate groups (a single day: den = 0) are reported with NULL
    slope/fit rather than dropped.
    """
    day = F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")).cast("long")
    daily = (
        df.select(F.col(key_col), day.alias("__x"), value_cents.alias("__v"))
        .groupBy(key_col, "__x")
        .agg(
            F.sum("__v").cast("long").alias("__s"),
            F.count("__v").cast("long").alias("__c"),
        )
        .select(
            key_col,
            "__x",
            F.floor(F.col("__s").cast("double") * F.lit(1000.0) / F.col("__c"))
            .cast("long")
            .alias("__y"),
        )
    )
    sums = daily.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("__x").cast("long").alias("sx"),
        F.sum("__y").cast("long").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).cast("long").alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("syy"),
    )
    num = (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    nonflat = (den > 0) & (dy > 0)
    return sums.select(
        F.col(key_col),
        F.col("n_days"),
        F.when(den > 0, F.floor(num / den * F.lit(1e6)).cast("long")).alias(
            "slope_micro"
        ),
        F.when(
            nonflat, F.floor(num * num / (den * dy) * F.lit(1e6)).cast("long")
        ).alias("r2_ppm"),
    )
