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
    """-> (column, n_rows, n_nulls, n_distinct, min_str, max_str).

    Plan shape (r14): one single-distinct aggregate PER COLUMN,
    unioned — not one wide aggregate with k countDistinct's. Multiple
    distinct aggregates in one agg make Catalyst EXPAND the input
    (one replica per distinct spec: k+1 x the corpus rows through the
    aggregation — measured 306 s at ~sf100 on a 5-column profile,
    47.6 s this shape, 6.4x, same-load A/B). Per-column aggs each get the
    specialized single-distinct two-phase plan (partial dedup
    map-side, no Expand) and a one-column pruned scan; the union is
    k 1-row frames. Same exact semantics, and the same shape as the
    DuckDB oracle's UNION ALL."""
    cols = cols or df.columns
    parts = []
    for c in cols:
        parts.append(
            df.select(F.col(c))
            .agg(
                F.count("*").alias("n_rows"),
                F.count_if(F.col(c).isNull()).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                # min/max of the VALUE, stringified after (not
                # lexicographic)
                F.min(F.col(c)).cast("string").alias("min_str"),
                F.max(F.col(c)).cast("string").alias("max_str"),
            )
            .select(
                F.lit(c).alias("column"),
                "n_rows", "n_nulls", "n_distinct", "min_str", "max_str",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str"
    )


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

    Range: s/q and every product in the comparison are computed in
    DECIMAL(38,0) (r10 — the promotion this docstring used to defer
    was MEASURED necessary one decade up: at ~sf1, n ≈ 2·10⁵ per
    group makes num² ≈ 4·10¹⁹ > 2⁶³ and the ANSI session throws
    ARITHMETIC_OVERFLOW; the r10 sweep caught it). Decimal sums and
    products are exact integers up to 10³⁸, which covers 100 TB
    (n = 10¹² rows/group, v ≤ 10⁶ cents → num² ≈ 10³³,
    n·q ≈ 10³³). The DuckDB oracle mirrors with HUGEINT (int128,
    max ≈ 1.7·10³⁸ — same headroom). Output columns stay BIGINT, so
    driver hashes are unchanged. The decimal filter costs ~2× the
    long form in codegen — paid, because the long form is WRONG one
    decade up, and the filter is map-side over a broadcast join
    anyway. A reporting column z_milli_obs = floor(|n·v − s| /
    sqrt(n·q − s²) · 1000) is the ONE double expression per row;
    decimal→double and HUGEINT→double are both correctly rounded, and
    IEEE division and sqrt are correctly-rounded, so it is
    cross-engine exact at driver-checked magnitudes (< 2⁵³).

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
            # per-term decimal BEFORE the sum: a long sum wraps (or, ANSI,
            # throws) once n·v̄ or n·v̄² passes 2⁶³ — measured at ~sf1
            F.sum(F.col("__v").cast("decimal(38,0)")).alias("__s"),
            # cast each FACTOR, not the product: v*v in long already
            # overflows for v > ~3·10⁹ (the regression test plants it)
            F.sum(
                F.col("__v").cast("decimal(38,0)")
                * F.col("__v").cast("decimal(38,0)")
            ).alias("__q"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    flagged = (
        df.withColumn("__v", value_cents)
        .join(F.broadcast(stats), key_col)
        .withColumn("__num", dec(F.col("__n")) * dec(F.col("__v")) - F.col("__s"))
        .withColumn(
            "__den", dec(F.col("__n")) * F.col("__q") - F.col("__s") * F.col("__s")
        )
        .filter(
            F.col("__num") * F.col("__num")
            > F.lit(int(z) * int(z)).cast("decimal(38,0)") * F.col("__den")
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


def sessionize(
    df: DataFrame,
    gap_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts whenever a user
    is idle longer than ``gap_s`` seconds — the standard clickstream
    primitive (the batch complement of streaming's ``session_window``,
    which q_stream_session already covers; this is the shape used for
    backfills over historical data).

    Adds ``ts_us`` (event time in exact epoch microseconds — integer,
    so the gap test and durations are deterministic cross-engine) and
    ``session_id`` (1-based running count of session starts per user;
    (user_col, session_id) identifies a session).

    Scale shape: ONE shuffle on ``user_col``; both windows (the lag
    for the gap flag and the running sum that numbers sessions) share
    that partitioning and an explicit unique ordering (ts, id) with a
    ROWS frame, so the plan is Exchange -> Sort -> two WindowExecs —
    per-user state only, no global window, no driver materialization.
    Skew note: the window holds one user's events per task; a
    pathological single-user firehose would need a pre-split on
    (user, coarse time bucket) with session stitching at bucket
    boundaries — not paid here because real user streams are bounded.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))  # NTZ-safe:
    # raw parquet reads surface TIMESTAMP_NTZ in Spark 4; under the
    # UTC-pinned session the cast is exact (and a no-op post-load_table)
    prev = F.lag(us).over(w)
    new_session = (
        F.when(prev.isNull() | (us - prev > gap_s * 1_000_000), F.lit(1))
        .otherwise(F.lit(0))
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("ts_us", us)
        .withColumn("__new_session", new_session)
        .withColumn(
            "session_id", F.sum("__new_session").over(run).cast("long")
        )
        .drop("__new_session")
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Collapse an event stream into type-2 slowly-changing-dimension
    intervals: one row per consecutive run of the same ``attr_col``
    value per key, with ``valid_from_us`` / ``valid_to_us`` validity
    bounds (half-open: valid_to = the next run's first event time;
    NULL on the current run) — the standard CDC -> dimension-table
    build, done as gaps-and-islands.

    Assumes ``attr_col`` is non-null (true for events.event_type; a
    nullable attribute would need null-safe run comparison).

    Returns (key, attr, valid_from_us, valid_to_us, n_events,
    is_current) with is_current as int (0/1) for portable hashing.

    Scale shape: the RAW stream shuffles once on ``key_col`` (lag +
    running-sum windows, unique (ts, id) ROWS ordering — the same
    single-key trick as :func:`sessionize`; a second row_number per
    (key, attr) would have cost another full shuffle). The follow-up
    aggregation to runs and the lead() that closes each interval
    operate on run-level frames, which are |runs|-sized — already
    reduced data, orders of magnitude below the raw stream.
    """
    from pyspark.sql.window import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))  # NTZ-safe:
    # raw parquet reads surface TIMESTAMP_NTZ in Spark 4; under the
    # UTC-pinned session the cast is exact (and a no-op post-load_table)
    # Windows order by the exact-µs projection (identical order to the
    # raw timestamp — unix_micros is monotone) so the pre-window select
    # can drop the timestamp column.
    w = Window.partitionBy(key_col).orderBy("__us", id_col)
    prev_attr = F.lag(F.col(attr_col)).over(w)
    changed = (
        F.when(prev_attr.isNull() | (prev_attr != F.col(attr_col)), F.lit(1))
        .otherwise(F.lit(0))
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = (
        df.select(F.col(key_col), F.col(attr_col), us.alias("__us"),
                  F.col(id_col))
        .withColumn("__chg", changed)
        .withColumn("__run", F.sum("__chg").over(run).cast("long"))
    )
    runs = flagged.groupBy(key_col, "__run").agg(
        # attr is constant within a run by construction; min() makes
        # that algebraically explicit (and partial-aggregates).
        F.min(attr_col).alias(attr_col),
        F.min("__us").alias("valid_from_us"),
        F.count("*").cast("long").alias("n_events"),
    )
    w_runs = Window.partitionBy(key_col).orderBy("__run")
    return (
        runs.withColumn(
            "valid_to_us", F.lead("valid_from_us").over(w_runs)
        )
        .select(
            key_col,
            attr_col,
            "valid_from_us",
            "valid_to_us",
            "n_events",
            F.col("valid_to_us").isNull().cast("int").alias("is_current"),
        )
    )


def value_histogram(
    df: DataFrame,
    bin_cents: int = 5000,
    value_col: str = "value",
    key_col: str = "event_type",
) -> DataFrame:
    """Fixed-width histogram of a monetary measure per group — the
    data-profiling companion to :func:`profile` (distribution shape,
    not just min/max). Bins are exact: values quantize to integer
    cents first (rint — the repo's fixed-point discipline), then bin
    by INTEGER division, so bin edges can never float-drift between
    engines. Non-negative values assumed (events.value ≥ 0; negative
    measures would need floor-division semantics pinned explicitly).

    Returns (key, bin, bin_lo_cents, n, min_cents, max_cents,
    sum_cents), one row per occupied bin.

    Scale shape: pure map-side projection + one partial/final hash
    aggregation on (key, bin) — cardinality = groups x occupied bins,
    tiny at any data scale. The raw stream is touched once and never
    shuffled (only the partial aggregates move).
    """
    cents = F.rint(F.col(value_col) * 100).cast("long")
    binned = df.select(
        F.col(key_col),
        cents.alias("__c"),
    ).withColumn("bin", F.expr(f"__c div {int(bin_cents)}"))
    return (
        binned.groupBy(key_col, "bin")
        .agg(
            F.count("*").alias("n"),
            F.min("__c").alias("min_cents"),
            F.max("__c").alias("max_cents"),
            F.sum("__c").cast("long").alias("sum_cents"),
        )
        .withColumn("bin_lo_cents", F.col("bin") * int(bin_cents))
        .select(
            key_col, "bin", "bin_lo_cents", "n",
            "min_cents", "max_cents", "sum_cents",
        )
    )


def mad_outliers(
    df: DataFrame,
    value_cents: Column,
    key_col: str = "event_type",
    id_col: str = "event_id",
    k_tenthousandths: int = 44_478,  # 3 x 1.4826 (consistency const) x 1e4
) -> DataFrame:
    """Robust per-group outlier detection via median absolute deviation
    — the standard companion to :func:`zscore_outliers` when the group
    mean/variance are themselves dragged by the outliers (z-score
    masking). Flags |v − median| · 1e4 > k · MAD.

    Cross-engine exact: values quantize to integer cents first; the
    median of longs is always n.0 or n.5 (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``, the q_agg_percentile-established parity
    pair), so deviations are exact half-integer doubles and the
    threshold comparison multiplies them into ranges far below 2⁵³ —
    every operand bit-identical in both engines, no epsilon anywhere.

    Scale shape: two passes over the stream (median, then MAD of the
    deviations — MAD is inherently two-phase when exact), each pass a
    tiny |groups|-row aggregate joined back as a broadcast; the stream
    itself never shuffles. A single-pass deployment at 100 TB would
    substitute approx_percentile for both medians (same shape, sketch
    merge instead of exact sort) — kept exact here because the driver
    hash demands it and the contract is the shape, not the sketch.
    """
    c = df.select(F.col(id_col), F.col(key_col), value_cents.alias("__v"))
    med = c.groupBy(key_col).agg(
        F.percentile("__v", F.lit(0.5)).alias("med")
    )
    with_dev = c.join(F.broadcast(med), key_col).withColumn(
        "__dev", F.abs(F.col("__v").cast("double") - F.col("med"))
    )
    mad = with_dev.groupBy(key_col).agg(
        F.percentile("__dev", F.lit(0.5)).alias("mad"),
        F.count("*").cast("long").alias("group_n"),
    )
    return (
        with_dev.join(F.broadcast(mad), key_col)
        .filter(
            F.col("__dev") * F.lit(10_000.0)
            > F.lit(float(k_tenthousandths)) * F.col("mad")
        )
        .select(
            F.col(id_col),
            F.col(key_col),
            F.col("__v").alias("value_cents"),
            F.col("med"),
            F.col("mad"),
            F.col("group_n"),
        )
    )


def changepoint_cusum(
    df: DataFrame,
    value_cents: Column,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Offline CUSUM changepoint detection per group over daily means —
    "WHEN did this metric shift?", the follow-up question to
    :func:`group_trend`'s "is it drifting?". The classic cumulative-
    deviation statistic: with daily means y_1..y_n (milli-cents,
    floored — the group_trend discipline), the candidate changepoint
    maximizes |D_d| where D_d = n·Σ_{i≤d} y_i − d·Σy — the
    n-scaled form keeps every operand an exact long (no division
    until the reported before/after means, which floor a correctly-
    rounded double quotient). Ties break to the earliest day.

    Long-range bound: |D| ≤ n · Σy ≈ n² · max(y); at milli-cent daily
    means (y ≤ 5·10⁵ here) that holds to n ≈ 10⁵ days — calendar time
    bounds it far earlier. Output is one row per group: the argmax
    day, the statistic, and floored before/after means.

    Scale shape: identical to group_trend — the stream collapses
    map-side+one shuffle into a (groups × days) daily frame; the
    cumsum/argmax windows and final rollup run on that calendar-
    bounded frame (the q_win_frame precedent: #rows == #days at ANY
    raw-data scale).
    """
    from pyspark.sql.window import Window

    day = F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")).cast("long")
    daily = (
        df.select(F.col(key_col), day.alias("__d"), value_cents.alias("__v"))
        .groupBy(key_col, "__d")
        .agg(
            F.sum("__v").cast("long").alias("__s"),
            F.count("__v").cast("long").alias("__c"),
        )
        .select(
            key_col,
            "__d",
            F.floor(F.col("__s").cast("double") * F.lit(1000.0) / F.col("__c"))
            .cast("long")
            .alias("__y"),
        )
    )
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy("__d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key_col)
    scored = daily.select(
        key_col,
        "__d",
        F.sum("__y").over(w_cum).alias("__cum"),
        F.row_number()
        .over(Window.partitionBy(key_col).orderBy("__d"))
        .cast("long")
        .alias("__i"),
        F.sum("__y").over(w_all).alias("__tot"),
        F.count("*").over(w_all).cast("long").alias("n_days"),
    ).withColumn(
        "__dev", F.col("n_days") * F.col("__cum") - F.col("__i") * F.col("__tot")
    )
    w_pick = Window.partitionBy(key_col).orderBy(
        F.abs(F.col("__dev")).desc(), F.col("__d")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w_pick))
        .filter(F.col("__rk") == 1)
        .select(
            F.col(key_col),
            F.col("n_days"),
            F.col("__d").alias("cp_day"),
            F.abs(F.col("__dev")).alias("max_absdev"),
            F.floor(F.col("__cum").cast("double") / F.col("__i"))
            .cast("long")
            .alias("mean_before_milli"),
            F.when(
                F.col("__i") < F.col("n_days"),
                F.floor(
                    (F.col("__tot") - F.col("__cum")).cast("double")
                    / (F.col("n_days") - F.col("__i"))
                ).cast("long"),
            ).alias("mean_after_milli"),
        )
    )
