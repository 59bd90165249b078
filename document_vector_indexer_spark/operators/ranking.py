"""Distributed global ranking — the scale-safe replacement for
``Window.orderBy(...)`` with no ``partitionBy``.

A global window funnels the entire table through ONE WindowExec task;
fine at unit scale, fatal at 100 TB. The two-pass shape used here:

1. sample the sort key ONCE (a bounded TakeOrdered job), pick
   ``n_part - 1`` boundary tuples, and pin them into the plan as
   LITERALS,
2. assign each row a logical bucket id by comparing its key against
   the literal boundaries (map-side, order-preserving: every key in
   bucket i sorts before every key in bucket i+1),
3. per-bucket ``row_number`` (parallel — one hash shuffle on the
   bucket id, inserted by the window itself),
4. per-bucket counts (one tiny row per bucket) -> cumulative offsets
   on the driver-sized counts frame -> broadcast back,
5. global rank = offset + local row number.

Why literal boundaries instead of ``repartitionByRange`` +
``spark_partition_id()`` (the round-2 form): the counts branch and the
join branch recompute their input lineage independently, and
``RangePartitioner``'s boundary sampling is seeded with the RDD id —
a *different* id per recomputation — so the two branches can disagree
about which partition a row near a boundary lands in, silently
corrupting ranks (observed at sf0.1: 88% of ranks off by small
amounts; exchange reuse is an optimization, never a guarantee).
Literal boundaries make the bucket id a pure function of the row's
key, so every recomputation — under AQE, Connect, stage retry, or
plan-branch duplication — agrees by construction.

Total cost: one bounded sample job + one hash shuffle + one broadcast
of #buckets rows — same order as the sort any engine would need, with
no single-task bottleneck. ntile/percent_rank/cume_dist are then
closed-form in (rank, total) when the sort key is unique.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Sampled key tuples per requested bucket: boundary placement error is
# ~ total_rows / (n_part * _SAMPLE_PER_BUCKET), which only affects
# balance, never correctness.
_SAMPLE_PER_BUCKET = 128


def _tuple_gt(cols: list[Column], bound: tuple) -> Column:
    """Lexicographic ``(col_1, ..., col_k) > (b_1, ..., b_k)`` as a
    column expression (Spark has no literal-struct comparison).

    NULL-safe with NULL ordered FIRST (Spark's ``orderBy`` asc
    default, which the per-bucket ``row_number`` window also uses):
    a NULL component is never greater than a non-null bound, and any
    non-null component is greater than a NULL bound. The naive
    ``c > lit(b)`` form returns NULL for NULL keys, which made the
    bucket id NULL and the offsets join silently DROP those rows —
    a data-loss bug caught by round-4 review."""
    expr = F.lit(False)
    for c, b in reversed(list(zip(cols, bound))):
        if b is None:
            gt = c.isNotNull()
            eq = c.isNull()
        else:
            gt = F.coalesce(c > F.lit(b), F.lit(False))
            eq = c.eqNullSafe(F.lit(b))
        expr = gt | (eq & expr)
    return expr


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
    NULL key components are allowed and rank first (Spark's asc
    nulls-first order); rows are never dropped for NULL keys.

    Thin wrapper over :func:`multi_global_rank` (one algorithm, one
    place for NULL/boundary semantics — the r6 review's dedup).
    """
    return multi_global_rank(
        df,
        [(order_cols, rank_col, total_col)],
        num_partitions=num_partitions,
    )


def multi_global_rank(
    df: DataFrame,
    specs: "list[tuple[list[str], str, str]]",
    num_partitions: int | None = None,
) -> DataFrame:
    """Several independent global ranks over the SAME frame in one
    pass structure: ``specs`` is a list of (order_cols, rank_col,
    total_col), each getting the :func:`global_rank` contract
    (order_cols a unique key; NULLs rank first, never dropped).

    Why not chained ``global_rank`` calls: each call re-samples and
    re-counts its INPUT — which for call k is the chain of k-1 window
    stages — so the driver runs one collect job per ordering and every
    sample/counts branch re-executes the whole prior chain (measured:
    ~45% of q_rfm's wall-clock was this recomputation). Here:

    - ONE bounded sample job serves every ordering (the same sampled
      rows are re-sorted client-side by each ordering's key),
    - every bucket id is a map-side literal comparison on the INPUT
      frame, so all counts branches aggregate ``df`` directly and
      never see the window chain,
    - the per-ordering row_number windows chain map-side (one
      exchange+sort each — the sorts are the irreducible work).

    Callers should hand in a lineage-cut frame (``localCheckpoint``)
    when ``df`` is itself expensive: the counts branches scan it once
    per ordering."""
    if num_partitions is not None:
        n_part = num_partitions
    else:
        try:
            n_part = df.sparkSession.sparkContext.defaultParallelism
        except Exception:
            n_part = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
            )
    all_cols: list[str] = []
    for order_cols, _r, _t in specs:
        for c in order_cols:
            if c not in all_cols:
                all_cols.append(c)

    # Pass 0: ONE sample job covering every ordering's key columns.
    cap = n_part * _SAMPLE_PER_BUCKET
    sample = (
        df.select(*[F.col(c) for c in all_cols])
        .withColumn(
            "_h",
            F.md5(
                F.concat_ws("\x1f", *[F.col(c).cast("string") for c in all_cols])
            ),
        )
        .orderBy("_h", *all_cols)
        .limit(cap)
        .drop("_h")
        .collect()
    )
    rows = [tuple(r[c] for c in all_cols) for r in sample]
    idx = {c: i for i, c in enumerate(all_cols)}

    cur = df
    joins = []
    for k, (order_cols, rank_col, total_col) in enumerate(specs):
        cols_i = [idx[c] for c in order_cols]
        # client-side sort, NULLS FIRST asc — the same order the
        # per-bucket row_number window uses
        keys = sorted(
            (tuple(t[i] for i in cols_i) for t in rows),
            key=lambda tup: tuple((v is not None, v) for v in tup),
        )
        bounds = []
        if len(keys) > 1:
            seen = set()
            for j in range(1, n_part):
                b = keys[(j * len(keys)) // n_part]
                if b not in seen:
                    seen.add(b)
                    bounds.append(b)
        key_cols = [F.col(c) for c in order_cols]
        bkt = F.lit(0)
        for b in bounds:
            bkt = bkt + _tuple_gt(key_cols, b).cast("int")
        bname, lname = f"_bkt_{k}", f"_lrn_{k}"
        cur = cur.withColumn(bname, bkt)
        counts = (
            df.withColumn(bname, bkt).groupBy(bname).agg(F.count("*").alias("_cnt"))
        )
        w_ofs = Window.orderBy(bname).rowsBetween(Window.unboundedPreceding, -1)
        w_tot = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offsets = counts.select(
            bname,
            F.coalesce(F.sum("_cnt").over(w_ofs), F.lit(0)).alias(f"_ofs_{k}"),
            F.sum("_cnt").over(w_tot).alias(total_col),
        )
        cur = cur.withColumn(
            lname,
            F.row_number().over(Window.partitionBy(bname).orderBy(*key_cols)),
        )
        joins.append((bname, lname, rank_col, f"_ofs_{k}", offsets))
    for bname, lname, rank_col, ofs, offsets in joins:
        cur = (
            cur.join(F.broadcast(offsets), bname)
            .withColumn(rank_col, F.col(ofs) + F.col(lname))
            .drop(bname, lname, ofs)
        )
    return cur


def global_id(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based id over a global order — the scale-safe stand-in
    for the reference's SERIAL column (index_documents.py:217) and for
    every ``row_number().over(Window.orderBy(...))`` id-assignment
    site. Same contract as :func:`global_rank` (``order_cols`` unique
    and non-null); the total-count column is dropped.

    Note the boundary-sampling pass (pass 0) executes ``df``'s lineage
    once for the key columns only — assign ids BEFORE expensive
    non-prunable stages (mapInPandas embedding) so the sample job
    never pays for them.
    """
    return global_rank(
        df,
        order_cols,
        rank_col=id_col,
        total_col="_gid_total",
        num_partitions=num_partitions,
    ).drop("_gid_total")


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
