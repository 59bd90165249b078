"""Skew mitigation utilities.

AQE's skew-join splitting (on by default in session.py) handles most
runtime skew; these helpers cover the cases AQE can't:

- ``salted_join``: a hot-key equi join where ONE side has pathological
  key skew (the classic power-law user_id / null-key pile-up). The
  skewed side gets a deterministic salt in [0, salt); the small side
  is replicated salt times; the join key becomes (key, salt) so a hot
  key spreads over ``salt`` reducers instead of melting one.
- ``two_phase_agg``: aggregation on a skewed group key — pre-aggregate
  on (key, salt), then merge. Spark's partial aggregation already does
  this per-partition; the explicit salt phase helps when a single key
  dominates entire partitions *after* the shuffle (partial agg can't
  help across partitions).

Salts are deterministic (hash of a stable column, or the key itself)
— never rand(): retries and oracle checks must reproduce.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt: int, stable_col: str, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, salt) derived from a stable column."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(stable_col)), F.lit(salt)).cast("int")
    )


def replicate(df: DataFrame, salt: int, salt_col: str = "_salt") -> DataFrame:
    """Cross the (small) build side with salts 0..salt-1."""
    # cast inside transform, not around explode (generators cannot be
    # nested in expressions)
    return df.withColumn(
        salt_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(salt - 1)), lambda x: x.cast("int")
            )
        ),
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    stable_col: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join robust to hot keys on the ``skewed`` side.

    ``small`` is replicated ``salt`` times (only viable when it is the
    much smaller side — which is exactly the hot-key scenario: a huge
    skewed fact against a dimension). Result equals the plain join.

    ``stable_col`` must be a (nearly) row-unique column of the skewed
    side (its primary key): salting by the JOIN key would put every
    row of the hot key in the same salt bucket and change nothing.

    The join is MERGE-pinned (r11 raw-layout broadcast audit): left
    unhinted, Catalyst broadcast the narrow PROJECTION of the skewed
    corpus side at ~sf1 (the q_tpch_q4 class — post-projection size
    estimates ride under the threshold long after the build is
    millions of rows), which both breaks at 100 TB and silently
    bypasses the salting this operator exists to provide. Merge per
    the r10 durable pin rule: the replicated side is |small|·salt —
    caller-asserted small but not provably partition-bounded here, and
    sorts spill where hash builds cannot.
    """
    a = with_salt(skewed, salt, stable_col)
    b = replicate(small, salt)
    out = a.join(b.hint("merge"), [*on, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
    stable_col: str,
    salt: int = 8,
) -> DataFrame:
    """Skew-tolerant aggregation: pre-aggregate on (group_cols, salt),
    then merge partials. Supports sum-mergeable partials only — every
    value in ``aggs`` must be a sum()/count() expression (the merge
    step sums the partials).
    """
    salted = with_salt(df, salt, stable_col)
    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[v.alias(f"_p_{k}") for k, v in aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[F.sum(f"_p_{k}").alias(k) for k in aggs]
    )
