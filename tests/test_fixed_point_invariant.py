"""Half-cent exclusion: the GENERATOR INVARIANT that keeps the repo's
fixed-point convention portable (round-4 ADVICE, item 1).

Every monetary/metric quantization in the engine uses Spark's
``F.rint(x * 100)`` (Java ``Math.rint`` — round-HALF-TO-EVEN), while
every DuckDB oracle uses ``round(x * 100, 0)`` (round-HALF-AWAY-FROM-
ZERO). The two conventions agree everywhere EXCEPT when ``x * 100``
lands on an exact ``.5`` double. Rewriting ~70 call sites to one
convention would churn every oracle for zero behavioral gain on data
that never hits the half grid — so instead this test PROVES the test
corpus never hits it, for every double column the engine quantizes and
every derived expression it quantizes ((1±discount/tax)*100, and the
1e-6 embedding-component grid of q_vec_centroid).

If a future generator emits a half-grid value, this fails with the
exact (table, column, value) — at that point pick one convention on
both sides rather than weakening this test.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

# (table, column) pairs quantized at the cents grid somewhere in the
# engine/oracles (grep: rint(... * 100) / round(... * 100, 0)).
CENTS_COLS = [
    ("events", "value"),
    ("lineitem", "l_quantity"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
    ("orders", "o_totalprice"),
    ("customer", "c_acctbal"),
    ("part", "p_retailprice"),
    ("supplier", "s_acctbal"),
]


def _half_away(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def _assert_conventions_agree(x: np.ndarray, where: str) -> None:
    x = x[~np.isnan(x)]
    diff = np.rint(x) != _half_away(x)
    assert not diff.any(), (
        f"{where}: {int(diff.sum())} value(s) on the half grid, e.g. "
        f"{x[diff][:5].tolist()} — rint (Spark) and round-half-away "
        f"(DuckDB oracles) diverge; the generator invariant is broken"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table,col", CENTS_COLS)
def test_no_half_cents(sf_dir, table, col):
    v = pq.read_table(f"{sf_dir}/{table}.parquet", columns=[col])[
        col
    ].to_numpy(zero_copy_only=False).astype("float64")
    _assert_conventions_agree(v * 100.0, f"{sf_dir}/{table}.{col}*100")
    if col in ("l_discount", "l_tax"):
        # the engine also quantizes the derived multipliers
        _assert_conventions_agree(
            (1.0 - v) * 100.0, f"{sf_dir}/{table}.(1-{col})*100"
        )
        _assert_conventions_agree(
            (1.0 + v) * 100.0, f"{sf_dir}/{table}.(1+{col})*100"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_no_half_micros_embeddings(sf_dir):
    """q_vec_centroid quantizes float32 embedding components at the
    1e-6 grid after a cast to double — same two conventions, same
    exclusion requirement."""
    arr = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )["embedding"]
    flat = arr.combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    ).astype("float64")
    _assert_conventions_agree(flat * 1e6, f"{sf_dir}/embeddings.x*1e6")
