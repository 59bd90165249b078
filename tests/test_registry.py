"""Registry meta-contract: the structure the driver depends on."""

from __future__ import annotations

import re

from bench import HEADLINE
from document_vector_indexer_spark.queries.registry import all_queries


def test_registry_shape():
    specs = all_queries()
    assert len(specs) >= 85
    for name, spec in specs.items():
        assert re.fullmatch(r"[a-z0-9_]+", name), name
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
    n_oracle = sum(1 for s in specs.values() if s.oracle is not None)
    assert n_oracle >= 78


def test_headline_queries_registered():
    specs = all_queries()
    missing = [n for n in HEADLINE if n not in specs]
    assert not missing, missing


def test_entry_contract_importable():
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(all_queries())


def test_verification_bookkeeping_invariants():
    """The re-verification priority order is hand-maintained; these are
    the invariants a hand edit can silently break (round-4 review):
    every key in exactly one list, no stale names, changed keys first
    in iteration order."""
    from document_vector_indexer_spark.queries.registry import (
        _CHANGED_SINCE_VERIFIED,
        _VERIFIED,
    )

    specs = all_queries()
    assert len(_VERIFIED) == len(set(_VERIFIED)), "duplicate in _VERIFIED"
    assert len(_CHANGED_SINCE_VERIFIED) == len(set(_CHANGED_SINCE_VERIFIED))
    overlap = set(_VERIFIED) & set(_CHANGED_SINCE_VERIFIED)
    assert not overlap, f"keys in both lists: {sorted(overlap)}"
    stale = (set(_VERIFIED) | set(_CHANGED_SINCE_VERIFIED)) - set(specs)
    assert not stale, f"bookkeeping names not in registry: {sorted(stale)}"
    keys = list(specs)
    assert keys[: len(_CHANGED_SINCE_VERIFIED)] == [
        k for k in _CHANGED_SINCE_VERIFIED if k in specs
    ], "changed-since-verified keys must lead the iteration order"
