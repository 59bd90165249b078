"""Merged query registry — the single source __spark_entry__ exposes."""

from __future__ import annotations

from document_vector_indexer_spark.queries.base import QuerySpec


def all_queries() -> dict[str, QuerySpec]:
    # Imports are local so a broken module surfaces per-import and new
    # modules bolt on with one line.
    from document_vector_indexer_spark.queries import (
        extras,
        relational,
        scalarfuncs,
        streamingops,
        textops,
        vectorops,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (textops, relational, scalarfuncs, vectorops, streamingops, extras):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {sorted(overlap)}")
        merged.update(mod.QUERIES)
    # SURVEY.md §2B names that this implementation carries under a more
    # specific key — registered under both so the inventory check maps
    # one-to-one.
    aliases = {
        "q_cross_cosine": "q_dedup_embed",   # vector x vector similarity join
        "q_dedup_near": "q_dedup_minhash",   # near-dup via MinHash
    }
    for alias, target in aliases.items():
        spec = merged[target]
        merged[alias] = QuerySpec(
            spec.fn, spec.oracle, f"SURVEY §2B alias of {target}"
        )
    return merged
