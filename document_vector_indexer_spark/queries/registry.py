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
    return merged
