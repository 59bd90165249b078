"""Merged query registry — the single source __spark_entry__ exposes."""

from __future__ import annotations

from document_vector_indexer_spark.queries.base import QuerySpec


def all_queries() -> dict[str, QuerySpec]:
    # Imports are local so a broken module surfaces per-import and new
    # modules bolt on with one line.
    from document_vector_indexer_spark.queries import (
        analyticsops,
        corpusops,
        extras,
        miningops,
        relational,
        scalarfuncs,
        searchops,
        streamingops,
        textops,
        tpch_full,
        vectorops,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (
        textops,
        relational,
        scalarfuncs,
        vectorops,
        streamingops,
        extras,
        tpch_full,
        corpusops,
        searchops,
        analyticsops,
        miningops,
    ):
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
    return _reverification_order(merged)


# Re-verification policy (round-5 rework per VERDICT item 6; history:
# round-3 changed-keys-first replaced the round-2 back-rotation that let
# a rewritten q_win_ntile hide behind a stale green row): registry
# iteration order is a *priority* order — the least proven keys come
# first — so any bounded correctness budget (the driver checks a ~50-key
# prefix per round; local CI may do the same) spends its checks where
# they carry information:
#
#   1. _CHANGED_SINCE_VERIFIED: keys whose implementation or oracle text
#      changed after their last green driver row. A stale green row is
#      NOT evidence, so these always re-front. Maintained by hand each
#      round: touch a query (or an operator/oracle it uses) -> add its
#      key here; a fresh green row in CORRECTNESS_r*.json -> remove it.
#   2. Everything else ordered by LAST-VERIFIED ROUND ascending (oldest
#      driver row first; never-verified keys sort as round 0, i.e.
#      first), registration order breaking ties.
#
# Rule 2 is what makes the rotation guarantee EXPLICIT: with N keys and
# a budget of B per round, oldest-first means every key is re-checked
# within ceil(N/B) rounds (162 keys / 50 per round -> every key within 4
# rounds). The last-verified rounds are read from the driver's own
# CORRECTNESS_r*.json files at the repo root — self-maintaining: the
# next round's file automatically pushes this round's checked keys to
# the back of the queue. tests/test_registry.py simulates the rotation
# forward and asserts the staleness bound.

# Changed in round 10: see rule 1 above.
_CHANGED_SINCE_VERIFIED: list[str] = [
    "q_multimodal_pinned",  # NEW r10 (r9 VERDICT item 3): oracled
                            #     sibling of q_multimodal — executor-
                            #     encoded PNG/BMP/PNM round-tripped
                            #     through the stdlib decode tier to
                            #     exact-integer stats vs mirrored
                            #     pure-arithmetic literals. Rows-only
                            #     count drops 5 -> 4
    "q_stream_stateful",    # r10: read_events_stream's directory branch
                            #     now probes the parquet footer's ts type
                            #     (NTZ dir -> NTZ schema + cast) instead
                            #     of declaring every directory LTZ (r9
                            #     ADVICE: dir shape is layout, not
                            #     provenance), and grew the
                            #     maxFilesPerTrigger backpressure knob.
                            #     Late-data watermark tests pinned on
                            #     both layouts under hostile TZ
    "q_source_binary",      # r10: minidoc ADVICE fixes — duplicated
                            #     ObjStm offsets raise eagerly (strict-
                            #     ascending check); %-comment spans
                            #     strip to a token-separator space so
                            #     '/Length % note\n42' resolves (NUL
                            #     kept for string spans). Both pinned
    "q_dedup_embed",        # r10 decade-sweep fix: sign-LSH bits now
                            #     "auto" (sized ~log2(n/32); fixed
                            #     bits=4 went quadratic at ~sf1 and
                            #     filled the disk), hot buckets capped
                            #     at 512 (second decade: anisotropic
                            #     sign skew — p99 occupancy ~7x the
                            #     target at ~sf10), candidate join
                            #     MERGE-pinned (hash builds can't
                            #     spill). Oracle (brute force)
                            #     unchanged — bits/cap-independent on
                            #     the planted corpus (cap never binds
                            #     below ~sf1; measured max 80 vs 512)
    "q_cross_cosine",       # r10: alias of q_dedup_embed — same rework
    "q_outliers",           # r10 decade-sweep fix: comparison terms
                            #     promoted to DECIMAL(38,0) (num² passes
                            #     2^63 at ~sf1 under the ANSI session);
                            #     oracle mirrors with HUGEINT. Outputs
                            #     stay BIGINT
    "q_tpch_q4",            # r10: the sweep's one super-linear key —
                            #     Catalyst broadcast the corpus-sized
                            #     l_orderkey build (18.8x at 10x data);
                            #     semi-join merge-pinned (shuffle_hash
                            #     died at ~sf10 in q21 — sorts spill,
                            #     hash builds don't)
    "q_tpch_q21",           # r10 broadcast-audit fix: raw lineitem
                            #     EXISTS/NOT EXISTS builds merge-pinned
                            #     (broadcast died at ~sf1 by plan cost,
                            #     shuffle_hash at ~sf10 by build memory;
                            #     completes at ~sf10 only as SMJ)
]
# (The round-9 list — the TZ fix, the _SUCCESS gate, the asof rewrite
# and the ObjStm/grammar-resolver keys — got green rows in
# CORRECTNESS_r09.json and rotates by age like everything else now,
# exactly as the round-5/6 lists did before it.)


def _last_verified_rounds() -> dict[str, int]:
    """Key -> latest round with a usable driver row: a green oracle row
    (hash_match) or, for rows-only-by-design keys, a clean run
    (err == 'no_oracle' with a row count). Red/errored rows do NOT
    count as verification — those keys keep their older round (or 0)
    and stay near the front. Missing files (fresh clone) degrade to
    everything-never-verified, i.e. plain registration order."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for key, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if ok:
                last[key] = max(last.get(key, 0), rnd)
    return last


def _priority_order(
    keys: list[str], changed: list[str], last: dict[str, int]
) -> list[str]:
    """Pure ordering rule (unit-testable): changed keys first in their
    declared order, then everything else oldest-verified-first with
    registration order as the tiebreak."""
    reg_pos = {k: i for i, k in enumerate(keys)}
    front = [k for k in changed if k in reg_pos]
    in_front = set(front)
    rest = sorted(
        (k for k in keys if k not in in_front),
        key=lambda k: (last.get(k, 0), reg_pos[k]),
    )
    return front + rest


def _reverification_order(merged: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    """Priority order per the policy above. Pure reordering — the key
    set and every spec are untouched."""
    order = _priority_order(
        list(merged), _CHANGED_SINCE_VERIFIED, _last_verified_rounds()
    )
    return {k: merged[k] for k in order}
