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


# Re-verification policy (round-3 rework of the round-2 rotation, per
# ADVICE): registry iteration order is a *priority* order — the least
# proven keys come first — so any bounded correctness budget (the driver
# checks a prefix of the registry; local CI may do the same) spends its
# checks where they carry information:
#
#   1. _CHANGED_SINCE_VERIFIED: keys whose implementation changed after
#      their last green driver row. A stale green row is NOT evidence,
#      so these always re-front. Maintained by hand each round: touch a
#      query (or an operator it calls) -> add its key here; a fresh
#      green row in CORRECTNESS_r*.json -> remove it.
#   2. Never-driver-verified keys (everything not in _VERIFIED).
#   3. Verified-and-unchanged keys, registration order preserved.
#
# The round-2 version of this ordering only rotated verified keys to the
# back, which let the rewritten q_win_ntile evade re-checking behind its
# stale round-1 row — exactly what rule 1 now prevents.

# Changed in round 4 (stale or red prior row): see rule 1 above.
_CHANGED_SINCE_VERIFIED = [
    "q_sample_split",    # r4: oracle sum() cast to BIGINT (r3 red hash row)
    "q_pack_sequences",  # r4: same HUGEINT cast fix
    "q_mix_sources",     # r4: same HUGEINT cast fix + _duck_units reflow
    "q_decontaminate",   # r4: oracle text reflowed by the _duck_units
                         #     refactor (same semantics, re-checked locally)
    "q_sink_roundtrip",  # r4: pipeline id now ranking.global_id (pre-embed)
    "q_tpch_q17",        # r4: join-back shuffle-pinned, broadcast dropped
    "q_knn_ivf",         # r4: pinned-centroid variant, now oracled
    "q_lsh_buckets",     # r4: oracle generator refactored (shared with
                         #     q_knn_lsh_pinned); SQL semantically
                         #     identical but re-front on principle
]

# Keys with a green (or, for rows-only keys, clean-run) driver row in
# CORRECTNESS_r01/r02 (and unchanged since, unless listed above).
# r1 block:
_VERIFIED = [
    "flagship_chunk_topk",
    "q_chunk_fixed",
    "q_chunk_paragraph",
    "q_chunk_sentence",
    "q_clean_text",
    "q_text_stats",
    "q_lang_id",
    "q_doc_fingerprint",
    "q_token_count",
    "q_scan_parquet",
    "q_project_filter",
    "q_filter_regexp",
    "q_join_inner",
    "q_join_left",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_range",
    "q_join_asof",
    "q_agg_basic",
    "q_agg_distinct",
    "q_agg_approx",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_gsets",
    "q_agg_collect",
    "q_win_rank",
    "q_win_lag",
    "q_win_frame",
    "q_win_ntile",
    "q_topk",
    "q_topk_per_group",
    "q_sort_multi",
    "q_union",
    "q_intersect",
    "q_except",
    "q_str_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_array_funcs",
    "q_json_funcs",
    "q_map_funcs",
    "q_pivot",
    "q_unpivot",
    "q_vec_cosine",
    "q_vec_norm",
    "q_vec_dim_check",
    "q_knn_brute",
    "q_knn_per_query",
    # r2 block (green oracle rows in CORRECTNESS_r02.json):
    "q_dedup_exact",
    "q_dedup_simhash",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_stateful",
    "q_redact_pii",
    "q_profile",
    "q_null_funcs",
    "q_agg_bool",
    "q_date_series",
    "q_merge_upsert",
    "q_join_skew",
    "q_agg_two_phase",
    "q_win_range_frame",
    "q_quality_score",
    "q_agg_stats",
    "q_agg_percentile",
    "q_hof_exists",
    "q_tpch_q3",
    "q_tpch_q4",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q10",
    "q_tpch_q12",
    "q_tpch_q14",
    "q_tpch_q19",
    # (q_sink_roundtrip, q_knn_ivf -> _CHANGED_SINCE_VERIFIED for r4)
    # r2 block, rows-only keys that ran clean (no oracle by design):
    "q_knn_lsh",
    "q_dedup_minhash",
    "q_dedup_near",
    "q_embed_local",
    "q_embed_pipeline",
    "q_multimodal",
    # r3 block (green oracle rows in CORRECTNESS_r03.json).
    # Protocol note (round-4 review): a key lives in EXACTLY ONE place —
    # either a _VERIFIED block or _CHANGED_SINCE_VERIFIED, never both;
    # on a fresh green driver row move it from changed to verified.
    # (q_win_ntile already sits in the r1 block above.)
    "q_dedup_embed",
    "q_cross_cosine",
    "q_dedup_ngram",
    "q_tpch_q18",
    "q_source_binary",
    "q_repetition",
    # (q_decontaminate -> _CHANGED_SINCE_VERIFIED: _duck_units reflow)
    "q_vocab_topk",
    "q_vec_quantize",
    "q_dedup_semantic",
    "q_dedup_cluster",
    "q_stream_join",
    "q_sql_passthrough",
    "q_tpch_q2",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q13",
    "q_tpch_q15",
    "q_tpch_q16",
    # (q_tpch_q17 -> _CHANGED_SINCE_VERIFIED for r4)
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q22",
    "q_unigram_logprob",
    "q_dedup_lines",
    "q_gopher_filter",
    "q_sample_stratified",
    "q_corpus_shuffle",
    "q_jsonl_roundtrip",
    # r3 rows-only, ran clean:
    "q_dedup_minhash_mllib",
]


def _reverification_order(merged: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    """Priority order per the policy above: changed-since-verified keys
    first, never-verified keys next, verified-and-unchanged keys last;
    registration order preserved within each group. Pure reordering —
    the key set and every spec are untouched."""
    changed = [k for k in _CHANGED_SINCE_VERIFIED if k in merged]
    verified = set(_VERIFIED) - set(changed)
    front = {k: merged[k] for k in changed}
    middle = {k: v for k, v in merged.items() if k not in verified and k not in front}
    back = {k: v for k, v in merged.items() if k in verified}
    return {**front, **middle, **back}
