"""Direct tests for the search/analytics operators (BM25, TF-IDF
keywords, C4 line filter, z-score outliers) — plan pins for the scale
contracts plus pure-Python semantic checks. Value-exactness vs DuckDB
is covered by test_driver_parity via the registry sweep."""

from __future__ import annotations

import math

from tests.parity_util import formatted_plan, tree_of

SF = "/root/testdata/sf0.001"


def _plan_tree(spark, df) -> str:
    return tree_of(formatted_plan(spark, df))


# --- BM25 -------------------------------------------------------------


def test_bm25_matches_pure_python(spark):
    """Recompute Lucene-style BM25 in plain Python over the sf0.001
    corpus and assert the Spark top-20 set + quantized scores match."""
    from document_vector_indexer_spark.queries.searchops import BM25_TERMS, bm25_q

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    docs = {r["doc_id"]: r["text"].split() for r in rows}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    dft = {
        t: sum(1 for w in docs.values() if t in w) for t in BM25_TERMS
    }
    k1, b = 1.2, 0.75
    expect = {}
    for d, words in docs.items():
        score, hits = 0, 0
        for t in BM25_TERMS:
            tf = words.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - dft[t] + 0.5) / (dft[t] + 0.5))
            s = idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (len(words) / avgdl))))
            score += math.floor(s * 1e6)
        if hits:
            expect[d] = (hits, score)
    top = sorted(expect.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    got = bm25_q(spark, SF).collect()
    assert [(r["doc_id"], (r["n_hit_terms"], r["score_q"])) for r in got] == top


def test_bm25_plan_is_take_ordered_no_cartesian(spark):
    from document_vector_indexer_spark.queries.searchops import bm25_q

    tree = _plan_tree(spark, bm25_q(spark, SF))
    assert "TakeOrderedAndProject" in tree, tree
    assert "CartesianProduct" not in tree, tree
    # df-per-term joins back as a true broadcast: bounded by |query|,
    # never by the corpus.
    assert "BroadcastHashJoin" in tree, tree


# --- TF-IDF keywords --------------------------------------------------


def test_tfidf_vocab_join_not_broadcast(spark):
    """The word→df lookup must stay a shuffle join on the word key (a
    web corpus's vocabulary need not fit one executor); the only
    broadcast is the 1-row doc count."""
    from document_vector_indexer_spark.queries.searchops import keywords_tfidf_q

    tree = _plan_tree(spark, keywords_tfidf_q(spark, SF))
    assert "ShuffledHashJoin" in tree or "SortMergeJoin" in tree, tree
    assert tree.count("BroadcastExchange") <= 1, tree
    assert "CartesianProduct" not in tree, tree


def test_tfidf_topn_and_rank_shape(spark):
    from document_vector_indexer_spark.queries.searchops import keywords_tfidf_q

    rows = keywords_tfidf_q(spark, SF).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in per_doc.items():
        ranks = sorted(r["kw_rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)), (d, ranks)
        assert len(rs) <= 3
        by_rank = sorted(rs, key=lambda r: r["kw_rank"])
        scores = [r["tfidf_q"] for r in by_rank]
        assert scores == sorted(scores, reverse=True), (d, scores)


# --- C4 line filter ---------------------------------------------------


def test_c4_planted_line_counts(spark):
    from document_vector_indexer_spark.queries.searchops import c4_lines_q

    got = {r["doc_id"]: r for r in c4_lines_q(spark, SF).collect()}
    # doc 0: 0 % 11 == 0 -> lorem ipsum -> whole doc dropped
    assert 0 not in got and 11 not in got and 33 not in got
    # doc 1: header line + unique ref line, both kept
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (2, 2)
    # doc 12: % 3 (brace+javascript), % 4 (2 words), % 2 (no terminal
    # punctuation) all planted and all dropped; header + ref kept
    assert (got[12]["n_lines"], got[12]["n_kept"]) == (5, 2)
    # doc 2: no-punctuation line planted, dropped
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (3, 2)


def test_c4_plan_is_map_side(spark):
    from document_vector_indexer_spark.queries.searchops import c4_lines_q

    tree = _plan_tree(spark, c4_lines_q(spark, SF))
    assert "Join" not in tree, tree
    n_exchanges = sum("Exchange" in l for l in tree.splitlines())
    assert n_exchanges <= 1, f"C4 filter grew a shuffle beyond the sort:\n{tree}"


# --- z-score outliers -------------------------------------------------


def test_outliers_match_pure_python(spark):
    from document_vector_indexer_spark.queries.searchops import outliers_q

    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "event_type", "value")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in rows:
        # half-away-from-zero like Spark/DuckDB round(), NOT Python's
        # banker's round (values are positive, so half-up == half-away)
        groups.setdefault(r["event_type"], []).append(
            (r["event_id"], math.floor(r["value"] * 100.0 + 0.5))
        )
    expect = {}
    for g, vs in groups.items():
        n = len(vs)
        s = sum(v for _, v in vs)
        q = sum(v * v for _, v in vs)
        for eid, v in vs:
            num = n * v - s
            den = n * q - s * s
            if num * num > 9 * den:
                expect[eid] = (g, v, n, math.floor(abs(num) / math.sqrt(den) * 1000.0))
    got = {
        r["event_id"]: (
            r["event_type"],
            r["value_cents"],
            r["group_n"],
            r["z_milli_obs"],
        )
        for r in outliers_q(spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 0, "outlier query went vacuous"


def test_outliers_decimal_survives_past_long_range(spark):
    """r10 regression (caught by the one-decade sweep): with per-group
    n ≈ 2·10⁵ the num² term passes 2⁶³ and the old all-long comparison
    threw ARITHMETIC_OVERFLOW under the ANSI session. The operator now
    runs the comparison in DECIMAL(38,0); this test plants magnitudes
    where num² > 2⁶³ already at 4 rows (v ~ 3·10⁹ cents) and checks
    the flags and z_milli_obs against arbitrary-precision Python ints
    — if anyone reverts the promotion, this throws (ANSI) or flags
    wrong rows (non-ANSI wraparound)."""
    from pyspark.sql import functions as F

    from document_vector_indexer_spark.operators.profiling import zscore_outliers

    # 15 tightly-jittered baseline values + one far outlier: n must be
    # ≥ ~12 for any single point to reach z > 3 (max z in a sample of
    # n is (n-1)/sqrt(n)), and every row's num² exceeds 2⁶³ here
    vals = [3_000_000_000 + 7 * i - 49 for i in range(15)] + [9_500_000_000]
    df = spark.createDataFrame(
        [(i, "big", v) for i, v in enumerate(vals)],
        "event_id long, event_type string, v long",
    )
    n, s = len(vals), sum(vals)
    q = sum(v * v for v in vals)
    expect = {}
    for i, v in enumerate(vals):
        num, den = n * v - s, n * q - s * s
        assert num * num > 2**63, "test lost its overflow bite"
        if num * num > 9 * den:
            expect[i] = (v, math.floor(abs(num) / math.sqrt(den) * 1000.0))
    assert expect, "planted outlier missing"
    got = {
        r["event_id"]: (r["value_cents"], r["z_milli_obs"])
        for r in zscore_outliers(df, F.col("v"), id_col="event_id").collect()
    }
    assert got == expect


def test_outliers_plan_broadcasts_stats_only(spark):
    from document_vector_indexer_spark.queries.searchops import outliers_q

    tree = _plan_tree(spark, outliers_q(spark, SF))
    assert tree.count("BroadcastHashJoin") == 1, tree
    assert "SortMergeJoin" not in tree and "ShuffledHashJoin" not in tree, (
        f"event stream shuffled for the stats join:\n{tree}"
    )


# --- hybrid RRF -------------------------------------------------------


def test_hybrid_rrf_fuses_both_lists(spark):
    """The fused top-10 must contain at least one doc contributed by
    each retriever (rank>0 on that side), and every rrf_q must equal
    the integer recombination of the two rank columns."""
    from document_vector_indexer_spark.queries.searchops import hybrid_rrf_q

    rows = hybrid_rrf_q(spark, SF).collect()
    assert len(rows) == 10
    assert any(r["rank_lex"] > 0 for r in rows)
    assert any(r["rank_vec"] > 0 for r in rows)
    for r in rows:
        exp = (1_000_000_000 // (60 + r["rank_lex"]) if r["rank_lex"] else 0) + (
            1_000_000_000 // (60 + r["rank_vec"]) if r["rank_vec"] else 0
        )
        assert r["rrf_q"] == exp, r


def test_hybrid_rrf_no_cartesian(spark):
    """The fuse join must never be a cartesian product. (That the
    rank_a global window sits over a Limit-bounded child is enforced
    for this key — like every registered key — by the tree-aware
    registry-wide guard in test_plans.)"""
    from document_vector_indexer_spark.queries.searchops import hybrid_rrf_q

    tree = _plan_tree(spark, hybrid_rrf_q(spark, SF))
    assert "CartesianProduct" not in tree, tree


# --- group trend ------------------------------------------------------


def test_trend_matches_pure_python(spark):
    from document_vector_indexer_spark.queries.searchops import trend_q

    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", "ts", "value")
        .collect()
    )
    import datetime

    daily: dict[tuple, list] = {}
    for r in rows:
        x = (r["ts"].date() - datetime.date(1970, 1, 1)).days
        v = math.floor(r["value"] * 100.0 + 0.5)
        daily.setdefault((r["event_type"], x), []).append(v)
    pts: dict[str, list] = {}
    for (g, x), vs in daily.items():
        pts.setdefault(g, []).append((x, math.floor(sum(vs) * 1000.0 / len(vs))))
    expect = {}
    for g, xy in pts.items():
        n = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        sxx = sum(x * x for x, _ in xy)
        syy = sum(y * y for _, y in xy)
        num, den, dy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        slope = math.floor(num / den * 1e6) if den > 0 else None
        r2 = (
            math.floor(num * num / (den * dy) * 1e6)
            if den > 0 and dy > 0
            else None
        )
        expect[g] = (n, slope, r2)
    got = {
        r["event_type"]: (r["n_days"], r["slope_micro"], r["r2_ppm"])
        for r in trend_q(spark, SF).collect()
    }
    assert got == expect
    # non-vacuous: the 30-day synthetic stream yields real fits
    assert all(v[1] is not None and v[2] is not None for v in got.values())


def test_trend_plan_two_aggs_no_window_no_join(spark):
    from document_vector_indexer_spark.queries.searchops import trend_q

    tree = _plan_tree(spark, trend_q(spark, SF))
    assert "Join" not in tree, tree
    assert "Window" not in tree, tree
    assert tree.count("HashAggregate") >= 4, f"partial aggs missing:\n{tree}"


# --- bigram LM --------------------------------------------------------


def test_bigram_lm_tables_never_broadcast(spark):
    """Both lookup joins (context counts on w1, weights on the bigram
    key) must stay shuffle joins — bigram tables are corpus-sized at
    web scale. The only broadcast is the 1-row vocabulary size."""
    from document_vector_indexer_spark.queries.searchops import bigram_lm_q

    tree = _plan_tree(spark, bigram_lm_q(spark, SF))
    assert tree.count("ShuffledHashJoin") >= 2, tree
    assert tree.count("BroadcastExchange") <= 1, tree


def test_bigram_lm_orders_unigram_cannot(spark):
    """A doc of common words in a NEVER-SEEN order must score worse
    under the bigram LM than a doc that is a verbatim frequent-pattern
    repeat — the signal unigram NLL is blind to. Built on a planted
    mini-corpus where both docs share the same bag of words."""
    from document_vector_indexer_spark.operators.textanalysis import (
        bigram_logprob_scores,
    )

    base = "the fast join " * 10  # frequent pattern: 'the fast join the ...'
    shuffled = "the the fast join fast the join fast join the " * 3
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, base), (3, shuffled)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["avg_nll2"]
        for r in bigram_logprob_scores(docs).collect()
    }
    assert got[3] > got[0], got
