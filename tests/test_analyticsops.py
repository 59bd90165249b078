"""Direct tests for the event-analytics / index-build operators
(sessionize, scd2_intervals, value_histogram, build_postings,
knn_lsh_pinned) — semantic invariants + plan pins for the scale
contracts. Value-exactness vs DuckDB is covered by test_driver_parity
via the registry sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.parity_util import formatted_plan, tree_of

SF = "/root/testdata/sf0.001"


def _tree(spark, df) -> str:
    return tree_of(formatted_plan(spark, df))


# --- sessionize -------------------------------------------------------


def test_sessionize_is_nonvacuous_and_consistent(spark):
    """At the 12 h gap the sf0.001 stream must contain BOTH multi-event
    sessions and per-user splits — otherwise the green driver row would
    only prove a pass-through."""
    from document_vector_indexer_spark.operators.profiling import sessionize

    ev = spark.read.parquet(f"{SF}/events.parquet")
    s = sessionize(ev, gap_s=43_200)
    n_events = ev.count()
    agg = s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n"), (F.max("ts_us") - F.min("ts_us")).alias("dur")
    )
    n_sessions = agg.count()
    n_users = ev.select("user_id").distinct().count()
    assert n_users < n_sessions < n_events, (n_users, n_sessions, n_events)
    assert agg.filter(F.col("n") > 1).count() > 0, "no multi-event session"
    # every event lands in exactly one session; durations never negative
    assert agg.agg(F.sum("n")).first()[0] == n_events
    assert agg.filter(F.col("dur") < 0).count() == 0


def test_sessionize_matches_pure_python(spark):
    """Recompute session ids in plain Python for one mid-size user."""
    from document_vector_indexer_spark.operators.profiling import sessionize

    ev = spark.read.parquet(f"{SF}/events.parquet")
    uid = ev.groupBy("user_id").count().orderBy(F.desc("count"), "user_id").first()[0]
    rows = sorted(
        ev.filter(F.col("user_id") == uid)
        .select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"), "event_id"
        )
        .collect(),
        key=lambda r: (r.us, r.event_id),
    )
    expect, sid, prev = {}, 0, None
    for r in rows:
        if prev is None or r.us - prev > 43_200 * 1_000_000:
            sid += 1
        expect[r.event_id] = sid
        prev = r.us
    got = {
        r.event_id: r.session_id
        for r in sessionize(ev.filter(F.col("user_id") == uid), gap_s=43_200)
        .select("event_id", "session_id")
        .collect()
    }
    assert got == expect


def test_sessionize_single_raw_shuffle(spark):
    """The raw event stream shuffles exactly once (user_id) before the
    windows; the only other exchange allowed is the final presentation
    sort of the registered query."""
    from document_vector_indexer_spark.operators.profiling import sessionize

    ev = spark.read.parquet(f"{SF}/events.parquet")
    t = _tree(spark, sessionize(ev, gap_s=43_200))
    assert t.count("Exchange") == 1, t
    assert t.count("Window") == 2, t


# --- scd2 -------------------------------------------------------------


def test_scd2_interval_invariants(spark):
    """Exactly one open (is_current) interval per user; intervals chain
    half-open (valid_to = next valid_from); runs alternate attr values;
    event counts reconcile with the raw stream."""
    from document_vector_indexer_spark.operators.profiling import scd2_intervals

    ev = spark.read.parquet(f"{SF}/events.parquet")
    iv = scd2_intervals(ev).orderBy("user_id", "valid_from_us")
    rows = iv.collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert sum(r.n_events for r in rows) == ev.count()
    for u, ivs in by_user.items():
        assert sum(r.is_current for r in ivs) == 1
        assert ivs[-1].is_current == 1
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to_us == b.valid_from_us, (u, a, b)
            assert a.event_type != b.event_type, "adjacent runs must differ"


def test_scd2_single_raw_shuffle(spark):
    """The raw stream shuffles once on user_id; the run-level agg and
    the closing lead() operate on reduced frames (their exchanges carry
    runs, not events)."""
    from document_vector_indexer_spark.operators.profiling import scd2_intervals

    ev = spark.read.parquet(f"{SF}/events.parquet")
    t = _tree(spark, scd2_intervals(ev))
    # exchange 1: events->user_id; exchanges 2..3: run-level (user,run)
    # agg + back to user for lead — both over |runs|-sized frames.
    assert t.count("Exchange") <= 3, t
    assert "CartesianProduct" not in t and "Join" not in t


# --- histogram --------------------------------------------------------


def test_histogram_partitions_all_rows(spark):
    from document_vector_indexer_spark.operators.profiling import value_histogram

    ev = spark.read.parquet(f"{SF}/events.parquet")
    h = value_histogram(ev).collect()
    assert sum(r.n for r in h) == ev.count()
    for r in h:
        assert r.bin_lo_cents == r.bin * 5000
        assert r.bin_lo_cents <= r.min_cents <= r.max_cents < r.bin_lo_cents + 5000


def test_histogram_is_one_aggregation(spark):
    from document_vector_indexer_spark.operators.profiling import value_histogram

    ev = spark.read.parquet(f"{SF}/events.parquet")
    t = _tree(spark, value_histogram(ev))
    assert t.count("Exchange") == 1 and t.count("HashAggregate") == 2, t
    assert "Window" not in t and "Join" not in t


# --- postings ---------------------------------------------------------


def test_postings_heads_match_pure_python(spark):
    """Recompute df / tf_total / top-5 postings in plain Python."""
    from document_vector_indexer_spark.operators.search import build_postings

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = docs.select("doc_id", "text").collect()
    tf: dict = {}
    for r in rows:
        for w in r.text.split():
            tf.setdefault(w, {}).setdefault(r.doc_id, 0)
            tf[w][r.doc_id] += 1
    expect = {}
    for w, per in tf.items():
        head = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        expect[w] = (
            len(per),
            sum(per.values()),
            ",".join(str(d) for d, _ in head),
        )
    top = sorted(expect.items(), key=lambda kv: (-kv[1][0], kv[0]))[:100]
    got = {
        r.word: (r.df, r.tf_total, r.postings_head)
        for r in build_postings(docs, head=5, top_words=100).collect()
    }
    assert got == dict(top)


def test_postings_plan_bounds_the_collect(spark):
    """The per-word top-5 cut must plan WindowGroupLimit (partial top-k
    before the full window) and the final cut must be TakeOrdered —
    never a global sort; the shuffled payload is (word, doc_id, tf)
    triples, never text."""
    from document_vector_indexer_spark.operators.search import build_postings

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = formatted_plan(spark, build_postings(docs))
    t = tree_of(p)
    assert "WindowGroupLimit" in t, t
    assert "TakeOrderedAndProject" in t, t
    exchange_args = [
        b for b in p.split("\n\n") if b.strip().startswith("(") and "Exchange" in b.splitlines()[0]
    ]
    for blk in exchange_args:
        assert "text#" not in blk, f"corpus text crosses a shuffle:\n{blk}"


# --- knn_lsh_pinned ---------------------------------------------------


def test_knn_lsh_pinned_recall_vs_brute(spark):
    """The pinned sign-LSH tier must actually approximate: recall@10
    ≥ 0.5 vs exact brute force (measured 0.6 at sf0.001, 0.8 at
    sf0.01), while candidate generation touches well under the full
    corpus (otherwise it is brute force in disguise)."""
    from document_vector_indexer_spark.operators.dedup import embedding_lsh_blocks
    from document_vector_indexer_spark.operators.similarity import (
        knn_brute,
        knn_lsh_pinned,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") != 0)
    q = emb.filter(F.col("vec_id") == 0).select(F.lit(0).alias("qid"), "embedding")
    brute = {r.id for r in knn_brute(corpus, q, k=10).collect()}
    lsh = {r.id for r in knn_lsh_pinned(corpus, q, k=10, dim=64).collect()}
    assert len(brute & lsh) >= 5, (brute, lsh)

    qb = embedding_lsh_blocks(q, 64, id_col="qid").select("band", "bucket")
    n_cand = (
        embedding_lsh_blocks(corpus, 64)
        .join(qb, ["band", "bucket"])
        .select("vec_id")
        .distinct()
        .count()
    )
    n_corpus = corpus.count()
    assert n_cand < 0.7 * n_corpus, (n_cand, n_corpus)


def test_knn_lsh_pinned_plan_is_bucketed(spark):
    """Candidate generation is a broadcast equi-join on (band, bucket)
    int keys — the corpus never shuffles for it; no cartesian anywhere."""
    from document_vector_indexer_spark.operators.similarity import knn_lsh_pinned

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") != 0)
    q = emb.filter(F.col("vec_id") == 0).select(F.lit(0).alias("qid"), "embedding")
    t = _tree(spark, knn_lsh_pinned(corpus, q, k=10, dim=64))
    assert "BroadcastHashJoin" in t, t
    assert "CartesianProduct" not in t and "BroadcastNestedLoopJoin" not in t
    assert "SortMergeJoin" not in t, "corpus must not shuffle for candidates"


def test_lsh_band_union_sql_unchanged_semantics():
    """The r4 refactor of the q_lsh_buckets oracle generator must keep
    the band/bucket SQL identical modulo the injected WHERE clause."""
    from document_vector_indexer_spark.queries.vectorops import (
        SQL_LSH_BUCKETS,
        lsh_band_union_sql,
    )

    assert lsh_band_union_sql() + " ORDER BY vec_id, band" == SQL_LSH_BUCKETS
    assert lsh_band_union_sql("vec_id <> 0").count("WHERE vec_id <> 0") == 6


# --- mad_outliers -----------------------------------------------------


def test_mad_outliers_match_pure_python(spark):
    """Recompute median/MAD flags in plain Python (statistics.median
    uses the same interpolated convention as percentile/quantile_cont)."""
    import statistics

    from document_vector_indexer_spark.operators.profiling import mad_outliers

    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = ev.select(
        "event_id", "event_type", F.rint(F.col("value") * 100).cast("long").alias("v")
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append((r.event_id, r.v))
    expect = set()
    for t, vs in groups.items():
        med = statistics.median(v for _, v in vs)
        mad = statistics.median(abs(v - med) for _, v in vs)
        for eid, v in vs:
            if abs(v - med) * 10_000.0 > 44_478.0 * mad:
                expect.add(eid)
    got = {
        r.event_id
        for r in mad_outliers(ev, F.rint(F.col("value") * 100).cast("long")).collect()
    }
    assert got == expect and len(expect) > 0


def test_mad_outliers_stream_never_shuffles(spark):
    """Both stats frames join back as broadcasts — the event stream has
    no exchange of its own."""
    from document_vector_indexer_spark.operators.profiling import mad_outliers

    ev = spark.read.parquet(f"{SF}/events.parquet")
    t = _tree(spark, mad_outliers(ev, F.rint(F.col("value") * 100).cast("long")))
    # 3 broadcast joins: the med join appears once on the main lineage
    # and once inside the MAD-stats branch (shared subtree re-expanded)
    assert t.count("BroadcastHashJoin") >= 2, t
    assert "SortMergeJoin" not in t and "ShuffledHashJoin" not in t, t


# --- changepoint ------------------------------------------------------


def test_changepoint_matches_pure_python(spark):
    import math

    from document_vector_indexer_spark.operators.profiling import changepoint_cusum

    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = ev.select(
        "event_type",
        F.datediff(F.to_date(F.col("ts").cast("timestamp")), F.lit("1970-01-01"))
        .cast("long")
        .alias("d"),
        F.round(F.col("value") * F.lit(100.0)).cast("long").alias("v"),
    ).collect()
    daily: dict = {}
    for r in rows:
        s, c = daily.setdefault(r.event_type, {}).get(r.d, (0, 0))
        daily[r.event_type][r.d] = (s + r.v, c + 1)
    expect = {}
    for t, per in daily.items():
        ys = [
            (d, math.floor(s * 1000.0 / c)) for d, (s, c) in sorted(per.items())
        ]
        n, tot = len(ys), sum(y for _, y in ys)
        best = None
        cum = 0
        for i, (d, y) in enumerate(ys, start=1):
            cum += y
            dv = n * cum - i * tot
            key = (-abs(dv), d)
            if best is None or key < best[0]:
                after = (
                    math.floor((tot - cum) / (n - i)) if i < n else None
                )
                best = (key, (n, d, abs(dv), math.floor(cum / i), after))
        expect[t] = best[1]
    got = {
        r.event_type: (
            r.n_days,
            r.cp_day,
            r.max_absdev,
            r.mean_before_milli,
            r.mean_after_milli,
        )
        for r in changepoint_cusum(
            ev, F.round(F.col("value") * F.lit(100.0)).cast("long")
        ).collect()
    }
    assert got == expect


def test_changepoint_windows_are_calendar_bounded(spark):
    """All windows run AFTER the daily aggregation — the window input
    is the (groups x days) frame, never the raw stream (the q_win_frame
    precedent)."""
    from document_vector_indexer_spark.operators.profiling import changepoint_cusum
    from tests.parity_util import formatted_plan

    ev = spark.read.parquet(f"{SF}/events.parquet")
    p = formatted_plan(
        spark, changepoint_cusum(ev, F.round(F.col("value") * F.lit(100.0)).cast("long"))
    )
    tree = tree_of(p)
    # the first (bottom-most) exchange must feed a HashAggregate before
    # any Window node appears above it
    lines = [l.strip() for l in tree.splitlines() if l.strip()]
    first_window_depth = next(
        i for i, l in enumerate(lines) if "Window" in l and "GroupLimit" not in l
    )
    agg_positions = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    assert agg_positions and max(agg_positions) > first_window_depth, tree
