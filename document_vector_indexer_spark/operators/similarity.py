"""Similarity search over embedding columns (``array<float>``).

Three tiers, mirroring how a 100 TB deployment would stage ANN:
1. ``knn_brute`` — exact cosine top-k as composition of pure column
   exprs + TakeOrderedAndProject. O(n) per query vector, fully
   distributed, no shuffle until the final top-k merge. The baseline
   and the correctness oracle for the approximate tiers.
2. ``knn_lsh`` — MLlib BucketedRandomProjectionLSH: hash vectors into
   buckets with seeded random hyperplanes; candidate generation
   becomes an equi-join on bucket ids (linear, co-partitioned).
3. ``knn_ivf`` — IVF-style: seeded KMeans partitions the corpus into
   nlist cells; a query probes the nprobe nearest centroids and scans
   only those cells (the classic FAISS-IVF layout, done with
   DataFrames: cell assignment is a broadcast join against centroids).

The reference delegates this entirely to pgvector
(/root/reference/README.md:16; the `embedding <=> q` top-k query is
the downstream consumer's whole API) — here it is native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from document_vector_indexer_spark.functions import vector as V


def knn_brute(
    vectors: DataFrame,
    query: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "qid",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors for every row of ``query`` (small, broadcast)
    against ``vectors`` (arbitrarily large).

    Returns (query_id, id, sim, rk). Deterministic: unique id tiebreak.
    Scale: broadcast the queries, per-partition partial top-k via the
    rank window is handled by Spark's WindowExec after a single shuffle
    on query_id — with q queries the shuffle carries q*k rows per
    partition at most once AQE coalesces.
    """
    # per-ROW norms hoisted out of the per-(row, query) scoring: the
    # same bit-identical split as dedup.embedding_near_dup_pairs (r6)
    # — dot/(n_v*n_q) is the identical expression tree per value, but
    # each norm folds once per row/query instead of once per pair
    sim = (
        V.dot(F.col(vec_col), F.col("q_vec")) / (F.col("_n_v") * F.col("_n_q"))
        if metric == "cosine"
        else -V.l2_distance(F.col(vec_col), F.col("q_vec"))
    )
    norm = F.sqrt(V.dot(F.col(vec_col), F.col(vec_col)))
    q = query.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm.alias("_n_q"),
    )
    scored = (
        vectors.withColumn("_n_v", norm)
        .join(F.broadcast(q))
        .select("query_id", F.col(id_col).alias("id"), sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("long")).filter(
        F.col("rk") <= k
    )


def knn_lsh(
    vectors: DataFrame,
    query: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate kNN via BucketedRandomProjectionLSH (euclidean).

    Returns (id, dist) for the single query row. Seeded hyperplanes ->
    deterministic buckets; still rows-only checked (approximation
    contract, not value equality).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = vectors.select(
        F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(vecs)
    q_row = query.select(array_to_vector(F.col(vec_col)).alias("features")).head()
    if q_row is None:
        raise ValueError(
            "knn_lsh: query DataFrame is empty — need exactly one query vector"
        )
    return model.approxNearestNeighbors(vecs, q_row.features, k).select(
        "id", F.col("distCol").alias("dist")
    )


def train_ivf_centroids(
    vectors: DataFrame,
    nlist: int,
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Seeded KMeans centroids for IVF cell assignment. Returns the
    fitted model (centroids are tiny: nlist x dim — broadcastable)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.select(array_to_vector(F.col(vec_col)).alias("features"))
    return KMeans(k=nlist, seed=seed, featuresCol="features").fit(feat)


def _centroid_literals(centroids: list[tuple[int, list[float]]]) -> "F.Column":
    """``array<struct<cell:int, centroid:array<double>>>`` literal column
    from (cell, vector) pairs — nlist x dim scalars pinned into the
    plan, same trick as dedup.lsh_hyperplanes literal mirroring."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cell)).alias("cell"),
                F.array(*[F.lit(float(x)) for x in vec])
                .cast("array<double>")
                .alias("centroid"),
            )
            for cell, vec in centroids
        ]
    )


def ivf_cell_distances(vec: "F.Column", cent_arr: "F.Column") -> "F.Column":
    """Per-centroid ``struct(d, cell)`` distances — pure column math, so
    argmin/top-n over it is map-side (struct ordering = (d, cell),
    which both deduplicates exact ties deterministically and mirrors a
    SQL ``ORDER BY d, cell``)."""
    return F.transform(
        cent_arr,
        lambda c: F.struct(
            V.l2_distance(vec, c["centroid"]).alias("d"),
            c["cell"].alias("cell"),
        ),
    )


def knn_ivf_pinned(
    vectors: DataFrame,
    query: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "qid",
) -> DataFrame:
    """IVF kNN with caller-pinned centroid literals — fully
    deterministic and exactly SQL-expressible (the oracle mirrors the
    same literals), unlike the KMeans-trained :func:`knn_ivf`.

    Scale shape, better than the trained variant's windowed argmin:
    - cell assignment is MAP-SIDE ``array_min`` over the nlist
      centroid literals — zero shuffle, no centroid join, no
      per-vector window (at 100 TB this is write-time partitioning:
      the assigned frame would persist clustered by cell);
    - query probing sorts the same per-centroid distance array and
      explodes the first ``nprobe`` cells (queries are small);
    - candidate scan is one equi-join on cell against the broadcast
      probe list, then a per-query top-k window — the scan touches
      ~nprobe/nlist of the corpus, the FAISS-IVF contract.
    """
    cent_arr = _centroid_literals(centroids)
    assigned = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col),
        F.array_min(ivf_cell_distances(F.col(vec_col), cent_arr))["cell"].alias(
            "cell"
        ),
    )
    probes = query.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            F.slice(
                F.array_sort(ivf_cell_distances(F.col(vec_col), cent_arr)),
                1,
                nprobe,
            )["cell"]
        ).alias("cell"),
    )
    # hoisted per-row/per-probe norms (knn_brute r6 note): same values
    scored = (
        assigned.withColumn(
            "_n_v", F.sqrt(V.dot(F.col(vec_col), F.col(vec_col)))
        )
        .join(
            F.broadcast(
                probes.withColumn(
                    "_n_q", F.sqrt(V.dot(F.col("q_vec"), F.col("q_vec")))
                )
            ),
            "cell",
        )
        .select(
            "query_id",
            "id",
            (
                V.dot(F.col(vec_col), F.col("q_vec"))
                / (F.col("_n_v") * F.col("_n_q"))
            ).alias("sim"),
        )
    )
    w_top = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("id"))
    return scored.withColumn("rk", F.row_number().over(w_top).cast("long")).filter(
        F.col("rk") <= k
    )


def knn_ivf(
    vectors: DataFrame,
    query: DataFrame,
    k: int,
    nlist: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "qid",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate kNN with KMeans-trained cells: train the
    centroids (driver receives nlist x dim floats — tiny), then run
    the exact same physical shape as :func:`knn_ivf_pinned` — map-side
    ``array_min`` cell assignment over the centroid literals, probe
    explode, one cell equi-join, per-query top-k.

    (An earlier revision assigned cells with a per-vector window over
    the nlist-exploded corpus — an extra shuffle the literal form
    doesn't need; the two variants now share one code path and the
    trained one differs only in where the centroids come from.)

    At 100 TB: cell assignment is write-time work; the per-query scan
    touches nprobe/nlist of the data — the same contract as FAISS IVF.
    """
    model = train_ivf_centroids(vectors, nlist, vec_col, seed)
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return knn_ivf_pinned(
        vectors,
        query,
        centroids,
        k=k,
        nprobe=nprobe,
        vec_col=vec_col,
        id_col=id_col,
        query_id_col=query_id_col,
    )


def knn_lsh_pinned(
    vectors: DataFrame,
    query: DataFrame,
    k: int,
    dim: int,
    bands: int = 6,
    bits: int = 4,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "qid",
) -> DataFrame:
    """Sign-LSH approximate kNN with PINNED seeded hyperplanes
    (``dedup.lsh_hyperplanes`` — exact ±1 add/subtract projections),
    fully deterministic and SQL-mirrorable: the oracle carries the
    identical hyperplane literals, so this tier is value-checked, not
    just rows-only — the same upgrade ``knn_ivf_pinned`` gave the IVF
    tier (MLlib's ``knn_lsh`` stays as the model-backed variant; its
    internal hyperplanes are not mirrorable).

    Candidate generation: corpus and queries band into (band, bucket)
    codes MAP-SIDE (``dedup.embedding_lsh_blocks``); candidates are
    the corpus rows sharing ANY band's bucket with a query — one
    BROADCAST equi-join on two int keys (queries are small; the
    corpus never shuffles for candidate generation). A (query, id)
    pair matching in several bands dedups through max(sim) — sim is
    the same deterministic expression on the same inputs, so max
    just collapses bit-identical duplicates. Exact cosine rerank +
    per-query top-k window ends the plan; the window input is
    candidates only (bucket-bounded, ~P[band match] x corpus — the
    recall/cost dial is (bands, bits), see embedding_lsh_blocks'
    scale note).
    """
    from document_vector_indexer_spark.operators.dedup import embedding_lsh_blocks

    cb = embedding_lsh_blocks(
        vectors, dim, vec_col, id_col, bands=bands, bits=bits, seed=seed
    )
    qb = embedding_lsh_blocks(
        query, dim, vec_col, query_id_col, bands=bands, bits=bits, seed=seed
    ).select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "band",
        "bucket",
    )
    # hoisted per-row/per-query norms (knn_brute r6 note): same values
    cand = (
        cb.withColumn("_n_v", F.sqrt(V.dot(F.col(vec_col), F.col(vec_col))))
        .join(
            F.broadcast(
                qb.withColumn(
                    "_n_q", F.sqrt(V.dot(F.col("q_vec"), F.col("q_vec")))
                )
            ),
            ["band", "bucket"],
        )
        .select(
            "query_id",
            F.col(id_col).alias("id"),
            (
                V.dot(F.col(vec_col), F.col("q_vec"))
                / (F.col("_n_v") * F.col("_n_q"))
            ).alias("sim"),
        )
    )
    uniq = cand.groupBy("query_id", "id").agg(F.max("sim").alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("id"))
    return uniq.withColumn("rk", F.row_number().over(w).cast("long")).filter(
        F.col("rk") <= k
    )


def _pq_codebook_literal(codebook: list[list[float]]) -> "F.Column":
    """ksub full-dim vectors as a nested array<array<double>> literal;
    codeword j of subspace s is the s-th dsub-slice of codebook[j]."""
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in cw]) for cw in codebook]
    )


def pq_sub_sqdist_fp(
    vec: "F.Column", cb_lit: "F.Column", s: "F.Column", j: "F.Column", dsub: int
) -> "F.Column":
    """floor(1e6 * squared-L2(subvector s of vec, subvector s of
    codeword j)) as a long — the fixed-point distance both the encode
    argmin and the ADC sum run on. Quantizing BEFORE any accumulation
    makes every downstream comparison and sum pure-integer, hence
    bit-identical on any engine and partitioning (the q_vec_centroid
    precedent: floats only inside one left-to-right fold)."""
    a = F.slice(vec, s * dsub + 1, dsub)
    b = F.slice(F.element_at(cb_lit, j + 1), s * dsub + 1, dsub)
    d = F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.floor(d * 1_000_000)


def knn_pq_pinned(
    vectors: DataFrame,
    query: DataFrame,
    codebook: list[list[float]],
    m: int,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "qid",
) -> DataFrame:
    """Product-quantization kNN (Jégou et al., asymmetric distance) with
    caller-PINNED codebooks — the fourth ANN tier after brute/LSH/IVF,
    and like the pinned IVF/LSH variants fully deterministic and
    exactly SQL-expressible.

    ``codebook``: ksub full-dim vectors; subspace s of codeword j is
    the s-th slice. Corpus rows ENCODE map-side (per subspace, argmin
    of the fixed-point subvector distance over ksub codewords — zero
    shuffle; at 100 TB the uint8 codes are write-time artifacts ~m
    bytes/vector, the whole point of PQ: a 768-dim float corpus scans
    as 8-96 bytes/row). Queries build their m x ksub ADC lookup table
    the same way; scoring is one BROADCAST join (queries small) and a
    per-subspace table lookup summed in pure longs; per-query top-k
    window ends the plan. Approximation error comes only from the
    quantization itself — ranking given the codes is exact.
    """
    dim = len(codebook[0])
    ksub = len(codebook)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    dsub = dim // m
    cb = _pq_codebook_literal(codebook)
    subspaces = F.sequence(F.lit(0), F.lit(m - 1))
    codewords = F.sequence(F.lit(0), F.lit(ksub - 1))

    def encode(vec: "F.Column") -> "F.Column":
        return F.transform(
            subspaces,
            lambda s: F.array_min(
                F.transform(
                    codewords,
                    lambda j: F.struct(
                        pq_sub_sqdist_fp(vec, cb, s, j, dsub).alias("d"),
                        j.cast("int").alias("j"),
                    ),
                )
            )["j"],
        )

    coded = vectors.select(
        F.col(id_col).alias("id"), encode(F.col(vec_col)).alias("code")
    )
    dtab = F.transform(
        subspaces,
        lambda s: F.transform(
            codewords, lambda j: pq_sub_sqdist_fp(F.col(vec_col), cb, s, j, dsub)
        ),
    )
    q = query.select(F.col(query_id_col).alias("query_id"), dtab.alias("dtab"))
    scored = coded.join(F.broadcast(q)).select(
        "query_id",
        "id",
        F.aggregate(
            subspaces,
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.element_at(
                F.element_at(F.col("dtab"), s + 1),
                F.element_at(F.col("code"), s + 1) + 1,
            ),
        ).alias("adc_fp"),
    )
    w = Window.partitionBy("query_id").orderBy("adc_fp", "id")
    return scored.withColumn("rk", F.row_number().over(w).cast("long")).filter(
        F.col("rk") <= k
    )
