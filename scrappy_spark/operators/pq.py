"""Product quantization (PQ) for approximate nearest-neighbor search.

PQ (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search", public TPAMI paper) is the standard memory-scaling trick for
billion-vector ANN (FAISS's IVFPQ): split each d-dim vector into ``m``
subvectors, learn a tiny ``ksub``-centroid codebook per subspace, and
store each vector as ``m`` small integer codes. Here: 64 float dims →
8 codes ⇒ ~32× memory compression, and search never touches the
original vectors.

Engine spelling, scale-first:

- ``pq_train``: m seeded MLlib KMeans fits over subvector frames; the
  codebook is m·ksub rows — broadcast-sized by construction.
- ``pq_encode``: one explode (m rows/vector) + broadcast codebook join
  + min-struct argmin + one groupBy back to a code array per vector.
  Ties break deterministically on (distance, code).
- ``pq_search`` (asymmetric distance, ADC): per query, the partial
  inner products against every codebook centroid form an m·ksub lookup
  table (built on the broadcast codebook — tiny); corpus codes explode
  to (id, subspace, code), join the broadcast tables, and one sum-agg
  per (query, doc) scores EVERY doc without reading any embedding.
  Shuffle is m small rows per doc; top-k via the shared
  topk_per_group.

Approximation contract: scores are inner products of the QUANTIZED
corpus vector with the exact query — recall is tested against brute
force (overlap, not equality), like the LSH/IVF paths.

Reference parity: none — the reference has no vector search at all;
this deepens the similarity-search extension family
(brute-force → LSH → IVF → PQ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: default geometry for the 64-d fixture embeddings: 16 subspaces of 4
#: dims, 32 centroids each → 16× compression. The fixture vectors are
#: hash-projections (near-random — PQ's worst case, no cluster
#: structure to exploit); measured top-10 recall vs brute force is
#: ~0.6 there, with self-retrieval always intact. Real embedding
#: manifolds quantize far better at the same geometry.
PQ_M = 16
PQ_KSUB = 32


def _subvec(vec, m: int, dim: int, j: int):
    d = dim // m
    return F.slice(vec, j * d + 1, d)


def pq_train(
    corpus: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Learn per-subspace codebooks; returns (subspace, code, centroid).

    m separate KMeans fits over n-row subvector frames; each fit's
    model is tiny and the union of all codebooks is m·ksub rows. On a
    real cluster one would fit on a sample — the codebook quality
    needs thousands of points per centroid, not the full corpus.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    spark = corpus.sparkSession
    books = []
    for j in range(m):
        sub = corpus.select(
            array_to_vector(_subvec(F.col(vec_col), m, dim, j).cast("array<double>")).alias("__v")
        )
        km = KMeans(k=ksub, seed=seed + j, featuresCol="__v", predictionCol="__c")
        model = km.fit(sub)
        rows = [(j, c, [float(x) for x in ctr]) for c, ctr in enumerate(model.clusterCenters())]
        books.append(
            spark.createDataFrame(rows, "subspace int, code int, centroid array<double>")
        )
    out = books[0]
    for b in books[1:]:
        out = out.unionByName(b)
    return out


def _sq_l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    m: int = PQ_M,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes: array<int>) — each vector reduced to m codes."""
    subs = corpus.select(
        id_col,
        F.posexplode(
            F.array(*[_subvec(F.col(vec_col), m, dim, j).cast("array<double>") for j in range(m)])
        ).alias("subspace", "__sub"),
    )
    scored = subs.join(F.broadcast(codebook), "subspace").select(
        id_col,
        "subspace",
        F.struct(_sq_l2(F.col("__sub"), F.col("centroid")).alias("d"), F.col("code").alias("c")).alias("__dc"),
    )
    best = scored.groupBy(id_col, "subspace").agg(F.min("__dc")["c"].alias("code"))
    return (
        best.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("subspace", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
    )


def pq_search(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = PQ_M,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k: score every encoded doc against every query from the
    m·ksub partial-product tables alone. Output (query_id, id, score)
    with deterministic (−score, id) ranking."""
    from .joins import topk_per_group

    qtab = F.broadcast(
        queries.crossJoin(F.broadcast(codebook)).select(
            query_id_col,
            "subspace",
            "code",
            _dot(_subvec(F.col(vec_col), m, dim, F.col("subspace")), F.col("centroid")).alias("__p"),
        )
    )
    exploded = codes.select(
        id_col, F.posexplode(F.col("codes")).alias("subspace", "code")
    )
    scored = (
        exploded.join(qtab, ["subspace", "code"])
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("__p"), 4).alias("score"))
    )
    return topk_per_group(scored, [query_id_col], [F.desc("score"), F.asc(id_col)], k)
