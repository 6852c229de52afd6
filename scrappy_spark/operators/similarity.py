"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
approximate path for scale. Dot products run as SQL higher-order
functions (``zip_with`` + ``aggregate``) — JVM-side, no Python in the
loop; norms are precomputed once per side so the join only multiplies.

Scale notes: brute force is a broadcast of the (small) query side
against a scan of the corpus — O(n·k_queries) with no shuffle of the
corpus. The LSH path buckets by deterministic hyperplane signs so each
probe touches only its bucket (IVF-style); recall/cost trades off via
``n_planes``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (stays in codegen, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int = 4,
) -> DataFrame:
    """Exact brute-force top-k neighbours per query vector.

    ``queries``: (query_id, embedding). Broadcast the query side, scan
    the corpus once, window per query for the top-k. Deterministic:
    rounded similarity desc, then corpus id.
    """
    from .joins import topk_per_group

    q = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
    )
    scored = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(q).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), round_digits).alias("cos_sim"),
    )
    return topk_per_group(
        scored, [query_id_col], [F.desc("cos_sim"), F.asc(id_col)], k
    )


def label_centroids(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label", round_digits: int = 6
) -> DataFrame:
    """Element-wise mean embedding per label (IVF coarse quantizer /
    per-class prototype). posexplode → (label, pos) partial-agg mean —
    shuffle volume is n_labels × dim, independent of corpus size."""
    exploded = df.select(label_col, F.posexplode(vec_col).alias("pos", "v"))
    return (
        exploded.groupBy(label_col, "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), round_digits).alias("centroid_val"))
        .select(label_col, (F.col("pos") + 1).cast("long").alias("pos"), "centroid_val")
    )


def lsh_bucket(vec: Column, n_planes: int = 8, dim: int = 64, seed: int = 7) -> Column:
    """Deterministic random-hyperplane LSH bucket id.

    Plane p's component for dimension d is ±1 derived from md5(seed,p,d)
    parity — reproducible everywhere, no stored model. Bucket id packs
    the sign bits of the ``n_planes`` projections.
    """
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.expr(
                    "transform(sequence(0, {n}), d -> "
                    "CASE WHEN conv(substring(md5(concat('{s}:{p}:', d)), 1, 4), 16, 10) % 2 = 0 "
                    "THEN 1.0 ELSE -1.0 END)".format(n=dim - 1, s=seed, p=p)
                ),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    label_col: str = "label",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer
    (``centroids``: label → centroid array) assigns every corpus vector
    to its nearest cell ONCE; each query probes only its ``n_probe``
    nearest cells. Search cost drops by ≈ n_cells/n_probe vs brute
    force; recall is tunable via n_probe.

    ``centroids`` must be (label, centroid:array<double>) — e.g. from
    ``label_centroids`` pivoted, or a KMeans model's centers.
    """
    from .joins import topk_per_group

    cents = F.broadcast(centroids.select(label_col, F.col("centroid").alias("__c")))

    def assign(df: DataFrame, idc: str) -> DataFrame:
        scored = df.crossJoin(cents).withColumn(
            "__d", cosine(F.col(vec_col), F.col("__c"))
        )
        w_cols = [F.desc("__d"), F.asc(label_col)]
        return topk_per_group(scored.drop("__c"), [idc], w_cols, 1).drop("__d")

    corpus_cells = assign(corpus.select(id_col, vec_col), id_col).withColumnRenamed(
        label_col, "__cell"
    )
    q_scored = queries.crossJoin(cents).withColumn(
        "__d", cosine(F.col(vec_col), F.col("__c"))
    )
    q_cells = topk_per_group(
        q_scored.drop("__c"), [query_id_col], [F.desc("__d"), F.asc(label_col)], n_probe
    ).select(query_id_col, F.col(vec_col).alias("__qvec"), F.col(label_col).alias("__cell"))

    scored = corpus_cells.join(F.broadcast(q_cells), "__cell").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 4).alias("cos_sim"),
    )
    return topk_per_group(scored, [query_id_col], [F.desc("cos_sim"), F.asc(id_col)], k)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: join query and corpus on LSH bucket, exact
    cosine within the bucket only. Same output shape as cosine_topk;
    recall < 1 by construction (tests compare overlap, not equality)."""
    from .joins import topk_per_group

    cb = corpus.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), n_planes, dim).alias("bkt")
    )
    qb = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            lsh_bucket(F.col(vec_col), n_planes, dim).alias("bkt"),
        )
    )
    scored = cb.join(qb, "bkt").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 4).alias("cos_sim"),
    )
    return topk_per_group(scored, [query_id_col], [F.desc("cos_sim"), F.asc(id_col)], k)
