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


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    codes_col: str = "codes",
) -> DataFrame:
    """Per-vector int8 scalar quantization: 4× smaller embedding
    storage, the standard trade for 100 TB vector corpora.

    Each vector maps to codes = round((x − min) / scale) ∈ [0, 255]
    with scale = (max − min)/255 kept per row, so dequantization is
    x̂ = min + code·scale. Pure column expressions (array_min/max +
    transform), scan-only, zero shuffle; constant vectors (range 0)
    quantize to all-zero codes. Adds ``codes_col`` (array<int>),
    ``q_min`` and ``q_scale``; keeps original columns for error
    auditing downstream."""
    x = F.col(vec_col)
    vmin = F.array_min(x).cast("double")
    rng = F.array_max(x).cast("double") - vmin
    scale = rng / F.lit(255.0)
    codes = F.when(
        rng == 0.0,
        F.transform(x, lambda _: F.lit(0)),
    ).otherwise(
        F.transform(x, lambda v: F.round((v.cast("double") - vmin) / scale).cast("int"))
    )
    return (
        df.withColumn("q_min", vmin)
        .withColumn("q_scale", scale)
        .withColumn(codes_col, codes)
    )


def dequantize_int8(
    df: DataFrame, codes_col: str = "codes", out_col: str = "dequantized"
) -> DataFrame:
    """Inverse of ``quantize_int8`` using the per-row (q_min, q_scale)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(codes_col),
            lambda c: F.col("q_min") + c.cast("double") * F.col("q_scale"),
        ),
    )


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

    # norms hoisted out of the crossJoin (r14): zip_with/aggregate are
    # interpreted per element, so cosine's two norms otherwise
    # re-evaluate once per (corpus, query) PAIR — n_queries× per corpus
    # row and n_corpus× per query. Same expressions, evaluated once per
    # side; dot/(‖v‖·‖q‖) multiplies in the same order as cosine(), so
    # the rounded score is bit-identical.
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            norm(F.col(vec_col)).alias("__qn"),
        )
    )
    scored = corpus.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__vn")
    ).crossJoin(q).select(
        query_id_col,
        id_col,
        F.round(
            dot(F.col(vec_col), F.col("__qvec")) / (F.col("__vn") * F.col("__qn")),
            round_digits,
        ).alias("cos_sim"),
    )
    return topk_per_group(
        scored, [query_id_col], [F.desc("cos_sim"), F.asc(id_col)], k
    )


def label_centroids(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label", round_digits: int = 6
) -> DataFrame:
    """Element-wise mean embedding per label (IVF coarse quantizer /
    per-class prototype). posexplode → (label, pos) partial-agg mean —
    shuffle volume is n_labels × dim, independent of corpus size.

    posexplode_OUTER + null filter on the GENERATED column: the plain
    form makes Catalyst infer a size(vec)>0 guard that composition can
    push below another operator's round-robin exchange (it surfaced
    under ivf_pq_search's encode repartition) — the generate-filter-
    pushdown rule, ARCHITECTURE.md."""
    exploded = df.select(
        label_col, F.posexplode_outer(vec_col).alias("pos", "v")
    ).filter(F.col("pos").isNotNull())
    return (
        exploded.groupBy(label_col, "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), round_digits).alias("centroid_val"))
        .select(label_col, (F.col("pos") + 1).cast("long").alias("pos"), "centroid_val")
    )


def _plane_signs(seed: int, p: int, dim: int) -> list[float]:
    """±1 components of hyperplane p — md5(seed:p:d) parity, identical
    to the in-expression derivation so both lsh_bucket paths agree."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:4], 16) % 2 == 0
        else -1.0
        for d in range(dim)
    ]


def lsh_bucket(vec: Column, n_planes: int = 8, dim: int | None = None, seed: int = 7) -> Column:
    """Deterministic random-hyperplane LSH bucket id.

    Plane p's component for dimension d is ±1 derived from md5(seed,p,d)
    parity — reproducible everywhere, no stored model. Bucket id packs
    the sign bits of the ``n_planes`` projections.

    Two paths, same buckets:
    - ``dim`` given: planes are embedded as LITERAL arrays (zero per-row
      hashing — the planes are row-independent, so deriving them per row
      wastes n_planes·dim hashes per vector), plus a runtime
      ``assert_true(size(vec) == dim)`` guard. A silent mismatch would
      null-pad ``zip_with``, NULL the projection, and collapse every
      such vector into one bucket (degraded recall + a quadratic bucket
      join) — so mismatches fail loudly instead.
    - ``dim=None``: plane length follows each vector's own ``size(vec)``
      — robust for mixed-dimension columns, at per-row hashing cost.
    """
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        if dim is not None:
            signs = F.array(*[F.lit(s) for s in _plane_signs(seed, p, dim)])
        else:
            prefix = f"{seed}:{p}:"
            signs = F.transform(
                F.sequence(F.lit(0), F.size(vec) - F.lit(1)),
                lambda d: F.when(
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit(prefix), d.cast("string"))), 1, 4),
                        16,
                        10,
                    ).cast("long")
                    % 2
                    == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            )
        proj = F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    if dim is not None:
        guard = F.assert_true(
            F.size(vec) == F.lit(dim), F.lit(f"lsh_bucket: embedding length != dim={dim}")
        )
        bucket = F.when(guard.isNull(), bucket)
    return bucket


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 16,
    seed: int = 7,
    round_digits: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by ANN cells (multi-table
    hyperplane LSH) — the block key that survives a 100× scale-up, unlike
    a low-cardinality label (O(n²/n_labels) within block).

    Candidate generation: each vector lands in one bucket per table
    (``n_tables`` independent plane sets); pairs = equi-join on
    (table, bucket), deduped, then exact cosine on the candidates only.
    Two vectors at angle θ collide in a table with prob (1−θ/π)^n_planes
    and are found with prob 1−(1−p)^n_tables: at cos ≥ 0.9, 8 planes ×
    16 tables gives ≈ 0.996 recall while comparing ≈ n²·16/2⁸ pairs —
    16× fewer than all-pairs, and the ratio improves with more planes as
    the corpus grows. Approximate by construction → rows-only contract;
    recall is pinned by tests against the brute-force ground truth.

    ``dim=None`` (default) probes the first row's vector length and
    takes the literal-planes fast path — otherwise every row would
    re-derive n_tables·n_planes·dim row-independent plane constants
    (8·16·64 ≈ 8k hashes/row at the defaults). The embedded runtime
    guard still fails loudly on a mixed-dimension column; pass an
    explicit ``dim`` to skip the probe job.
    """
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("n")).first()
        if first is not None:
            dim = first["n"]
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                lsh_bucket(F.col(vec_col), n_planes, dim=dim, seed=seed + t).alias("bkt"),
            )
            for t in range(n_tables)
        ]
    )
    bucketed = (
        df.select(F.col(id_col), F.explode(tables).alias("tb"))
        .select(id_col, F.col("tb.t").alias("t"), F.col("tb.bkt").alias("bkt"))
    )
    a = bucketed.select(F.col(id_col).alias("id_a"), "t", "bkt")
    b = bucketed.select(F.col(id_col).alias("id_b"), "t", "bkt")
    cand = (
        a.join(b, on=["t", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), round_digits).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


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

    # norms hoisted out of the assignment crossJoins (r14, same
    # rationale as cosine_topk above): the centroid norm otherwise
    # re-evaluates per corpus row and the vector norm per cell.
    cents = F.broadcast(
        centroids.select(
            label_col,
            F.col("centroid").alias("__c"),
            norm(F.col("centroid")).alias("__cn"),
        )
    )

    def assign(df: DataFrame, idc: str) -> DataFrame:
        scored = df.withColumn("__vn", norm(F.col(vec_col))).crossJoin(cents).withColumn(
            "__d", dot(F.col(vec_col), F.col("__c")) / (F.col("__vn") * F.col("__cn"))
        )
        w_cols = [F.desc("__d"), F.asc(label_col)]
        return (
            topk_per_group(scored.drop("__c"), [idc], w_cols, 1)
            .drop("__d", "__vn", "__cn")
        )

    corpus_cells = assign(corpus.select(id_col, vec_col), id_col).withColumnRenamed(
        label_col, "__cell"
    )
    q_scored = queries.withColumn("__vn", norm(F.col(vec_col))).crossJoin(cents).withColumn(
        "__d", dot(F.col(vec_col), F.col("__c")) / (F.col("__vn") * F.col("__cn"))
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


def semantic_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
    round_digits: int = 4,
) -> DataFrame:
    """Cross-table semantic contamination check: for every training
    vector, its single nearest benchmark vector by exact cosine, plus a
    0/1 flag at ``threshold``.

    The n-gram `decontaminate` (operators.curation) catches verbatim
    leaks; this catches paraphrases that share an embedding.

    Shape: benchmark side broadcast (benchmarks are dim-table sized
    next to a training corpus), one corpus scan, and the per-train
    argmax is a groupBy max over a (cos, bench_id) struct — partial
    aggregation collapses each train vector's candidates map-side, so
    the shuffle carries one row per train vector, NOT the n_train ×
    n_bench score matrix a window-rank formulation would move. Ties
    break to the larger bench id (struct ordering), so output is
    deterministic. When the bench side outgrows a broadcast, use
    ``semantic_decontaminate_ann`` (bucket join, never all-pairs).
    """
    # Norms precomputed per SIDE, not per pair: the naive
    # cosine(a, b) inside the cross join recomputes |a| and |b| for
    # every pair (3 dot products instead of 1 — measured 3× slower at
    # sf0.1). Same expression on the same operands, so the resulting
    # float is bit-identical to the inline formulation.
    b = F.broadcast(
        bench.select(
            F.col(id_col).alias("__bid"),
            F.col(vec_col).alias("__bvec"),
            norm(F.col(vec_col)).alias("__bnorm"),
        )
    )
    t = train.select(
        id_col, vec_col, norm(F.col(vec_col)).alias("__tnorm")
    )
    # Degenerate pairs — zero-norm vectors (ANSI division error) or NaN
    # components — get cosine NULL, not NaN: NULL is the one "undefined"
    # value an Arrow-batched kernel can also emit (pandas→Arrow coerces
    # NaN to null), so the BLAS twin can match bit-for-bit. NULL sorts
    # FIRST in the struct max, so a degenerate bench vector never beats
    # a defined cosine; an all-undefined train row deterministically
    # reports the largest bench id and contaminated=1 (can't be proven
    # clean — flag it for audit rather than dropping or crashing).
    den = F.col("__tnorm") * F.col("__bnorm")
    null_d = F.lit(None).cast("double")
    scored = t.crossJoin(b).select(
        id_col,
        F.round(
            F.nanvl(
                F.when(den == 0, null_d).otherwise(
                    dot(F.col(vec_col), F.col("__bvec")) / den
                ),
                null_d,
            ),
            round_digits,
        ).alias("__cos"),
        F.col("__bid"),
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct("__cos", "__bid")).alias("__best")
    )
    return best.select(
        id_col,
        F.col("__best.__bid").alias(bench_id_col),
        F.col("__best.__cos").alias("cos_sim"),
        F.when(F.col("__best.__cos").isNull(), F.lit(1))
        .otherwise((F.col("__best.__cos") >= F.lit(threshold)).cast("long"))
        .alias("contaminated"),
    )


def semantic_decontaminate_blas(
    train: DataFrame,
    bench: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
    round_digits: int = 4,
) -> DataFrame:
    """Same contract and semantics as ``semantic_decontaminate`` —
    per-train nearest benchmark vector by exact cosine, ties to the
    larger bench id — computed as an Arrow-batched matrix product.

    Why a Python kernel here, against the engine's UDFs-last rule:
    Spark's higher-order functions (``zip_with``/``aggregate``) are
    NOT whole-stage-codegen'd — each element multiplies through an
    interpreted lambda, and an unrolled 64-term expression is worse
    (codegen blowup; both measured). A BLAS matmul does the n_train ×
    n_bench × dim multiply-adds vectorized: ~3× faster at sf0.1 and
    the gap grows with dim. The benchmark matrix rides an explicit
    broadcast variable (dim-table sized, same assumption as the
    column-expression operator); train vectors stream through
    ``mapInPandas`` one Arrow batch at a time — one corpus scan, no
    shuffle, executor memory bounded by batch × bench matrix.

    Equivalence caveat: the matmul accumulates the dot product in a
    different order (and possibly FMA-fused) than the column
    expression's element-by-element sum, so the unrounded cosines can
    differ in the last ulp. Rounding is HALF_UP on both sides, but a
    last-ulp difference that straddles an exact .5 rounding boundary
    could round differently — equivalence with
    ``semantic_decontaminate`` is therefore empirical (held across all
    fixture seeds; see test_similarity's multi-seed equivalence test),
    not guaranteed bit-exact on adversarial boundary values.
    """
    import numpy as np

    rows = bench.select(id_col, vec_col).collect()  # dim-table sized side
    if not rows:
        raise ValueError("semantic_decontaminate_blas: empty benchmark side")
    bids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    # descending bid order: np.argmax takes the FIRST max, which then
    # is the LARGEST bid among cosine ties — matching the struct-max
    # tie-break of the column-expression operator
    order = np.argsort(-bids)
    bids_d, mat_d = bids[order], mat[order]
    bnorms = np.linalg.norm(mat_d, axis=1)
    bc = train.sparkSession.sparkContext.broadcast((bids_d, mat_d, bnorms))
    schema = f"{id_col} long, {bench_id_col} long, cos_sim double, contaminated long"

    def kernel(batches):
        import pandas as pd

        bids_b, mat_b, bnorms_b = bc.value
        scale = 10.0**round_digits

        def round_half_up(a: np.ndarray) -> np.ndarray:
            # Spark F.round and DuckDB round() are HALF_UP (away from
            # zero); np.round is banker's half-even, which disagrees on
            # boundary values (np.round(0.00025, 4) = 0.0002 vs 0.0003)
            return np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            tnorm = np.linalg.norm(x, axis=1)
            with np.errstate(invalid="ignore", divide="ignore"):
                sims = round_half_up(
                    (x @ mat_b.T) / (tnorm[:, None] * bnorms_b[None, :])
                )
            # Undefined cosines (zero norm → 0/0, NaN components) must
            # never outrank a defined one (plain argmax treats NaN as
            # max): mask to -inf, so an all-undefined row falls to
            # index 0 = largest bid — the same pick as the column twin,
            # where NULL sorts first in the struct max and bid breaks
            # the all-NULL tie.
            defined = ~np.isnan(sims)
            j = np.argmax(np.where(defined, sims, -np.inf), axis=1)
            best = sims[np.arange(len(j)), j]
            # NaN best → cos_sim NULL on the wire (pandas→Arrow coerces
            # NaN to null — exactly the column twin's NULL) and
            # contaminated=1: undefined can't be proven clean.
            flag = (best >= threshold) | np.isnan(best)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    bench_id_col: bids_b[j],
                    "cos_sim": best,
                    "contaminated": flag.astype("int64"),
                }
            )

    return train.select(id_col, vec_col).mapInPandas(kernel, schema=schema)


def semantic_decontaminate_ann(
    train: DataFrame,
    bench: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Bucket-joined variant for bench sets too large to broadcast:
    both sides LSH-bucketed, candidates limited to shared buckets, so
    the score matrix is n_train × (bench per bucket) instead of
    n_train × n_bench. Misses cross-bucket matches (recall measured in
    tests against the exact operator); train vectors with NO same-
    bucket bench candidate surface with bench_id NULL / cos_sim NULL /
    contaminated 0 rather than silently disappearing."""
    tb = train.select(
        id_col, vec_col, lsh_bucket(F.col(vec_col), n_planes, dim).alias("bkt")
    )
    bb = bench.select(
        F.col(id_col).alias("__bid"),
        F.col(vec_col).alias("__bvec"),
        lsh_bucket(F.col(vec_col), n_planes, dim).alias("bkt"),
    )
    scored = tb.join(bb, "bkt").select(
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__bvec")), 4).alias("__cos"),
        F.col("__bid"),
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct("__cos", "__bid")).alias("__best")
    )
    return (
        tb.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.col("__best.__bid").alias(bench_id_col),
            F.col("__best.__cos").alias("cos_sim"),
            F.coalesce(
                (F.col("__best.__cos") >= F.lit(threshold)).cast("long"),
                F.lit(0),
            ).alias("contaminated"),
        )
    )


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "jl",
) -> DataFrame:
    """Johnson–Lindenstrauss sign projection: reduce ``dim``-d vectors
    to ``out_dim`` components y_j = Σ_i x_i·s_ij / √k with s_ij ∈ {±1}
    (Achlioptas' database-friendly JL variant — sign matrices preserve
    pairwise distances/cosines within the JL distortion bound, no
    Gaussian sampling needed). The cheap pre-step before ANN/clustering
    when 64-d is still too wide at corpus scale.

    Determinism/parity contract: the sign matrix derives from md5
    parity (no stored model, reproducible on any engine) and the input
    components quantize to integer micro-units FIRST, so the per-
    component reduction is an exact integer sum — the only float ops
    are one division and round at the end, making the output
    oracle-checkable bit-for-bit.

    Shape: posexplode (n·d rows) → broadcast join of the d×k sign
    table → one groupBy(id, j) with integer partial aggs. The n·d·k
    intermediate is the price of exactness; for throughput-critical
    paths the BLAS-kernel pattern of ``semantic_decontaminate_blas``
    applies unchanged (matmul against the same ±1 matrix).

    Output long-form, k rows per vector: ``comp_micro`` is the exact
    integer contract (the oracle column — a rounded float column would
    sit ON half boundaries by construction, where engines disagree on
    decimal-vs-binary rounding); ``comp`` = comp_micro/(10⁶·√k) is the
    float view for consumers.
    """
    first = df.select(F.size(F.col(vec_col)).alias("n")).first()
    dim = first["n"] if first is not None else 0
    spark = df.sparkSession
    signs = (
        spark.range(dim)
        .select(F.col("id").alias("i"))
        .crossJoin(spark.range(out_dim).select(F.col("id").alias("j")))
        .select(
            "i",
            "j",
            (
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("|", F.lit(salt), F.col("i"), F.col("j"))),
                            1,
                            1,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 2
                )
                * 2
                - 1
            ).alias("s"),
        )
    )
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select(
        id_col,
        "i",
        F.round(F.col("x").cast("double") * 1_000_000).cast("long").alias("x_micro"),
    )
    return (
        exploded.join(F.broadcast(signs), "i")
        .groupBy(id_col, "j")
        .agg(F.sum(F.col("x_micro") * F.col("s")).alias("comp_micro"))
        .select(
            id_col,
            "j",
            "comp_micro",
            (
                F.col("comp_micro").cast("double") / 1_000_000 / float(out_dim) ** 0.5
            ).alias("comp"),
        )
    )


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    threshold: float = 0.95,
    seed: int = 13,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): KMeans-cluster
    the embedding space, then mark semantic duplicates WITHIN each
    cluster — a vector is dropped when its cosine to any lower-id
    vector of the same cluster reaches ``threshold`` (the one-pass
    deterministic relaxation of the paper's greedy representative
    selection; lowest id survives as the keeper).

    Scale shape: clustering bounds the pairwise stage to O(Σ c_g²)
    instead of n² — the cluster id is the block key. The per-cluster
    self-join shuffles on the cluster id; for clusters too large even
    for that, compose with ``embedding_near_dup_pairs`` inside the
    cluster (LSH blocking within the block). KMeans is MLlib's
    (seeded, deterministic for a fixed input); model-based → rows-only
    contract, behavior pinned in tests on constructed clusters.

    Output: (id, cluster, kept ∈ {0,1}).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = df.select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("__v")
    )
    km = KMeans(k=k, seed=seed, featuresCol="__v", predictionCol="__c")
    clustered = (
        km.fit(with_vec)
        .transform(with_vec)
        .select(id_col, vec_col, F.col("__c").cast("long").alias("cluster"))
    )
    a = clustered.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "cluster"
    )
    b = clustered.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "cluster"
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("id_b") < F.col("id_a"))
        .filter(F.round(cosine(F.col("__va"), F.col("__vb")), 6) >= threshold)
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return (
        clustered.join(
            dropped.withColumn("__drop", F.lit(1)), id_col, "left"
        )
        .select(
            id_col,
            "cluster",
            F.when(F.col("__drop").isNotNull(), F.lit(0)).otherwise(F.lit(1)).alias("kept"),
        )
    )


def embedding_bucket_rows(
    df: DataFrame,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Stateless multi-table LSH bucket projection: one row per
    (vector, table) with its hyperplane bucket id — the row-local stage
    the streaming index (``streaming/stateful.py::embedding_bucket_
    index``) and the batch twin below share, the same split as
    ``minhash_signatures_stateless`` / ``_lgram_stage``.

    Exactness note for value-hash gates: feed INTEGER-VALUED vectors
    (e.g. ``quantize_int8`` codes) — every plane projection is then a
    sum of ±code integers, exact in double at any summation order, so
    the bucket bits are bit-identical in any engine. Raw float
    embeddings still bucket fine for recall purposes but their
    near-zero projections are summation-order-sensitive, which is why
    the float ANN family is gated by banded-flag audits instead.
    """
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                lsh_bucket(
                    F.col(vec_col), n_planes, dim=dim, seed=seed + t
                ).alias("bkt"),
            )
            for t in range(n_tables)
        ]
    )
    return df.select(F.col(id_col), F.explode(tables).alias("tb")).select(
        id_col,
        F.col("tb.t").cast("long").alias("t"),
        F.col("tb.bkt").cast("long").alias("bkt"),
    )


def embedding_bucket_hits(
    df: DataFrame,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Per-(vector, table) LSH cell occupancy in arrival (id) order:
    the earliest prior occupant of the row's (table, bucket) cell
    (NULL for the first) and the prior-occupant count — the embedding
    analogue of ``dedup_approx.minhash_bucket_hits``, and the
    oracle-backed batch twin of the STREAMING vector index
    (``streaming/stateful.py::embedding_bucket_index``). A vector
    whose rows report priors in ≥ k of its tables is an ANN near-dup
    candidate — the incremental form of ``embedding_near_dup_pairs``'s
    (table, bucket) equi-join.

    One window per cell (sort at n_vectors × n_tables rows) — batch
    slices at 100 TB, same as the other index twins.
    """
    from pyspark.sql import Window

    rows = embedding_bucket_rows(
        df, n_planes, n_tables, seed, id_col, vec_col, dim
    )
    w = (
        Window.partitionBy("t", "bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return rows.select(
        id_col,
        "t",
        "bkt",
        F.min(id_col).over(w).cast("long").alias("first_vec_id"),
        F.count(id_col).over(w).cast("long").alias("n_prior"),
    )
