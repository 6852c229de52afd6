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
    id_col: str = "vec_id",
    seed: int = 7,
    iters: int = 8,
) -> DataFrame:
    """Learn per-subspace codebooks; returns (subspace, code, centroid).

    Codebook training is the one PQ stage that does NOT belong on the
    cluster: FAISS trains its codebooks on a bounded sample too,
    because ksub centroids per subspace saturate at a few thousand
    points per centroid — more corpus adds cost, not quality. So:
    a deterministic md5-threshold sample capped at 65 536 rows
    is collected (``train_sample`` — BOUNDED driver-side action,
    ≤ cap·dim doubles, same justification as bloom.bank_to_dense), and vectorized
    numpy Lloyd iterations train all m subspaces at once. Distributed
    alternatives measured at sf0.01: m MLlib fits ≈27s, a
    DataFrame-native joint Lloyd loop ≈52s (per-iteration shuffle
    latency), this ≈8s — and unlike both, it is bit-deterministic:
    seeds are the ksub sample rows with smallest md5(seed‖id), argmin
    ties break on lowest code, empty clusters keep their previous
    centroid, so the codebook is a pure function of (corpus, seed).

    Encoding and search — the corpus-scale stages — stay fully
    distributed (`pq_encode`/`pq_search`).
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    import numpy as np

    spark = corpus.sparkSession
    x = train_sample(corpus, vec_col=vec_col, id_col=id_col, seed=seed)
    d = dim // m
    prev: list[tuple[int, int, list[float]]] = []
    for j in range(m):
        sub = x[:, j * d : (j + 1) * d]  # (ns, d)
        cents = sub[:ksub].copy()
        for _ in range(iters):
            # (ns, ksub) squared distances; argmin breaks ties on lowest code
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(ksub):
                mask = a == c
                if mask.any():  # empty cluster keeps its centroid
                    cents[c] = sub[mask].mean(axis=0)
        prev.extend((j, c, [float(v) for v in cents[c]]) for c in range(ksub))
    # JVM LocalTableScan, not a Python-RDD relation: the codebook is
    # broadcast into BOTH the encode join and the per-query ADC table,
    # so the plan evaluates this subtree repeatedly — as a pickled RDD
    # each evaluation paid ~4.4 s of Python-worker round-trips
    # (guide §4, the Python boundary); as a local relation it is free.
    from ..functions.localrel import local_relation

    return local_relation(
        spark, prev, "subspace int, code int, centroid array<double>"
    ).coalesce(1)


def train_sample(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    cap: int = 65_536,
):
    """The deterministic bounded training sample ``pq_train`` (and OPQ
    rotation learning) collects: an md5-threshold row sample capped at
    ``cap`` rows, returned as a seed-ordered (ns, dim) numpy array —
    a pure function of (corpus, seed), independent of partition
    layout. No ``.limit()`` on top: the threshold already concentrates
    the sample at ~cap rows, and limit's row choice depends on
    partition layout — it would break codebook determinism. BOUNDED
    driver-side action (≤ cap·dim doubles), same justification as
    bloom.bank_to_dense."""
    import numpy as np

    n = corpus.count()
    src = corpus.select(id_col, vec_col)
    if n > cap:
        keep = (cap / n) * 4_294_967_296.0
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"pq{seed}s:"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        src = src.filter(h < F.lit(keep))
    rows = src.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).collect()
    order = np.argsort(
        [__import__("hashlib").md5(f"pq{seed}:{r[id_col]}".encode()).hexdigest() for r in rows]
    )
    return np.array([rows[i]["__v"] for i in order])  # (ns, dim)


def _sq_l2(a, b, d: int | None = None):
    """Σ (aᵢ−bᵢ)² — with ``d`` (a statically-known element count ≤ 16),
    an unrolled codegen'd sum; otherwise the higher-order-function
    form.

    Spark's higher-order functions (zip_with/aggregate) are NOT
    whole-stage-codegen'd — every element runs an interpreted lambda —
    and pq_encode evaluates this once per (row, subspace, candidate
    code): corpus·m·ksub times, the hottest expression in the IVF-PQ
    build. Unrolling d explicit (a[i]−b[i])² terms keeps the whole
    stage in codegen: measured at sf0.1 (r14), pq_encode 1.65 → 0.77 s
    with BIT-IDENTICAL codes. The unroll is capped at 16 terms because
    a 64-term unroll measured WORSE than the lambda (codegen blowup —
    the semantic_decontaminate_blas precedent); subspace widths beyond
    that keep the HOF form. Float-equivalence: aggregate folds
    ((0.0+v₁)+v₂)+… and every vᵢ = (aᵢ−bᵢ)² ≥ +0.0 (or NaN), so
    0.0+v₁ ≡ v₁ bit-exactly and the left-to-right sum (v₁+v₂)+… is the
    SAME IEEE operation sequence.

    Precondition for the unrolled branch: BOTH arrays have exactly
    ``d`` elements. ``element_at`` past the array end throws under ANSI
    mode where the zip_with form pads the shorter side with NULL —
    mismatched lengths are a caller bug either way (every caller slices
    fixed-width ``_subvec`` pieces), but the failure mode is mode- and
    length-sensitive here (ADVICE r14)."""
    if d is not None and 1 <= d <= 16:
        terms = [
            (F.element_at(a, i) - F.element_at(b, i))
            * (F.element_at(a, i) - F.element_at(b, i))
            for i in range(1, d + 1)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
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
    from .mining import ensure_parallelism

    # posexplode_OUTER: the m-entry array is never empty, so no null
    # rows appear — but plain posexplode would still infer a
    # size/isnotnull guard over the full m-subvector build and push it
    # below the repartition exchange into the serial scan task
    # (ARCHITECTURE.md, "Generate-filter pushdown vs
    # ensure_parallelism").
    subs = ensure_parallelism(corpus.select(id_col, vec_col)).select(
        id_col,
        F.posexplode_outer(
            F.array(*[_subvec(F.col(vec_col), m, dim, j).cast("array<double>") for j in range(m)])
        ).alias("subspace", "__sub"),
    )
    scored = subs.join(F.broadcast(codebook), "subspace").select(
        id_col,
        "subspace",
        F.struct(
            _sq_l2(F.col("__sub"), F.col("centroid"), d=dim // m).alias("d"),
            F.col("code").alias("c"),
        ).alias("__dc"),
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


def ivf_pq_search(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    label_col: str = "label",
    seed: int = 7,
) -> DataFrame:
    """IVF-PQ composed ANN — the FAISS IVFPQ layout (Jégou et al. 2011
    §V) and the actual 100 TB vector-index shape: a coarse quantizer
    prunes the search to ``n_probe`` cells, and within cells vectors
    exist only as ``m`` PQ codes of their RESIDUAL (vector − cell
    centroid), so the index stores ~m bytes/vector and search reads no
    embeddings at all.

    Score decomposition (asymmetric distance, inner product):
    ``dot(q, x) ≈ dot(q, c_cell) + Σ_j dot(q_j, centroid_{j, code_j})``
    — the first term is one scalar per (query, probed cell); the
    second comes from the per-query m·ksub lookup table built on the
    SHARED residual codebook (cell-independent, so one broadcast table
    per query, not per cell). Residual quantization is what makes the
    shared codebook work: residuals of all cells live near the origin,
    where one codebook fits them far better than it fits raw vectors.

    Scale shape: cell assignment is the IVF broadcast-centroid pass
    (corpus never shuffles by cell); codebook training is pq_train's
    bounded deterministic sample; search explodes m small rows per
    candidate IN PROBED CELLS ONLY (the n_probe/n_cells cost cut), and
    every join side except the code stream is broadcast. Output:
    ``(query_id, vec_id, score)`` with deterministic (−score, id)
    ranking — approximate by design, audited by recall band
    (ann_audit.topk_recall_audit), not exact scores.
    """
    codes, book = ivf_pq_build(
        corpus,
        centroids,
        m=m,
        ksub=ksub,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        label_col=label_col,
        seed=seed,
    )
    return ivf_pq_search_artifacts(
        codes,
        book,
        centroids,
        queries,
        k=k,
        n_probe=n_probe,
        m=m,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        label_col=label_col,
    )


def ivf_assign_residual(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Coarse-quantizer assignment: each vector's nearest cell by
    cosine (ties to the lower cell) plus its RESIDUAL against that
    cell's centroid — ``(id, __cell, __r)``. Broadcast centroids; the
    corpus never shuffles by cell."""
    from .joins import topk_per_group
    from .similarity import dot, norm

    # cosine = dot/(‖v‖·‖c‖) with BOTH norms hoisted out of the
    # crossJoin: the interpreted-HOF norm of a 64-dim vector otherwise
    # re-evaluates once per (vector, cell) pair — n_cells× per corpus
    # row (guide §1.2 per-task work). Same expressions, each evaluated
    # once per side, so the quotient is bit-identical.
    cents = F.broadcast(
        centroids.select(
            F.col(label_col).alias("__cell"),
            F.col("centroid").alias("__c"),
            norm(F.col("centroid")).alias("__cn"),
        )
    )
    assigned = (
        vectors.select(id_col, vec_col, norm(F.col(vec_col)).alias("__vn"))
        .crossJoin(cents)
        .withColumn(
            "__d",
            dot(F.col(vec_col), F.col("__c")) / (F.col("__vn") * F.col("__cn")),
        )
    )
    best = topk_per_group(assigned, [id_col], [F.desc("__d"), F.asc("__cell")], 1)
    return best.select(
        id_col,
        "__cell",
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("__c").cast("array<double>"),
            lambda x, y: x - y,
        ).alias("__r"),
    )


def ivf_pq_build(
    corpus: DataFrame,
    centroids: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    seed: int = 7,
) -> tuple[DataFrame, DataFrame]:
    """Train-and-encode half of the IVF-PQ lifecycle: assign cells,
    train the SHARED residual codebook on the bounded deterministic
    sample, encode every vector. Returns ``(codes, codebook)`` —
    ``codes`` is ``(id, codes array, __cell)``, ~m bytes/vector; both
    are the artifacts a stored index persists (ann_index.IvfPqIndex),
    so production trains once here and serves many searches."""
    resid = ivf_assign_residual(
        corpus, centroids, id_col=id_col, vec_col=vec_col, label_col=label_col
    )
    # One residual pass, consumed five times (train's count + collect,
    # encode's subvector explode, the cell re-join, search's code
    # stream): materialize it once instead of re-running the
    # broadcast-centroid assignment + window per consumer
    # (guide §5 — reuse beats recompute when the frame is cheap to
    # hold; the residuals are corpus-sized, i.e. the same bytes one
    # extra scan would read). Lazy: the first action (pq_train's
    # count) materializes it.
    resid = resid.localCheckpoint(eager=False)
    book = pq_train(
        resid, m=m, ksub=ksub, dim=dim, vec_col="__r", id_col=id_col, seed=seed
    )
    # encode directly against the SHARED residual frame — identical to
    # ivf_pq_encode_against(corpus, ...), which would recompute the
    # assignment from scratch (it stays the append path, where no
    # residual frame exists yet).
    codes = pq_encode(
        resid, book, m=m, dim=dim, id_col=id_col, vec_col="__r"
    ).join(resid.select(id_col, "__cell"), id_col)
    return codes, book


def ivf_pq_encode_against(
    vectors: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    m: int = PQ_M,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Encode vectors against a STORED coarse quantizer + codebook —
    no training. This is the incremental-append path: new vectors
    entering a stored index are coded with the index's OWN model, so
    append-then-search is byte-identical to batch-encoding the union
    (the equivalence the stored-index tests pin)."""
    resid = ivf_assign_residual(
        vectors, centroids, id_col=id_col, vec_col=vec_col, label_col=label_col
    )
    return pq_encode(
        resid, codebook, m=m, dim=dim, id_col=id_col, vec_col="__r"
    ).join(resid.select(id_col, "__cell"), id_col)


def ivf_pq_search_artifacts(
    codes: DataFrame,
    codebook: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    m: int = PQ_M,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    label_col: str = "label",
) -> DataFrame:
    """Serve-side half: ADC search over PREBUILT ``(codes, codebook,
    centroids)`` artifacts — what a stored index runs per query batch.
    Reads no corpus embeddings; every join side except the code stream
    is broadcast."""
    from .joins import topk_per_group

    from .similarity import cosine

    cents = F.broadcast(
        centroids.select(
            F.col(label_col).alias("__cell"), F.col("centroid").alias("__c")
        )
    )
    book = codebook

    q_probe = (
        queries.crossJoin(cents)
        .withColumn("__d", cosine(F.col(vec_col), F.col("__c")))
    )
    probes = topk_per_group(
        q_probe, [query_id_col], [F.desc("__d"), F.asc("__cell")], n_probe
    )
    coarse = probes.select(
        query_id_col,
        "__cell",
        _dot(
            F.col(vec_col).cast("array<double>"), F.col("__c").cast("array<double>")
        ).alias("__qc"),
    )
    # Per-(query, subspace, code) lookup values micro-snapped to BIGINT
    # (ADVICE r9 #4): the per-candidate ADC sum is then integer-exact,
    # so float addition order across partial aggregations can never
    # flip a rank at a 4-decimal rounding boundary — the langid-scorer
    # determinism pattern; approximation stays in the quantization.
    qtab = F.broadcast(
        queries.crossJoin(F.broadcast(book)).select(
            query_id_col,
            "subspace",
            "code",
            F.round(
                _dot(
                    _subvec(
                        F.col(vec_col).cast("array<double>"),
                        m,
                        dim,
                        F.col("subspace"),
                    ),
                    F.col("centroid"),
                )
                * 1e6
            )
            .cast("long")
            .alias("__p_u"),
        )
    )

    cand = codes.join(F.broadcast(coarse), "__cell")
    # posexplode_OUTER + null filter on the GENERATED column: plain
    # posexplode would make Catalyst infer a size()>0 guard over the
    # codes array and push it below the aggregation exchanges,
    # re-evaluating the encode pipeline in the pre-exchange task (the
    # generate-filter-pushdown rule, ARCHITECTURE.md).
    exploded = cand.select(
        query_id_col,
        id_col,
        "__qc",
        F.posexplode_outer("codes").alias("subspace", "code"),
    ).filter(F.col("code").isNotNull())
    scored = (
        exploded.join(qtab, [query_id_col, "subspace", "code"])
        .groupBy(query_id_col, id_col)
        .agg(
            F.round(
                F.max("__qc") + F.sum("__p_u").cast("double") / 1e6, 4
            ).alias("score")
        )
    )
    return topk_per_group(
        scored, [query_id_col], [F.desc("score"), F.asc(id_col)], k
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

    # same BIGINT micro-snap as ivf_pq_search (ADVICE r9 #4): the ADC
    # sum is integer-exact, rank order run-stable.
    qtab = F.broadcast(
        queries.crossJoin(F.broadcast(codebook)).select(
            query_id_col,
            "subspace",
            "code",
            F.round(
                _dot(
                    _subvec(F.col(vec_col), m, dim, F.col("subspace")),
                    F.col("centroid"),
                )
                * 1e6
            )
            .cast("long")
            .alias("__p_u"),
        )
    )
    exploded = codes.select(
        id_col, F.posexplode(F.col("codes")).alias("subspace", "code")
    )
    scored = (
        exploded.join(qtab, ["subspace", "code"])
        .groupBy(query_id_col, id_col)
        .agg(
            F.round(F.sum("__p_u").cast("double") / 1e6, 4).alias("score")
        )
    )
    return topk_per_group(scored, [query_id_col], [F.desc("score"), F.asc(id_col)], k)
