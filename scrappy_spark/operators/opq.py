"""Optimized Product Quantization: a learned orthonormal rotation in
front of PQ (Ge et al., "Optimized Product Quantization for
Approximate Nearest Neighbor Search", CVPR 2013 — the parametric
OPQ-P variant).

Plain PQ quantizes FIXED coordinate slices (dims 0-3, 4-7, …), so its
distortion depends on how the data's variance happens to fall across
those slices: one subspace carrying most of the energy exhausts its
ksub centroids while others quantize noise. OPQ-P fixes the
allocation, not the quantizer: rotate by the data's PCA basis (which
decorrelates dimensions), then ASSIGN principal directions to the m
subspaces so the per-subspace variance products balance (eigenvalue
allocation — greedy smallest-log-product bin packing, the paper's
closed-form solution under the independence assumption). Because the
rotation is orthonormal, L2 distances — and therefore the ADC search,
its recall audit, and every downstream identity — are EXACTLY
preserved: OPQ changes only where the quantization error lands.

Spark shape: the rotation is learned DRIVER-SIDE on the same capped
deterministic sample ``pq_train`` already collects (a 64×64 eigh —
microseconds; the same "codebook training does not belong on the
cluster" economics), then applied SCAN-SIDE as a broadcast-literal
matrix multiply (``F.transform`` over the literal rows with a
zip_with dot product — whole-stage codegen, no UDF, no shuffle).
Everything corpus-scale (rotate, encode, search) stays distributed;
search runs the UNMODIFIED pq machinery on rotated vectors.

Reference parity: none (the reference has no vector search); closes
VERDICT r9 #7 / r10 #8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from . import pq as PQ


def opq_rotation(
    corpus: DataFrame,
    m: int = PQ.PQ_M,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> list[list[float]]:
    """Learn the OPQ-P rotation: rows of the returned (dim × dim)
    matrix are PCA directions of the training sample, ORDERED so that
    consecutive blocks of dim/m rows form the m subspaces, with
    principal directions assigned to blocks by greedy eigenvalue
    allocation (largest eigenvalue first, into the block with the
    smallest running log-variance-product that still has room).
    Deterministic: the sample is the md5-threshold ``pq.train_sample``
    and eigenvector signs are canonicalized (largest-|entry| positive),
    so the matrix is a pure function of (corpus, seed)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    import math

    import numpy as np

    x = PQ.train_sample(corpus, vec_col=vec_col, id_col=id_col, seed=seed)
    c = np.cov(x - x.mean(axis=0), rowvar=False)
    w, v = np.linalg.eigh(c)  # ascending eigenvalues, columns = vectors
    order = np.argsort(-w, kind="stable")
    w, v = w[order], v[:, order]
    for i in range(dim):  # canonical signs: largest-|entry| positive
        j = int(np.abs(v[:, i]).argmax())
        if v[j, i] < 0:
            v[:, i] = -v[:, i]

    d = dim // m
    eps = max(float(w.max()), 1.0) * 1e-12
    logs = [math.log(max(float(lam), eps)) for lam in w]
    load = [0.0] * m
    fill: list[list[int]] = [[] for _ in range(m)]
    for i in range(dim):  # eigenvalues descending
        j = min(
            (jj for jj in range(m) if len(fill[jj]) < d),
            key=lambda jj: (load[jj], jj),
        )
        fill[j].append(i)
        load[j] += logs[i]
    rows: list[list[float]] = []
    for j in range(m):
        for i in fill[j]:
            rows.append([float(t) for t in v[:, i]])
    return rows


def rotate_expr(rotation: list[list[float]], vec) -> Column:
    """``R @ x`` as one scan-side expression: transform over the
    broadcast-literal rows, zip_with dot product per output dimension
    — stays in whole-stage codegen, nothing leaves the JVM."""
    lit_rows = F.array(
        *[F.array(*[F.lit(float(t)) for t in row]) for row in rotation]
    )
    vec = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(lit_rows, lambda row: PQ._dot(row, vec))


def opq_rotate(
    df: DataFrame, rotation: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """The same frame with ``vec_col`` replaced by its rotation —
    drop-in upstream of any pq_* stage."""
    return df.withColumn(vec_col, rotate_expr(rotation, vec_col))


def opq_check_orthonormal(
    rotation: list[list[float]], tol: float = 1e-8
) -> None:
    """Loud-fail guard: ``R·Rᵀ = I`` within ``tol`` — the property
    that makes OPQ distances exact. Raises, never returns a flag a
    caller could drop."""
    import numpy as np

    r = np.array(rotation)
    err = float(np.abs(r @ r.T - np.eye(r.shape[0])).max())
    if err > tol:
        raise ValueError(
            f"OPQ rotation is not orthonormal: max |R·Rᵀ − I| = {err:.3e}"
        )


def opq_pq_search(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = PQ.PQ_M,
    ksub: int = PQ.PQ_KSUB,
    dim: int = 64,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
) -> DataFrame:
    """End-to-end OPQ: learn rotation, rotate corpus AND queries with
    the same matrix, then run the unmodified pq train/encode/ADC
    search. Output schema identical to ``pq_search`` — rotated-space
    L2 equals original-space L2 (orthonormality, guarded loudly), so
    results audit against the SAME exact ground truth."""
    rotation = opq_rotation(
        corpus, m=m, dim=dim, vec_col=vec_col, id_col=id_col, seed=seed
    )
    opq_check_orthonormal(rotation)
    rc = opq_rotate(corpus.select(id_col, vec_col), rotation, vec_col)
    rq = opq_rotate(
        queries.select(query_id_col, vec_col), rotation, vec_col
    )
    book = PQ.pq_train(
        rc, m=m, ksub=ksub, dim=dim, vec_col=vec_col, id_col=id_col, seed=seed
    )
    codes = PQ.pq_encode(rc, book, m=m, dim=dim, id_col=id_col, vec_col=vec_col)
    return PQ.pq_search(
        codes,
        book,
        rq,
        m=m,
        dim=dim,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    )
