"""OPQ rotation (operators/opq.py) — VERDICT r9 #7 / r10 #8: the
parametric rotation is orthonormal, distance-preserving, balanced,
deterministic, and at least recall-parity with plain PQ."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _emb(spark):
    from scrappy_spark.io import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def _rotation(spark):
    from scrappy_spark.operators.opq import opq_rotation

    return opq_rotation(_emb(spark))


def test_rotation_is_orthonormal_and_deterministic(spark):
    import numpy as np

    from scrappy_spark.operators.opq import opq_check_orthonormal

    r1 = _rotation(spark)
    opq_check_orthonormal(r1)  # raises on failure
    r = np.array(r1)
    assert r.shape == (64, 64)
    assert np.abs(r @ r.T - np.eye(64)).max() < 1e-8
    assert _rotation(spark) == r1  # pure function of (corpus, seed)


def test_check_orthonormal_rejects_non_rotation(spark):
    from scrappy_spark.operators.opq import opq_check_orthonormal

    bad = [[2.0 if i == j else 0.0 for j in range(4)] for i in range(4)]
    with pytest.raises(ValueError, match="not orthonormal"):
        opq_check_orthonormal(bad)


def test_rotate_preserves_pairwise_l2(spark):
    """The property every downstream identity rides: rotated-space L2
    equals original-space L2 (to float tolerance), computed through
    the actual scan-side rotate expression, not numpy."""
    from scrappy_spark.operators.opq import opq_rotate

    e = _emb(spark).filter(F.col("vec_id") < 20)
    rot = opq_rotate(e, _rotation(spark))
    a = e.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))

    def dists(left, right):
        d2 = F.aggregate(
            F.zip_with(left, right, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return d2

    orig = {
        (r[0], r[1]): r[2]
        for r in a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib", dists(F.col("va"), F.col("vb")).alias("d"))
        .collect()
    }
    ra = rot.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    rb = rot.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    got = {
        (r[0], r[1]): r[2]
        for r in ra.crossJoin(rb)
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib", dists(F.col("va"), F.col("vb")).alias("d"))
        .collect()
    }
    assert orig.keys() == got.keys()
    # embeddings are float32 on disk; the two paths round differently
    # (direct float subtraction vs a 64-term double rotation first),
    # so agreement is float32-epsilon-scale, not double-scale
    for k, v in orig.items():
        assert got[k] == pytest.approx(v, rel=1e-5, abs=1e-5)


def test_eigenvalue_allocation_is_balanced(spark):
    """Every subspace receives exactly dim/m principal directions —
    the allocation is a partition, not a projection."""
    import numpy as np

    from scrappy_spark.operators import pq as PQ

    r = np.array(_rotation(spark))
    d = 64 // PQ.PQ_M
    # rows form m contiguous blocks of d orthonormal rows
    for j in range(PQ.PQ_M):
        block = r[j * d : (j + 1) * d]
        assert np.abs(block @ block.T - np.eye(d)).max() < 1e-8


def test_opq_recall_at_least_plain_pq(spark):
    """The headline pin (VERDICT r9 #7 done-criterion): total
    exact-top-10 hits of OPQ-PQ >= plain PQ on the fixture."""
    from scrappy_spark.operators import opq as OPQ
    from scrappy_spark.operators import pq as PQ
    from scrappy_spark.operators.similarity import cosine_topk

    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r[0], r[1])
        for r in cosine_topk(e, q, k=10).select("query_id", "vec_id").collect()
    }

    def hits(ann):
        got = {
            (r[0], r[1])
            for r in ann.select("query_id", "vec_id").collect()
        }
        return len(got & exact)

    book = PQ.pq_train(e)
    plain = hits(PQ.pq_search(PQ.pq_encode(e, book), book, q, k=10))
    opq = hits(OPQ.opq_pq_search(e, q, k=10))
    assert opq >= plain
