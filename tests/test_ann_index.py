"""Stored IVF-PQ index lifecycle (operators/ann_index.py): build →
search parity with the in-query path, append ≡ batch-encode against
the stored model, tombstone delete + vacuum ≡ encode-remainder —
VERDICT r9 #1 and the ANN leg of #4."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _centroids(e):
    from scrappy_spark.operators import similarity as SIM

    return (
        SIM.label_centroids(e)
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))),
                lambda s: s.centroid_val,
            ).alias("centroid")
        )
    )


def _load(spark):
    from scrappy_spark.io import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_stored_search_equals_fresh_build_search(spark, tmp_path):
    """The persistence round-trip loses nothing: searching the STORED
    artifacts returns exactly the in-query ivf_pq_search results
    (same corpus, same geometry, both deterministic)."""
    from scrappy_spark.operators import pq as PQ
    from scrappy_spark.operators.ann_index import IvfPqIndex

    e = _load(spark)
    cents = _centroids(e)
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = IvfPqIndex.build(spark, str(tmp_path / "idx"), e, cents)
    assert idx.exists()
    stored = sorted(map(tuple, idx.search(queries, k=5).collect()))
    fresh = sorted(
        map(tuple, PQ.ivf_pq_search(e, queries, cents, k=5).collect())
    )
    assert stored == fresh
    # reopening from disk serves identically (no in-memory state)
    again = IvfPqIndex(spark, str(tmp_path / "idx"))
    assert sorted(map(tuple, again.search(queries, k=5).collect())) == fresh


def test_append_equals_batch_encode_union(spark, tmp_path):
    """Incremental append encodes against the STORED model, so the
    codes table after append is row-identical to batch-encoding the
    union against the same artifacts — and search finds the new
    vector (self-retrieval)."""
    from scrappy_spark.operators import pq as PQ
    from scrappy_spark.operators.ann_index import IvfPqIndex

    e = _load(spark)
    cents = _centroids(e)
    base = e.filter(F.col("vec_id") < 400)
    batch = e.filter(F.col("vec_id") >= 400)
    idx = IvfPqIndex.build(spark, str(tmp_path / "idx"), base, cents)
    idx.append(batch)

    got = sorted(map(tuple, idx.codes().collect()))
    want = sorted(
        map(
            tuple,
            PQ.ivf_pq_encode_against(e, cents, idx.codebook.read())
            .select("vec_id", "codes", F.col("__cell").alias("cell"))
            .collect(),
        )
    )
    assert got == want

    new_q = batch.limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qid = new_q.collect()[0]["query_id"]
    hits = {r.vec_id for r in idx.search(new_q, k=5).collect()}
    assert qid in hits  # appended vector is immediately searchable

    with pytest.raises(ValueError):
        idx.append(batch)  # duplicate ids refuse


def test_delete_tombstones_then_vacuum_equals_rebuild(spark, tmp_path):
    """Takedown: delete() excludes the ids from codes() and search()
    with NO rewrite (codes table version unchanged); vacuum() then
    physically equals encoding corpus∖deleted against the stored
    model — the delete-vs-rebuild identity."""
    from scrappy_spark.operators import pq as PQ
    from scrappy_spark.operators.ann_index import IvfPqIndex

    e = _load(spark)
    cents = _centroids(e)
    idx = IvfPqIndex.build(spark, str(tmp_path / "idx"), e, cents)
    gone = [0, 1, 2]
    v_codes_before = idx._codes.current_version()
    idx.delete(gone)
    assert idx._codes.current_version() == v_codes_before  # no rewrite

    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = {r.vec_id for r in idx.search(q, k=10).collect()}
    assert not (hits & set(gone))  # not even self-retrieval survives
    live_ids = {r.vec_id for r in idx.codes().collect()}
    assert not (live_ids & set(gone))

    idx.vacuum()
    got = sorted(map(tuple, idx.codes().collect()))
    want = sorted(
        map(
            tuple,
            PQ.ivf_pq_encode_against(
                e.filter(~F.col("vec_id").isin(gone)),
                cents,
                idx.codebook.read(),
            )
            .select("vec_id", "codes", F.col("__cell").alias("cell"))
            .collect(),
        )
    )
    assert got == want
    # tombstones reset; the freed ids stay deleted in search
    assert idx.tombstones.read().count() == 0
    hits2 = {r.vec_id for r in idx.search(q, k=10).collect()}
    assert not (hits2 & set(gone))


def test_crashed_vacuum_heals(spark, tmp_path):
    """ADVICE r10 #2: a crash between vacuum's two commits (codes
    recommitted, tombstone reset lost) leaves STALE tombstones. They
    must be semantically inert (search unchanged vs completed vacuum),
    a second vacuum must clear them, and append of the fully-deleted
    id must be allowed again — not refused forever."""
    from scrappy_spark.operators.ann_index import IvfPqIndex

    e = _load(spark)
    cents = _centroids(e)
    idx = IvfPqIndex.build(spark, str(tmp_path / "idx"), e, cents)
    idx.delete([0])
    # simulate the crash: vacuum's FIRST commit lands (codes minus
    # tombstones), the tombstone reset never does
    idx._codes.commit(idx.codes(), "simulated crashed vacuum")
    assert idx.tombstones.read().count() == 1  # stale entry left

    q0 = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert not {r.vec_id for r in idx.search(q0, k=5).collect()} & {0}

    # branch 1: a second vacuum heals in place
    idx.vacuum()
    assert idx.tombstones.read().count() == 0

    # branch 2: re-crash, then re-APPEND of the vacuumed id heals too
    idx.delete([0])
    idx._codes.commit(idx.codes(), "simulated crashed vacuum")
    idx.append(e.filter(F.col("vec_id") == 0))
    assert idx.tombstones.read().count() == 0  # stale entry healed
    hits = {r.vec_id for r in idx.search(q0, k=5).collect()}
    assert 0 in hits  # re-appended vector searchable, not masked


def test_opq_build_stores_rotation_and_serves(spark, tmp_path):
    """opq=True: the rotation is part of the persisted geometry —
    search from the STORED index equals running the artifacts search
    over manually rotated corpus/centroids/queries, and recall is at
    least the plain stored index's (the OPQ parity floor)."""
    from scrappy_spark.operators import opq as OPQ
    from scrappy_spark.operators import pq as PQ
    from scrappy_spark.operators.ann_index import IvfPqIndex
    from scrappy_spark.operators.similarity import cosine_topk

    e = _load(spark)
    cents = _centroids(e)
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plain = IvfPqIndex.build(spark, str(tmp_path / "p"), e, cents)
    idx = IvfPqIndex.build(spark, str(tmp_path / "o"), e, cents, opq=True)
    assert idx.meta["rotation"] is not None
    # reopening from disk restores the rotation (no in-memory state)
    again = IvfPqIndex(spark, str(tmp_path / "o"))
    got = sorted(map(tuple, again.search(queries, k=5).collect()))

    rotation = idx.meta["rotation"]
    re_ = OPQ.opq_rotate(e.select("vec_id", "embedding"), rotation)
    rc = cents.withColumn(
        "centroid", OPQ.rotate_expr(rotation, F.col("centroid"))
    )
    rq = OPQ.opq_rotate(queries.select("query_id", "embedding"), rotation)
    codes, book = PQ.ivf_pq_build(re_, rc)
    want = sorted(
        map(
            tuple,
            PQ.ivf_pq_search_artifacts(
                codes.withColumnRenamed("__cell", "cell").withColumnRenamed(
                    "cell", "__cell"
                ),
                book,
                rc,
                rq,
                k=5,
            ).collect(),
        )
    )
    assert got == want

    # Quality bar: the banded audit every IVF-PQ query pins (full-k,
    # self-retrieval, >= 1 true-top-5 hit per query). NOT a strict
    # recall-parity assert vs the plain index: the rotation preserves
    # distances exactly, but n_probe cell pruning composes with it, so
    # per-fixture parity is not a theorem for the IVF variant (the
    # flat-PQ parity pin lives in test_opq.py, where it is one).
    from scrappy_spark.operators.ann_audit import topk_recall_audit

    exact = cosine_topk(e, queries, k=5)
    audit = topk_recall_audit(idx.search(queries, k=5), exact, k=5, min_hits=1)
    rows = audit.collect()
    assert len(rows) == 5
    for r in rows:
        assert (r["n_results"], r["self_found"], r["recall_ok"]) == (1, 1, 1)
    assert plain.search(queries, k=5).count() == 25  # plain index intact


def test_opq_append_equals_batch_encode_union(spark, tmp_path):
    """append under a stored rotation rotates the batch with the SAME
    matrix, so append-then-read equals building over the union."""
    from scrappy_spark.operators.ann_index import IvfPqIndex

    e = _load(spark)
    cents = _centroids(e)
    base = e.filter(F.col("vec_id") < 40)
    batch = e.filter(F.col("vec_id") >= 40)
    idx = IvfPqIndex.build(spark, str(tmp_path / "o"), base, cents, opq=True)
    idx.append(batch)
    whole = IvfPqIndex.build(
        spark, str(tmp_path / "w"), base.unionByName(batch), cents, opq=True
    )
    # same model? NO — whole's rotation/codebook trained on the union;
    # the append contract is encode-against-the-STORED-model, so
    # compare against encoding the batch with base's OWN stored model
    from scrappy_spark.operators import pq as PQ

    got = sorted(map(tuple, idx.codes().collect()))
    rb = idx._rotated(batch, "vec_id", "embedding")
    extra = PQ.ivf_pq_encode_against(
        rb,
        idx.cells.read().withColumnRenamed("cell", "label"),
        idx.codebook.read(),
    ).select("vec_id", "codes", F.col("__cell").alias("cell"))
    base_codes = IvfPqIndex(spark, str(tmp_path / "o"))  # fresh handle
    want_rows = sorted(
        map(
            tuple,
            idx._codes.read()
            .join(batch.select("vec_id"), "vec_id", "left_anti")
            .unionByName(extra)
            .collect(),
        )
    )
    assert got == want_rows
    assert whole.exists()  # the union index itself is also servable


def test_crashed_build_retry_param_mismatch_refused(spark, tmp_path):
    """ADVICE r11 #3: a retried build over a crashed attempt's
    committed tables (e.g. an unrotated codes table) must refuse
    different parameters — fresh meta carrying a rotation over old
    plain-space codes would serve wrong results with no error."""
    import os

    from scrappy_spark.operators.ann_index import IvfPqIndex

    e = _load(spark)
    cents = _centroids(e)
    path = str(tmp_path / "idx")
    IvfPqIndex.build(spark, path, e, cents)
    os.remove(os.path.join(path, "meta.json"))  # crash sim: meta lost
    with pytest.raises(ValueError, match="different parameters"):
        IvfPqIndex.build(spark, path, e, cents, opq=True)
    with pytest.raises(ValueError, match="different parameters"):
        IvfPqIndex.build(spark, path, e.filter(F.col("vec_id") < 50), cents)
    idx = IvfPqIndex.build(spark, path, e, cents)  # same build resumes
    assert idx.exists() and idx._codes.current_version() == 0
