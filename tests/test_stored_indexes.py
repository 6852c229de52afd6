"""Takedown lifecycles for the gram and MinHash stored indexes
(operators/stored_indexes.py) plus the privacy release gate — VERDICT
r9 #4 / #8, r10 #4 / #6."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

_L = 30
_ALPHA = "SHARED ALPHA CONTENT MARKER " * 3
_BRAVO = "UNIQUE BRAVO CONTENT MARKER " * 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _load_docs(spark):
    from scrappy_spark.io import load_table

    return (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 40)
    )


# ---------------------------------------------------------------- GramIndex


def _gram_set(df):
    return {r[0] for r in df.collect()}


def test_gram_index_build_equals_plain_index(spark, tmp_path):
    from scrappy_spark.operators.curation import exact_substring_index
    from scrappy_spark.operators.stored_indexes import GramIndex

    docs = _load_docs(spark)
    idx = GramIndex.build(spark, str(tmp_path / "g"), docs, min_len=_L)
    assert idx.exists()
    assert _gram_set(idx.grams()) == _gram_set(
        exact_substring_index(docs, min_len=_L)
    )
    # reopening from disk serves identically
    again = GramIndex(spark, str(tmp_path / "g"))
    assert _gram_set(again.grams()) == _gram_set(idx.grams())


def test_gram_delete_equals_rebuild_and_shared_grams_survive(
    spark, tmp_path
):
    """The refcount contract: deleting one holder of shared content
    keeps the grams live; deleting the SOLE holder retires them —
    live set == index rebuilt over corpus∖deleted."""
    from scrappy_spark.operators.curation import exact_substring_index
    from scrappy_spark.operators.stored_indexes import GramIndex

    extra = _docs(
        spark, [(1001, _ALPHA), (1002, _ALPHA), (1003, _BRAVO)]
    )
    docs = _load_docs(spark).unionByName(extra)
    idx = GramIndex.build(spark, str(tmp_path / "g"), docs, min_len=_L)
    deleted = docs.filter(F.col("doc_id").isin(1002, 1003))
    idx.delete(deleted)
    live = _gram_set(idx.grams())
    remainder = docs.filter(~F.col("doc_id").isin(1002, 1003))
    assert live == _gram_set(exact_substring_index(remainder, min_len=_L))
    alpha = _gram_set(
        exact_substring_index(_docs(spark, [(1, _ALPHA)]), min_len=_L)
    )
    bravo = _gram_set(
        exact_substring_index(_docs(spark, [(1, _BRAVO)]), min_len=_L)
    )
    assert alpha <= live  # doc 1001 still holds ALPHA
    assert not (bravo & live)  # sole BRAVO holder deleted


def test_gram_append_then_delete_roundtrip_and_vacuum(spark, tmp_path):
    from scrappy_spark.operators.stored_indexes import GramIndex

    base = _load_docs(spark)
    batch = _docs(spark, [(2001, _ALPHA), (2002, _BRAVO)])
    idx = GramIndex.build(spark, str(tmp_path / "g"), base, min_len=_L)
    before = _gram_set(idx.grams())
    idx.append(batch)
    idx.delete(batch)
    assert _gram_set(idx.grams()) == before
    n_ledger_rows = idx.ledger.read().count()
    idx.vacuum()
    assert _gram_set(idx.grams()) == before  # vacuum is invisible
    assert idx.ledger.read().count() < n_ledger_rows  # bytes reclaimed
    # vacuum is idempotent: rerun recommits the same net state
    idx.vacuum()
    assert _gram_set(idx.grams()) == before


def test_gram_guards_refuse_double_index_and_double_delete(
    spark, tmp_path
):
    from scrappy_spark.operators.stored_indexes import GramIndex

    docs = _docs(spark, [(1, _ALPHA), (2, _BRAVO)])
    idx = GramIndex.build(spark, str(tmp_path / "g"), docs, min_len=_L)
    with pytest.raises(ValueError, match="already indexed"):
        idx.append(_docs(spark, [(1, _ALPHA)]))
    idx.delete(_docs(spark, [(2, _BRAVO)]))
    with pytest.raises(ValueError, match="not a live member"):
        idx.delete(_docs(spark, [(2, _BRAVO)]))
    # after takedown the id may be re-indexed (right-to-return)
    idx.append(_docs(spark, [(2, _BRAVO)]))
    assert 2 in {r[0] for r in idx.members().collect()}


def test_gram_index_serves_incremental_dedup(spark, tmp_path):
    """clean_batch through the live index equals the plain incremental
    dedup against the equivalent membership set."""
    from scrappy_spark.operators.curation import (
        exact_substring_dedup_incremental,
        exact_substring_index,
    )
    from scrappy_spark.operators.stored_indexes import GramIndex

    base = _load_docs(spark)
    batch = _docs(spark, [(3001, _ALPHA), (3002, _BRAVO)]).unionByName(
        base.limit(3).select(
            (F.col("doc_id") + 5000).alias("doc_id"), "text"
        )
    )
    idx = GramIndex.build(spark, str(tmp_path / "g"), base, min_len=_L)
    got = sorted(map(tuple, idx.clean_batch(batch).collect()))
    want = sorted(
        map(
            tuple,
            exact_substring_dedup_incremental(
                batch, exact_substring_index(base, min_len=_L), min_len=_L
            ).collect(),
        )
    )
    assert got == want


# -------------------------------------------------------------- MinHashIndex


def _sig_rows(df):
    return sorted(map(tuple, df.select("doc_id", "seed", "minhash").collect()))


def test_minhash_delete_equals_rebuild(spark, tmp_path):
    from scrappy_spark.operators.dedup_approx import minhash_signatures
    from scrappy_spark.operators.stored_indexes import MinHashIndex

    docs = _load_docs(spark)
    idx = MinHashIndex.build(spark, str(tmp_path / "m"), docs)
    assert idx.exists()
    dead = [0, 1, 2, 3, 4]
    idx.delete(dead)
    remainder = docs.filter(~F.col("doc_id").isin(dead))
    assert _sig_rows(idx.signatures()) == _sig_rows(
        minhash_signatures(remainder)
    )
    # vacuum reclaims bytes without changing a visible row
    before = _sig_rows(idx.signatures())
    idx.vacuum()
    assert _sig_rows(idx.signatures()) == before
    assert idx.tombstones.read().count() == 0


def test_minhash_append_parity_and_clash_guard(spark, tmp_path):
    from scrappy_spark.operators.dedup_approx import minhash_signatures
    from scrappy_spark.operators.stored_indexes import MinHashIndex

    docs = _load_docs(spark)
    base = docs.filter(F.col("doc_id") < 20)
    batch = docs.filter(F.col("doc_id") >= 20)
    idx = MinHashIndex.build(spark, str(tmp_path / "m"), base)
    idx.append(batch)
    assert _sig_rows(idx.signatures()) == _sig_rows(minhash_signatures(docs))
    with pytest.raises(ValueError, match="already signed"):
        idx.append(batch.limit(1))


def test_minhash_index_serves_incremental_dedup(spark, tmp_path):
    """dedup_corpus_incremental fed from the live stored signatures
    equals feeding it the freshly computed remainder signatures."""
    from scrappy_spark.operators.dedup_approx import minhash_signatures
    from scrappy_spark.operators.stored_indexes import MinHashIndex
    from scrappy_spark.pipelines import dedup_corpus_incremental

    docs = _load_docs(spark)
    idx = MinHashIndex.build(spark, str(tmp_path / "m"), docs)
    idx.delete([5, 6, 7])
    new = _docs(spark, [(9001, _ALPHA), (9002, _ALPHA + " tail")])
    _, got, _ = dedup_corpus_incremental(new, idx.signatures())
    _, want, _ = dedup_corpus_incremental(
        new, minhash_signatures(docs.filter(~F.col("doc_id").isin(5, 6, 7)))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


# ------------------------------------------------------ privacy release gate


def _gate(spark, rows, k=3, l=2):
    from scrappy_spark.operators.profile import privacy_release_gate

    df = spark.createDataFrame(
        rows, "lang string, source string, n long"
    )
    return {
        (r["gate_check"], r["detail"]): r
        for r in privacy_release_gate(
            df, ["lang", "source"], F.col("n"), k=k, l=l
        ).collect()
    }


def test_release_gate_all_clear_releases(spark):
    rows = [
        ("en", "web", i) for i in range(5)
    ] + [("de", "web", i + 10) for i in range(5)]
    got = _gate(spark, rows)
    release = got[("release", "release")]
    assert release["passed"] == 1 and release["n_at_risk_groups"] == 0
    assert got[("k_anonymity", "k=3")]["passed"] == 1
    assert got[("l_diversity", "l=2")]["passed"] == 1


def test_release_gate_blocks_when_no_candidate_clears(spark):
    # every (lang, source) group is a singleton AND every reduced-QI
    # group is still under k -> no generalization clears, verdict=block
    rows = [("en", "a", 1), ("de", "b", 2), ("fr", "c", 3)]
    got = _gate(spark, rows)
    keys = {k for k in got if k[0] == "release"}
    assert keys == {("release", "block")}
    assert got[("release", "block")]["passed"] == 0
    assert got[("generalize", "lang")]["passed"] == 0
    assert got[("generalize", "source")]["passed"] == 0


def test_release_gate_picks_best_generalization(spark):
    # lang groups are big, source splinters them -> dropping source
    # clears all risk; dropping lang does not (sources are singletons)
    rows = [("en", f"s{i}", i % 2) for i in range(6)] + [
        ("de", f"t{i}", i % 2) for i in range(6)
    ]
    got = _gate(spark, rows)
    assert ("release", "generalize:source") in got
    assert got[("generalize", "source")]["passed"] == 1
    assert got[("generalize", "lang")]["passed"] == 0


def test_gram_ledger_seeded_op_sequence_matches_rebuild(spark, tmp_path):
    """Model-based pin for the refcount algebra: a seeded interleaving
    of append/delete over documents with heavily SHARED content must
    leave the live gram set equal to a fresh index over exactly the
    docs the model says are present — after every vacuum too."""
    import random

    from scrappy_spark.operators.curation import exact_substring_index
    from scrappy_spark.operators.stored_indexes import GramIndex

    markers = [
        ("AAAA SHARED SEGMENT NUMBER ONE " * 2),
        ("BBBB SHARED SEGMENT NUMBER TWO " * 2),
        ("CCCC SHARED SEGMENT NUMBER SIX " * 2),
    ]
    rng = random.Random(11)
    pool = {
        i: markers[i % 3] + markers[(i + 1) % 3][: 40 + 3 * i]
        for i in range(12)
    }

    def frame(ids):
        return _docs(spark, [(i, pool[i]) for i in ids])

    present = set(range(6))
    idx = GramIndex.build(
        spark, str(tmp_path / "g"), frame(sorted(present)), min_len=_L
    )
    free = set(pool) - present
    for step in range(6):
        if step % 2 == 0 and free:
            add = {free.pop()}
            idx.append(frame(sorted(add)))
            present |= add
        elif present:
            victim = {sorted(present)[rng.randrange(len(present))]}
            idx.delete(frame(sorted(victim)))
            present -= victim
        if step == 3:
            idx.vacuum()
        assert _gram_set(idx.grams()) == _gram_set(
            exact_substring_index(frame(sorted(present)), min_len=_L)
        ), f"diverged at step {step} (present={sorted(present)})"


def test_index_gc_reclaims_versions_not_state(spark, tmp_path):
    """vacuum + gc: rows reclaimed by vacuum, superseded VERSIONS
    reclaimed by expire — live state identical afterwards."""
    from scrappy_spark.operators.stored_indexes import (
        GramIndex,
        MinHashIndex,
        gram_index_gc,
        minhash_index_gc,
    )

    docs = _load_docs(spark)
    g = GramIndex.build(spark, str(tmp_path / "g"), docs, min_len=_L)
    g.delete(docs.filter(F.col("doc_id") < 5))
    g.vacuum()
    before = _gram_set(g.grams())
    rep = gram_index_gc(g)
    assert rep["ledger"]["dropped_versions"]  # history reclaimed
    assert _gram_set(g.grams()) == before

    m = MinHashIndex.build(spark, str(tmp_path / "m"), docs)
    m.delete([0, 1])
    m.vacuum()
    sigs_before = _sig_rows(m.signatures())
    rep = minhash_index_gc(m, keep_last=1)
    assert rep["sigs"]["dropped_versions"]
    assert _sig_rows(m.signatures()) == sigs_before


def test_gram_batch_with_duplicate_ids_is_refused(spark, tmp_path):
    """A doc appearing twice in one batch would skew member vs gram
    refcounts (grams count distinct docs, members would count rows) —
    refused loudly in build, append, and delete."""
    from scrappy_spark.operators.stored_indexes import GramIndex

    dup = _docs(spark, [(1, _ALPHA), (1, _ALPHA), (2, _BRAVO)])
    with pytest.raises(ValueError, match="more than once"):
        GramIndex.build(spark, str(tmp_path / "g"), dup, min_len=_L)
    idx = GramIndex.build(
        spark, str(tmp_path / "g2"), _docs(spark, [(2, _BRAVO)]), min_len=_L
    )
    with pytest.raises(ValueError, match="more than once"):
        idx.append(_docs(spark, [(1, _ALPHA), (1, _ALPHA)]))


def test_crashed_build_retry_does_not_bump_versions(spark, tmp_path):
    """A build that crashed after committing tables but before meta
    lands must retry WITHOUT recommitting — resume logic (the declared
    lifecycle queries) keys on version numbers."""
    import os

    from scrappy_spark.operators.stored_indexes import GramIndex, MinHashIndex

    docs = _docs(spark, [(1, _ALPHA), (2, _BRAVO)])
    g = GramIndex.build(spark, str(tmp_path / "g"), docs, min_len=_L)
    os.remove(os.path.join(str(tmp_path / "g"), "meta.json"))  # crash sim
    g2 = GramIndex.build(spark, str(tmp_path / "g"), docs, min_len=_L)
    assert g2.ledger.current_version() == 0
    assert _gram_set(g2.grams()) == _gram_set(g.grams())

    m = MinHashIndex.build(spark, str(tmp_path / "m"), docs)
    os.remove(os.path.join(str(tmp_path / "m"), "meta.json"))
    m2 = MinHashIndex.build(spark, str(tmp_path / "m"), docs)
    assert m2.sigs.current_version() == 0
    assert _sig_rows(m2.signatures()) == _sig_rows(m.signatures())


def test_crashed_build_retry_param_mismatch_refused(spark, tmp_path):
    """ADVICE r11 #3: a retried build over a crashed attempt's
    committed tables must verify it is resuming the SAME build —
    different parameters or a changed corpus would silently pair
    fresh meta with data built under the old parameters."""
    import os

    from scrappy_spark.operators.stored_indexes import GramIndex, MinHashIndex

    docs = _docs(spark, [(1, _ALPHA), (2, _BRAVO)])
    GramIndex.build(spark, str(tmp_path / "g"), docs, min_len=_L)
    os.remove(os.path.join(str(tmp_path / "g"), "meta.json"))  # crash sim
    with pytest.raises(ValueError, match="different parameters"):
        GramIndex.build(spark, str(tmp_path / "g"), docs, min_len=_L + 5)
    other = _docs(spark, [(9, _ALPHA)])
    with pytest.raises(ValueError, match="different parameters"):
        GramIndex.build(spark, str(tmp_path / "g"), other, min_len=_L)
    # the genuine retry still resumes cleanly after the refusals
    g = GramIndex.build(spark, str(tmp_path / "g"), docs, min_len=_L)
    assert g.ledger.current_version() == 0

    MinHashIndex.build(spark, str(tmp_path / "m"), docs, num_hashes=8)
    os.remove(os.path.join(str(tmp_path / "m"), "meta.json"))
    with pytest.raises(ValueError, match="different parameters"):
        MinHashIndex.build(spark, str(tmp_path / "m"), docs, num_hashes=4)
    m = MinHashIndex.build(spark, str(tmp_path / "m"), docs, num_hashes=8)
    assert m.sigs.current_version() == 0


def test_gram_index_rejects_non_integral_ids(spark, tmp_path):
    """ADVICE r11 #5: a string id column would cast to NULL in the
    member rows and collapse the refcount guards — refused loudly at
    build, append and delete."""
    from scrappy_spark.operators.stored_indexes import GramIndex

    sdocs = spark.createDataFrame(
        [("a", _ALPHA), ("b", _BRAVO)], "doc_id string, text string"
    )
    with pytest.raises(ValueError, match="integral id"):
        GramIndex.build(spark, str(tmp_path / "g"), sdocs, min_len=_L)
    idx = GramIndex.build(
        spark, str(tmp_path / "g2"), _docs(spark, [(1, _ALPHA)]), min_len=_L
    )
    with pytest.raises(ValueError, match="integral id"):
        idx.append(sdocs)
    with pytest.raises(ValueError, match="integral id"):
        idx.delete(sdocs)


def test_vacuum_under_append_conflicts_never_loses_the_append(
    spark, tmp_path, monkeypatch
):
    """VERDICT r11 #5: vacuum is a WRITER too — its recommit is a
    replace computed from the head it read at entry, so an append
    landing mid-vacuum must surface a CommitConflict (silently
    publishing the stale compaction would drop the appended batch
    from the live index). The retried vacuum then succeeds against
    the new head with nothing lost."""
    from scrappy_spark.operators.stored_indexes import GramIndex
    from scrappy_spark.sources.snapshots import CommitConflict, SnapshotTable

    docs = _docs(spark, [(1, _ALPHA), (2, _BRAVO)])
    idx = GramIndex.build(spark, str(tmp_path / "g"), docs, min_len=_L)
    late = _docs(spark, [(3, "LATE GAMMA CONTENT MARKER " * 3)])

    orig = SnapshotTable._publish
    state = {"fired": False}

    def publish(self, version, parent, files, message, *a, **k):
        if not state["fired"] and message == "vacuum":
            state["fired"] = True
            idx.append(late)  # lands between vacuum's read and publish
        return orig(self, version, parent, files, message, *a, **k)

    monkeypatch.setattr(SnapshotTable, "_publish", publish)
    with pytest.raises(CommitConflict):
        idx.vacuum()
    # the append survived; a retried vacuum compacts the NEW head
    assert _gram_set(idx.members()) == {1, 2, 3}
    before = _gram_set(idx.grams())
    idx.vacuum()
    assert _gram_set(idx.members()) == {1, 2, 3}
    assert _gram_set(idx.grams()) == before
