"""Streaming ingest into the article store: micro-batch merges keep the
keep-first guarantee; restart from checkpoint does not duplicate."""

import datetime
import shutil
import tempfile

from pyspark.sql import functions as F

from scrappy_spark.schema import ARTICLES_SCHEMA
from scrappy_spark.sources.store import ArticleStore
from scrappy_spark.streaming.sinks import stream_append_parquet, stream_merge_into_store


def _articles(spark, titles_sources):
    rows = [
        (s, t, None, "", [], [[]], [], "t", None, datetime.date(2024, 1, d))
        for t, s, d in titles_sources
    ]
    return spark.createDataFrame(rows, ARTICLES_SCHEMA)


def test_stream_merge_keeps_first_across_batches(spark):
    base = tempfile.mkdtemp(prefix="stream_store_")
    src_dir, ckpt, store_dir = f"{base}/in", f"{base}/ckpt", f"{base}/store"
    try:
        # batch 1 file: alpha from IEEE; batch 2 file: alpha dup + beta
        _articles(spark, [("alpha", "IEEE", 1)]).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        _articles(
            spark, [("alpha", "PubMed", 2), ("beta", "arXiv", 2)]
        ).coalesce(1).write.mode("append").parquet(src_dir)

        store = ArticleStore(spark, store_dir)
        stream = (
            spark.readStream.schema(ARTICLES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = stream_merge_into_store(stream, store, ckpt)
        q.awaitTermination(180)

        rows = {r.title: r.source for r in store.read().collect()}
        assert set(rows) == {"alpha", "beta"}
        # keep-first: the IEEE alpha (earlier batch) must have survived
        assert rows["alpha"] == "IEEE"

        # restart with no new data: checkpoint prevents re-processing
        q2 = stream_merge_into_store(
            spark.readStream.schema(ARTICLES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir),
            store,
            ckpt,
        )
        q2.awaitTermination(60)
        assert store.read().count() == 2
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_append_parquet_partitioned(spark):
    base = tempfile.mkdtemp(prefix="stream_append_")
    try:
        _articles(
            spark, [("a", "IEEE", 1), ("b", "arXiv", 1)]
        ).write.mode("append").parquet(f"{base}/in")
        stream = spark.readStream.schema(ARTICLES_SCHEMA).parquet(f"{base}/in")
        q = stream_append_parquet(
            stream, f"{base}/out", f"{base}/ckpt", partition_by=["source"]
        )
        q.awaitTermination(120)
        out = spark.read.parquet(f"{base}/out")
        assert out.count() == 2
        assert set(r.source for r in out.select("source").collect()) == {"IEEE", "arXiv"}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_dedup_into_corpus_dedups_across_batches(spark):
    import os
    import shutil

    from scrappy_spark.streaming.sinks import stream_dedup_into_corpus

    base = tempfile.mkdtemp(prefix="stream_corpus_")
    src = os.path.join(base, "in")
    corpus = os.path.join(base, "corpus")
    ckpt1 = os.path.join(base, "ck1")
    ckpt2 = os.path.join(base, "ck2")
    try:
        # batch 1: three distinct docs; batch 2: one dup of batch 1,
        # one in-batch exact dup pair, one fresh doc
        b1 = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta"),
             (2, "one two three four five six seven eight nine"),
             (3, "completely different content in the first batch here")],
            "doc_id long, text string",
        )
        b2 = spark.createDataFrame(
            [(10, "alpha beta gamma delta epsilon zeta eta theta"),
             (11, "brand new second batch document with fresh words"),
             (12, "brand new second batch document with fresh words"),
             (13, "another genuinely new document arriving in batch two")],
            "doc_id long, text string",
        )
        b1.coalesce(1).write.parquet(os.path.join(src, "f1"))
        b2.coalesce(1).write.parquet(os.path.join(src, "f2"))
        schema = b1.schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        q = stream_dedup_into_corpus(stream, corpus, ckpt1)
        q.awaitTermination(120)
        docs = spark.read.parquet(os.path.join(corpus, "docs"))
        texts = [r["text"] for r in docs.collect()]
        assert len(texts) == len(set(texts))  # no dup texts survive
        kept = sorted(r["doc_id"] for r in docs.collect())
        assert 1 in kept and 2 in kept and 3 in kept
        assert 10 not in kept            # cross-batch dup dropped
        assert (11 in kept) != (12 in kept)  # one of the in-batch pair
        assert 13 in kept
        n_before = docs.count()
        sig_rows = spark.read.parquet(os.path.join(corpus, "sig")).count()
        assert sig_rows == n_before * 8  # index covers every keeper
        # redelivery with a FRESH checkpoint reprocesses everything —
        # the index already holds the survivors, so nothing re-enters
        stream2 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        q2 = stream_dedup_into_corpus(stream2, corpus, ckpt2)
        q2.awaitTermination(120)
        assert spark.read.parquet(os.path.join(corpus, "docs")).count() == n_before
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_drift_monitor_per_batch_reports(spark, tmp_path):
    """Each micro-batch gets one drift row vs the base corpus, equal to
    the batch-mode token_drift on the same slice."""
    import shutil

    from pyspark.sql import functions as F

    from scrappy_spark.operators.textstats import token_drift
    from scrappy_spark.streaming.sinks import stream_drift_monitor

    base = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(5)], ["doc_id", "text"]
    )
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    batch1 = spark.createDataFrame(
        [(10, "the quick brown fox jumps")], ["doc_id", "text"]
    )  # identical distribution -> zero drift
    batch1.coalesce(1).write.mode("overwrite").parquet(in_dir)

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_drift_monitor(stream, base, out_dir, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir).collect()
    assert len(got1) == 1 and got1[0]["kl_nats"] == 0.0 and got1[0]["oov_new_bp"] == 0

    # a second, shifted batch appends a second report row
    batch2 = spark.createDataFrame([(11, "zzz yyy xxx www")], ["doc_id", "text"])
    batch2.coalesce(1).write.mode("append").parquet(in_dir)
    q2 = stream_drift_monitor(
        spark.readStream.schema(batch1.schema).option("maxFilesPerTrigger", 1).parquet(in_dir),
        base, out_dir, ckpt,
    )
    q2.awaitTermination(120)
    rows = spark.read.parquet(out_dir).orderBy("batch_id").collect()
    assert len(rows) == 2
    expect = token_drift(base, batch2).collect()[0]
    shifted = [r for r in rows if r["oov_new_bp"] == 10000]
    assert len(shifted) == 1 and shifted[0]["vocab_shared"] == expect["vocab_shared"] == 0


def test_stream_heavy_hitters_monitor_matches_batch(spark, tmp_path):
    """Two micro-batches: the final report equals the batch-mode CMS
    over ALL data probed at the union of per-batch candidates, the
    estimates never undercount the exact counts, and the true top
    token leads the report."""
    from pyspark.sql import functions as F

    from scrappy_spark.operators import cms as CMS
    from scrappy_spark.operators.mining import tokens_col
    from scrappy_spark.streaming.sinks import stream_heavy_hitters_monitor

    in_dir, out_dir, state, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "state", "ckpt")
    )
    b1 = spark.createDataFrame(
        [(1, "spark spark spark engine engine scale")], ["doc_id", "text"]
    )
    b2 = spark.createDataFrame(
        [(2, "spark engine engine engine engine shuffle")], ["doc_id", "text"]
    )
    b1.coalesce(1).write.mode("overwrite").parquet(in_dir)
    b2.coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_heavy_hitters_monitor(stream, state, out_dir, ckpt, top_k=5)
    q.awaitTermination(120)

    reports = spark.read.parquet(out_dir)
    last_bid = reports.agg(F.max("batch_id")).first()[0]
    final = {
        r.tok: r.cms_est
        for r in reports.filter(F.col("batch_id") == last_bid).collect()
    }

    # batch-mode replica over all data, probed at the same candidates
    # (the LATEST candidates snapshot is the full tracked set)
    all_docs = b1.unionAll(b2)
    toks = all_docs.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
    grid = CMS.cms_build(toks, "tok")
    snap = spark.read.parquet(f"{state}/candidates")
    last_snap = snap.agg(F.max("batch_id")).first()[0]
    probe = snap.filter(F.col("batch_id") == last_snap).select("tok").distinct()
    expect = {
        r.tok: r.cms_est
        for r in CMS.cms_estimate(probe, grid, "tok")
        .orderBy(F.desc("cms_est"), F.asc("tok"))
        .limit(5)
        .collect()
    }
    assert final == expect
    # cumulative-snapshot state: the latest grid snapshot equals the
    # batch-mode grid over ALL data (cell-wise merge correctness)
    cum = (
        spark.read.parquet(f"{state}/cum")
        .filter(F.col("batch_id") == last_snap)
        .select("row", "pos", "cnt")
    )
    assert {(r.row, r.pos): r.cnt for r in cum.collect()} == {
        (r.row, r.pos): r.cnt for r in grid.collect()
    }

    # never-undercount vs exact counts; true top-1 leads
    exact = {r.tok: r.n for r in toks.groupBy("tok").agg(F.count("*").alias("n")).collect()}
    for tok, est in final.items():
        assert est >= exact[tok]
    assert max(final, key=lambda t: (final[t], )) in ("engine",)  # 5 occurrences


def test_stream_heavy_hitters_token_free_first_batch(spark, tmp_path):
    """A non-empty but token-free first batch (NULL / punctuation-only
    text) must not crash the query or corrupt state: the monitor skips
    it, and the next real batch produces a correct report."""
    from pyspark.sql import functions as F

    from scrappy_spark.streaming.sinks import stream_heavy_hitters_monitor

    in_dir, out_dir, state, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "state", "ckpt")
    )
    b1 = spark.createDataFrame([(1, "!!! ??? ..."), (2, None)], ["doc_id", "text"])
    b1.coalesce(1).write.mode("overwrite").parquet(in_dir)
    b2 = spark.createDataFrame([(3, "alpha alpha beta")], ["doc_id", "text"])
    b2.coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_heavy_hitters_monitor(stream, state, out_dir, ckpt, top_k=3)
    q.awaitTermination(120)
    assert q.exception() is None

    rows = spark.read.parquet(out_dir).collect()
    got = {r.tok: r.cms_est for r in rows}
    assert got == {"alpha": 2, "beta": 1}


def test_minhash_bucket_index_stream_equals_batch_twin(spark):
    """Streaming MinHash index maintenance: three id-ordered micro-
    batches through the applyInPandasWithState bucket index must emit
    exactly the batch twin's (first_doc_id, n_prior) per signature row
    — state carries the bucket's first occupant and count across
    triggers."""
    import os
    import shutil

    from scrappy_spark.operators.dedup_approx import (
        minhash_bucket_hits,
        minhash_signatures_stateless,
    )
    from scrappy_spark.streaming.stateful import minhash_bucket_index

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "one two three four five six seven eight nine"),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
        (10, "one two three four five six seven eight nine ten"),
        (11, "completely fresh words appearing in the second batch"),
        (20, "alpha beta gamma delta epsilon zeta eta theta"),  # dup again
        (21, "one two three four five six seven eight nine"),   # dup of 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    expect = {
        (r.doc_id, r.seed, r.minhash): (r.first_doc_id, r.n_prior)
        for r in minhash_bucket_hits(docs).collect()
    }

    base = tempfile.mkdtemp(prefix="mh_index_")
    src = os.path.join(base, "in")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ck")
    try:
        # id-ordered batches (the operator's arrival-order contract)
        for i, lo_hi in enumerate([(0, 10), (10, 20), (20, 99)]):
            docs.filter(
                (docs.doc_id >= lo_hi[0]) & (docs.doc_id < lo_hi[1])
            ).coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        hits = minhash_bucket_index(minhash_signatures_stateless(stream))
        q = (
            hits.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.doc_id, r.seed, r.minhash): (r.first_doc_id, r.n_prior)
            for r in spark.read.parquet(out).collect()
        }
        assert got == expect
        # sanity: the dups actually produced co-occupied buckets
        n_hit_docs = len(
            {d for (d, _, _), (fd, _) in got.items() if fd is not None}
        )
        assert n_hit_docs >= 3
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_quality_monitor_matches_batch_and_sums(spark, tmp_path):
    """Per-batch expectation reports equal the batch-mode report on the
    same slice; additive kinds sum to the batch-mode count over the
    union; within-batch unique violations are caught."""
    from scrappy_spark.operators.expectations import (
        expect_between,
        expect_not_null,
        expect_unique,
        expectations_report,
    )
    from scrappy_spark.streaming.sinks import stream_quality_monitor

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    b1 = spark.createDataFrame(
        [(1, 10), (2, None), (2, 500)], "k int, v int"
    )  # one null v, one within-batch dup k, one out-of-range v
    b2 = spark.createDataFrame(
        [(1, 20), (3, 30)], "k int, v int"
    )  # k=1 repeats ACROSS batches only
    checks = [
        expect_not_null("v"),
        expect_unique("k"),
        expect_between("v", 0, 100),
    ]
    b1.coalesce(1).write.mode("overwrite").parquet(in_dir)
    b2.coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_quality_monitor(stream, checks, out_dir, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    assert got.count() == 6  # 2 batches x 3 expectations
    per_batch = {
        (r["batch_id"], r["expectation"]): r["n_violations"]
        for r in got.collect()
    }
    batch_ids = sorted({b for b, _ in per_batch})
    # identify which batch_id carried b1 (the 3-row one)
    rows_by_batch = {
        r["batch_id"]: r["n_rows"]
        for r in got.filter(F.col("kind") == "not_null").collect()
    }
    id1 = next(b for b in batch_ids if rows_by_batch[b] == 3)
    id2 = next(b for b in batch_ids if rows_by_batch[b] == 2)

    # each batch report equals batch-mode expectations_report
    for bid, frame in ((id1, b1), (id2, b2)):
        expect = {
            r["expectation"]: r["n_violations"]
            for r in expectations_report(frame, checks).collect()
        }
        for name, n in expect.items():
            assert per_batch[(bid, name)] == n
    # additive kinds sum to the union's batch-mode count
    union = b1.unionByName(b2)
    union_rep = {
        r["expectation"]: r["n_violations"]
        for r in expectations_report(union, checks).collect()
    }
    for name in ("v_not_null", "v_between"):
        assert (
            per_batch[(id1, name)] + per_batch[(id2, name)]
            == union_rep[name]
        )
    # unique: within-batch dup caught in b1; the cross-batch repeat of
    # k=1 is invisible per batch (documented lower bound)
    assert per_batch[(id1, "k_unique")] == 1
    assert per_batch[(id2, "k_unique")] == 0
    assert union_rep["k_unique"] == 2


def test_stream_quality_into_snapshots_commit_log(spark, tmp_path):
    """The snapshot-commit-log quality sink (VERDICT r7 #8): each
    micro-batch's expectation report lands as an append-only snapshot
    version equal to the batch-mode report; the CDC feed reports
    exactly the new batch's verdict rows as added; and a REPLAYED
    batch (same batch_id through a fresh checkpoint) commits nothing —
    the message-dedup idempotency contract."""
    from scrappy_spark.operators.expectations import (
        expect_between,
        expect_not_null,
        expectations_report,
    )
    from scrappy_spark.sources.snapshots import SnapshotTable
    from scrappy_spark.streaming.sinks import stream_quality_into_snapshots

    in_dir, ckpt, ckpt2, tbl = (
        str(tmp_path / d) for d in ("in", "ckpt", "ckpt2", "tbl")
    )
    suite = [expect_not_null("v"), expect_between("v", 0, 10)]
    table = SnapshotTable(spark, tbl)
    day0 = spark.createDataFrame([(1, 5), (2, None)], "id long, v int")
    day1 = spark.createDataFrame([(3, 99), (4, 7)], "id long, v int")

    for day_df in (day0, day1):
        day_df.coalesce(1).write.mode("append").parquet(in_dir)
        stream = (
            spark.readStream.schema(day_df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        stream_quality_into_snapshots(
            stream, suite, table, ckpt
        ).awaitTermination()

    assert table.current_version() == 1
    hist = {
        (r.batch_id, r.expectation): r for r in table.read(1).collect()
    }
    assert len(hist) == 4  # 2 checks x 2 batches, append preserved v0
    # per-batch report equals batch mode
    for bid, df in ((0, day0), (1, day1)):
        batch_mode = {
            r.expectation: r for r in expectations_report(df, suite).collect()
        }
        for name, want in batch_mode.items():
            got = hist[(bid, name)]
            assert (got.n_rows, got.n_violations, got.passed) == (
                want.n_rows, want.n_violations, want.passed,
            )
    assert hist[(0, "v_not_null")].n_violations == 1
    assert hist[(1, "v_between")].n_violations == 1
    # CDC: exactly batch 1's rows are added, nothing changed/removed
    cdc = table.row_diff(0, 1, ["expectation", "batch_id"]).collect()
    assert {(r.expectation, r.batch_id, r.change) for r in cdc} == {
        ("v_not_null", 1, "added"), ("v_between", 1, "added"),
    }
    # replay: a FRESH checkpoint re-delivers batches 0 and 1; the
    # message-dedup guard must skip both (no new versions)
    stream = (
        spark.readStream.schema(day0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    stream_quality_into_snapshots(
        stream, suite, table, ckpt2
    ).awaitTermination()
    assert table.current_version() == 1

    # ADVICE r8 #3: a stream legitimately RESTARTED with a fresh
    # checkpoint over NEW input restarts batch_id at 0 — its genuinely
    # new verdicts must COMMIT, not dedup as "replays" of old batch 0.
    # The content fingerprint in the commit message distinguishes them.
    in2, ckpt3 = str(tmp_path / "in2"), str(tmp_path / "ckpt3")
    day2 = spark.createDataFrame([(5, None), (6, None)], "id long, v int")
    day2.coalesce(1).write.parquet(in2)
    stream = (
        spark.readStream.schema(day2.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in2)
    )
    stream_quality_into_snapshots(
        stream, suite, table, ckpt3
    ).awaitTermination()
    assert table.current_version() == 2  # new content committed
    v2 = {
        r.expectation: r
        for r in table.read(2).filter("batch_id = 0").collect()
    }
    # the log now holds all three runs' verdicts (append-only): day0's
    # 1 violation, day1's 0, day2's 2 — the restarted run's batch_id 0
    # coexists with the original batch 0 instead of shadowing it
    assert {r.n_violations for r in table.read(2).collect()
            if r.expectation == "v_not_null"} == {0, 1, 2}
    assert v2  # non-empty read-back at the new head


def test_xs_gram_index_stream_equals_batch_twin(spark):
    """Streaming ExactSubstr gram-index maintenance: id-ordered
    micro-batches through the applyInPandasWithState gram index must
    emit exactly the batch twin's (first_source_doc, n_prior) per
    window occurrence — state carries each gram's minimum (doc, pos)
    key and occurrence count across triggers."""
    import os

    from scrappy_spark.operators.curation import _lgram_stage, xs_gram_hits
    from scrappy_spark.streaming.stateful import xs_gram_index

    L = 10
    shared = "SHARED-SUBSTRING-CONTENT"
    rows = [
        (1, "first doc with " + shared),
        (2, "totally different content here"),
        (10, shared + " appears again later"),           # batch 2
        (11, "more fresh second batch words"),
        (20, "third batch repeats " + shared + " too"),  # batch 3
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    expect = {
        (r.doc_id, r.q): (r.gram, r.first_source_doc, r.n_prior)
        for r in xs_gram_hits(docs, min_len=L).collect()
    }
    assert any(v[2] > 0 for v in expect.values())  # real cross-batch hits

    base = tempfile.mkdtemp(prefix="xs_index_")
    src, out, ckpt = (os.path.join(base, d) for d in ("in", "out", "ck"))
    try:
        for i, (lo, hi) in enumerate([(0, 10), (10, 20), (20, 99)]):
            docs.filter(
                (docs.doc_id >= lo) & (docs.doc_id < hi)
            ).coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        g, _ = _lgram_stage(stream, L, "doc_id", "text")
        q = (
            xs_gram_index(g)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.doc_id, r.q): (r.gram, r.first_source_doc, r.n_prior)
            for r in spark.read.parquet(out).collect()
        }
        assert got == expect
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_embedding_bucket_index_stream_equals_batch_twin(spark):
    """Streaming ANN index maintenance (the third bucket-index family
    member): id-ordered micro-batches of quantized vectors through the
    state kernel must emit exactly the batch twin's
    (first_vec_id, n_prior) per (vector, table) row."""
    import os

    from pyspark.sql import functions as F

    from scrappy_spark.io import load_table
    from scrappy_spark.operators.similarity import (
        embedding_bucket_hits,
        embedding_bucket_rows,
        quantize_int8,
    )
    from scrappy_spark.streaming.stateful import embedding_bucket_index

    vecs = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .filter(F.col("vec_id") < 60)
        .select("vec_id", "embedding")
    )
    codes = quantize_int8(vecs).select("vec_id", "codes")
    kw = dict(n_planes=8, n_tables=4, seed=7, vec_col="codes", dim=64)
    expect = {
        (r.vec_id, r.t): (r.bkt, r.first_vec_id, r.n_prior)
        for r in embedding_bucket_hits(codes, **kw).collect()
    }
    assert any(v[2] > 0 for v in expect.values())  # real cell collisions

    base = tempfile.mkdtemp(prefix="emb_index_")
    src, out, ckpt = (os.path.join(base, d) for d in ("in", "out", "ck"))
    try:
        for i, (lo, hi) in enumerate([(0, 20), (20, 40), (40, 99)]):
            codes.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            ).coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
        stream = (
            spark.readStream.schema(codes.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        q = (
            embedding_bucket_index(embedding_bucket_rows(stream, **kw))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.vec_id, r.t): (r.bkt, r.first_vec_id, r.n_prior)
            for r in spark.read.parquet(out).collect()
        }
        assert got == expect
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_append_into_snapshot_prunes_and_takedown_composes(
    spark, tmp_path
):
    """Micro-batches land as snapshot versions with manifest stats
    (pruned reads work on a STREAM-BUILT table), a replayed batch
    dedups, and a row-level takedown scopes only the landed files."""
    from scrappy_spark.sources.snapshots import SnapshotTable
    from scrappy_spark.streaming.sinks import stream_append_into_snapshot

    src = str(tmp_path / "in")
    for lo, hi in [(0, 10), (10, 20), (20, 30)]:
        spark.range(lo, hi).selectExpr(
            "id AS k", "concat('v', id) AS v"
        ).coalesce(1).write.mode("append").parquet(src)

    table = SnapshotTable(spark, str(tmp_path / "t"))
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_append_into_snapshot(
        stream, table, str(tmp_path / "ckpt"), stats_cols=["k"]
    )
    q.awaitTermination(180)

    assert table.current_version() == 2  # one version per micro-batch
    assert sorted(r.k for r in table.read().collect()) == list(range(30))
    # stats landed per batch: the pruned read skips two of three files
    rep = table.prune_report(("k", "between", (12, 17)))
    assert rep["n_read"] == 1 and rep["n_files"] == 3
    # restart over the SAME checkpoint: nothing re-commits
    q2 = stream_append_into_snapshot(
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        table,
        str(tmp_path / "ckpt"),
        stats_cols=["k"],
    )
    q2.awaitTermination(180)
    assert table.current_version() == 2
    # takedown composes on the stream-built table
    table.delete_where(("k", "between", (10, 19)))
    assert sorted(r.k for r in table.read().collect()) == [
        *range(10), *range(20, 30)
    ]


def test_stream_takedown_propagates_across_all_artifacts(spark, tmp_path):
    """Right-to-be-forgotten capstone: a stream of takedown requests
    clears the corpus snapshot (row delete), the gram ledger
    (refcount negation), and the MinHash signatures (tombstones) —
    and a full redelivery with a fresh checkpoint leaves every
    artifact unchanged (per-leg guards)."""
    from pyspark.sql import functions as F

    from scrappy_spark.operators.curation import exact_substring_index
    from scrappy_spark.operators.dedup_approx import minhash_signatures
    from scrappy_spark.operators.stored_indexes import GramIndex, MinHashIndex
    from scrappy_spark.sources.snapshots import SnapshotTable
    from scrappy_spark.streaming.sinks import stream_takedown

    marker = "STREAM TAKEDOWN SHARED MARKER SEGMENT "
    docs = spark.createDataFrame(
        [(i, marker + f"tail {i} " * 4) for i in range(20)],
        "doc_id long, text string",
    )
    corpus = SnapshotTable(spark, str(tmp_path / "corpus"))
    corpus.commit(docs.coalesce(1), stats_cols=["doc_id"])
    gram = GramIndex.build(spark, str(tmp_path / "gram"), docs, min_len=30)
    mh = MinHashIndex.build(spark, str(tmp_path / "mh"), docs)

    src = str(tmp_path / "req")
    spark.createDataFrame([(3,), (4,)], "doc_id long").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame([(4,), (11,)], "doc_id long").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run(ckpt):
        q = stream_takedown(
            spark.readStream.schema("doc_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            corpus,
            gram_index=gram,
            minhash_index=mh,
            checkpoint_dir=str(tmp_path / ckpt),
        )
        q.awaitTermination(180)

    run("ckpt1")

    remainder = docs.filter(~F.col("doc_id").isin(3, 4, 11))
    assert sorted(r.doc_id for r in corpus.read().collect()) == [
        i for i in range(20) if i not in (3, 4, 11)
    ]
    want_grams = {
        r[0] for r in exact_substring_index(remainder, min_len=30).collect()
    }
    assert {r[0] for r in gram.grams().collect()} == want_grams
    want_sigs = sorted(map(tuple, minhash_signatures(remainder).collect()))
    assert sorted(map(tuple, mh.signatures().collect())) == want_sigs

    # full redelivery with a FRESH checkpoint: every leg no-ops
    run("ckpt2")
    assert sorted(r.doc_id for r in corpus.read().collect()) == [
        i for i in range(20) if i not in (3, 4, 11)
    ]
    assert {r[0] for r in gram.grams().collect()} == want_grams
    assert sorted(map(tuple, mh.signatures().collect())) == want_sigs


def test_stream_ingest_and_takedown_compose_with_conflict_retry(
    spark, tmp_path, monkeypatch
):
    """VERDICT r11 #1 adoption: a streaming ingest sink and a takedown
    stream target ONE snapshot table. The ingest's append commits
    rebase internally; the takedown's key delete is raced by a
    concurrent append (injected deterministically) and must retry
    under _retry_conflicts — final state loses neither the late
    append nor the takedown."""
    from pyspark.sql import functions as F

    from scrappy_spark.sources.snapshots import SnapshotTable
    from scrappy_spark.streaming.sinks import (
        stream_append_into_snapshot,
        stream_takedown,
    )

    src = str(tmp_path / "in")
    for lo, hi in [(0, 10), (10, 20)]:
        spark.range(lo, hi).selectExpr(
            "id AS doc_id", "concat('v', id) AS v"
        ).coalesce(1).write.mode("append").parquet(src)

    table = SnapshotTable(spark, str(tmp_path / "t"))
    q = stream_append_into_snapshot(
        spark.readStream.schema("doc_id long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        table,
        str(tmp_path / "ckpt_ingest"),
        stats_cols=["doc_id"],
    )
    q.awaitTermination(180)
    assert sorted(r.doc_id for r in table.read().collect()) == list(range(20))

    # inject one concurrent append right before the takedown's key
    # delete publishes — the retry path must rebase, not lose it
    orig = SnapshotTable._publish
    state = {"fired": False}

    def publish(self, version, parent, files, message, *a, **k):
        if not state["fired"] and message.startswith("delete keys"):
            state["fired"] = True
            table.commit(
                spark.range(90, 93)
                .selectExpr("id AS doc_id", "concat('v', id) AS v")
                .coalesce(1),
                "late concurrent append",
                append=True,
            )
        return orig(self, version, parent, files, message, *a, **k)

    monkeypatch.setattr(SnapshotTable, "_publish", publish)

    req = str(tmp_path / "req")
    spark.createDataFrame(
        [(3,), (15,)], "doc_id long"
    ).coalesce(1).write.mode("append").parquet(req)
    qt = stream_takedown(
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(req),
        table,
        checkpoint_dir=str(tmp_path / "ckpt_td"),
    )
    qt.awaitTermination(180)
    assert state["fired"]  # the race actually happened
    got = sorted(r.doc_id for r in table.read().collect())
    want = [i for i in range(20) if i not in (3, 15)] + [90, 91, 92]
    assert got == want  # takedown applied AND the late append survived


def test_stream_append_into_snapshot_branch(spark, tmp_path):
    """The streaming ingest sink composes with refs: pass a
    branch-scoped handle and micro-batches land as BRANCH versions —
    main never moves, and the consumer pattern (read_incremental on
    the branch) sees each batch exactly once."""
    from scrappy_spark.sources.snapshots import SnapshotTable
    from scrappy_spark.streaming.sinks import stream_append_into_snapshot

    src = str(tmp_path / "in")
    for lo, hi in [(0, 10), (10, 20)]:
        spark.range(lo, hi).selectExpr("id AS k").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    table = SnapshotTable(spark, str(tmp_path / "t"))
    table.commit(spark.range(100, 105).selectExpr("id AS k"), "main v0")
    dev = table.create_branch("ingest")
    q = stream_append_into_snapshot(
        spark.readStream.schema("k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        dev,
        str(tmp_path / "ckpt"),
        stats_cols=["k"],
    )
    q.awaitTermination(180)
    assert table.current_version() == 0  # main untouched
    assert dev.current_version() == 2  # fork + 2 micro-batches
    assert sorted(r.k for r in dev.read().collect()) == (
        list(range(20)) + list(range(100, 105))
    )
    # changes since the fork = exactly the streamed rows
    assert sorted(r.k for r in dev.read_incremental(0).collect()) == list(
        range(20)
    )
