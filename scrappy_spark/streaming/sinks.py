"""Streaming sinks: incremental ingest into the article store and
checkpointed append sinks.

``foreachBatch`` is the bridge between Structured Streaming and the
engine's batch merge semantics: each micro-batch runs the SAME
keep-first merge the batch path uses (M1), so a continuously-arriving
article feed gets the identical "existing wins, never delete"
guarantee. Checkpointing makes delivery effectively exactly-once: a
replayed batch re-merges the same rows and the merge is idempotent —
the property the Hypothesis suite pins down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.store import ArticleStore


def _retry_conflicts(fn, attempts: int = 5):
    """Bounded re-run for a snapshot operation raced by a concurrent
    writer (``CommitConflict``): each re-run reads the head at entry,
    so the re-run IS the rebase. Safe exactly because every streaming
    leg is idempotent per batch (the per-leg guards filter the request
    to ids the artifact still holds). Appends need no wrapper —
    ``SnapshotTable.commit(append=True)`` rebases internally."""
    from ..sources.snapshots import CommitConflict

    for i in range(attempts):
        try:
            return fn()
        except CommitConflict:
            if i == attempts - 1:
                raise


def stream_merge_into_store(
    stream: DataFrame,
    store: ArticleStore,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Merge every micro-batch of an articles-shaped stream into the
    store. Returns the started StreamingQuery."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.merge(batch_df)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_append_parquet(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    trigger_available_now: bool = True,
):
    """Plain append sink with checkpointed exactly-once file commits
    (the raw-event archival path: no merge, just durable append)."""
    writer = (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_into_corpus(
    stream: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Continuously deduplicated corpus ingestion: every micro-batch of
    documents runs the INCREMENTAL dedup pipeline against the stored
    signature index, appends only the surviving rows to
    ``{corpus_dir}/docs``, and appends the survivors' signatures to
    ``{corpus_dir}/sig`` — so each batch dedups against everything
    ever accepted (exact dups, near dups, and near-dups of prior
    batches all drop), while base text is never re-read.

    This is the streaming face of ``pipelines.dedup_corpus_incremental``
    (same stages, same verdicts); the signature index IS the state, and
    it lives in storage rather than stream state — unbounded corpora
    can't keep dedup state in the state store (watermarked
    ``dropDuplicates`` ages it out by design; corpus identity must
    not age out). Checkpointing makes redelivery effectively
    exactly-once: a replayed batch re-dedups against an index that
    already contains its survivors, so every row drops as
    ``dup_of_base`` — idempotent by construction (tested).

    Returns the started StreamingQuery.
    """
    import os

    from ..pipelines import dedup_corpus_incremental

    docs_path = os.path.join(corpus_dir, "docs")
    sig_path = os.path.join(corpus_dir, "sig")

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if os.path.exists(sig_path):
            base_sig = spark.read.parquet(sig_path)
        else:
            base_sig = spark.createDataFrame(
                [], f"{id_col} long, seed int, minhash long"
            )
        # Exactly-once by id FIRST: a redelivered row carries the same
        # id as its indexed twin, and the pair stage's id_a < id_b
        # cannot pair a doc with itself — so drop already-indexed ids
        # before content dedup (also keeps new/base id spaces
        # disjoint, which the union-tagged pair stage requires).
        batch_df = batch_df.join(
            base_sig.select(id_col).distinct(), id_col, "left_anti"
        )
        if batch_df.isEmpty():
            return
        cleaned, _, sig_out = dedup_corpus_incremental(
            batch_df, base_sig, id_col=id_col, text_col=text_col
        )
        # Materialize survivors BEFORE either write: both outputs
        # derive from the same frame, and the docs append must not
        # race the sig append's recompute.
        cleaned = cleaned.localCheckpoint()
        cleaned.write.mode("append").parquet(docs_path)
        sig_out.write.mode("append").parquet(sig_path)

    writer = (
        stream.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_drift_monitor(
    stream: DataFrame,
    base: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Live-ingest distribution monitoring: every micro-batch is
    scored against a REFERENCE corpus with ``token_drift`` (unigram
    KL + OOV mass) and the one-row report is appended to ``out_path``
    keyed by batch_id — the streaming leg of the drift family
    (batch ``token_drift`` → incremental index → live monitor).

    The reference vocabulary is recomputed lazily per batch from
    ``base``; cache/checkpoint ``base`` (or pass a pre-aggregated
    vocab frame downstream) for long-running streams — the batch-side
    agg is vocab-sized either way. A drift spike in the report is the
    pipeline's earliest signal that a crawl source changed character
    (spam flood, language shift, template change) BEFORE the data
    reaches curation.
    """
    from pyspark.sql import functions as F

    from ..operators.textstats import token_drift

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        report = token_drift(base, batch_df, text_col=text_col).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        # foreachBatch is at-least-once: a replayed batch must REPLACE
        # its own batch_id partition, not append a duplicate row —
        # dynamic partition overwrite touches only that partition.
        (
            report.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    writer = (
        stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_heavy_hitters_monitor(
    stream: DataFrame,
    state_path: str,
    out_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    top_k: int = 20,
    candidates_per_batch: int = 40,
    trigger_available_now: bool = True,
):
    """Live heavy-hitter tracking over a document stream: per
    micro-batch, build a count-min sketch of the batch's tokens, merge
    it cell-wise into the running sketch (CMS mergeability — the
    build-once/merge-anywhere property the batch query proves), and
    probe the merged sketch at the tracked candidate set for the
    current corpus-wide top-``top_k`` report.

    State is a CUMULATIVE SNAPSHOT per batch, partitioned by batch_id:
    ``state/cum`` holds the merged grid after each batch (≤ d·w cells
    every snapshot) and ``state/candidates`` the tracked token set.
    Each batch reads only its predecessor snapshot (the max batch_id
    below its own) and writes its own partition via dynamic partition
    overwrite — so per-batch work is O(d·w + |candidates|), constant
    in stream age, and a replayed batch (foreachBatch is
    at-least-once) REWRITES its own snapshot from the unchanged
    predecessor instead of double-adding: idempotent by construction.
    Snapshots older than the predecessor are dead and can be deleted
    by any retention sweep; the monitor never reads them again.

    Candidate tracking is the standard CMS limitation made explicit: a
    sketch can SCORE any key but cannot ENUMERATE frequent keys, so
    each batch adds its local top-``candidates_per_batch`` tokens to
    the tracked set. A token is reported only if it entered candidacy
    in some batch — an adversarial distribution that keeps a globally
    heavy token below every batch's local top-C evades the report
    (its sketch count is still correct, it just isn't probed). Raise
    ``candidates_per_batch`` (cost is linear in C) to tighten recall;
    guaranteed enumeration needs a different summary (e.g.
    SpaceSaving) or a second pass over the corpus.
    """
    from pyspark.sql import functions as F

    from ..operators import cms as CMS
    from ..operators.mining import tokens_col

    cum_dir = f"{state_path}/cum"
    cands = f"{state_path}/candidates"

    def _prev(spark, path: str, batch_id: int, cols: list[str]) -> DataFrame | None:
        """Latest snapshot strictly older than ``batch_id``, or None.

        Only a missing state directory means "first batch". Any other
        read failure (transient filesystem error, corrupt snapshot)
        must PROPAGATE so Structured Streaming retries the batch —
        swallowing it would silently reset the cumulative grid and
        undercount every batch from then on.
        """
        from pyspark.errors import AnalysisException

        try:
            snap = spark.read.parquet(path)
        except AnalysisException as exc:  # first batch: no state dir yet
            if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
                return None
            raise
        prev_id = (
            snap.filter(F.col("batch_id") < batch_id)
            .agg(F.max("batch_id"))
            .first()[0]
        )
        if prev_id is None:
            return None
        return snap.filter(F.col("batch_id") == prev_id).select(*cols)

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        bid = F.lit(batch_id).cast("long")
        toks = batch_df.select(
            F.explode(tokens_col(F.col(text_col))).alias("tok")
        )
        if toks.isEmpty():
            # Token-free batch (NULL / non-alphanumeric text): state is
            # unchanged, and writing an empty grid partition would
            # leave an unreadable schema-less directory on batch 0.
            return
        grid = CMS.cms_build(toks, "tok")
        prev_cum = _prev(spark, cum_dir, batch_id, ["row", "pos", "cnt"])
        cum = (
            grid if prev_cum is None else grid.unionAll(prev_cum)
        ).groupBy("row", "pos").agg(F.sum("cnt").alias("cnt"))
        (
            cum.withColumn("batch_id", bid)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(cum_dir)
        )
        local_top = (
            toks.groupBy("tok")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("tok"))
            .limit(candidates_per_batch)
            .select("tok")
        )
        prev_cands = _prev(spark, cands, batch_id, ["tok"])
        tracked = (
            local_top
            if prev_cands is None
            else local_top.unionAll(prev_cands)
        ).distinct()
        (
            tracked.withColumn("batch_id", bid)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(cands)
        )
        # Re-read this batch's own snapshots so the report runs off the
        # committed state (and stays correct on replay).
        cum_now = spark.read.parquet(cum_dir).filter(F.col("batch_id") == batch_id)
        probe = spark.read.parquet(cands).filter(F.col("batch_id") == batch_id)
        report = (
            CMS.cms_estimate(probe.select("tok"), cum_now.select("row", "pos", "cnt"), "tok")
            .orderBy(F.desc("cms_est"), F.asc("tok"))
            .limit(top_k)
            .withColumn("batch_id", bid)
        )
        (
            report.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    writer = (
        stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_quality_monitor(
    stream: DataFrame,
    expectations: list,
    out_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Continuous data-quality gate: every micro-batch runs the SAME
    declarative expectation suite as the batch gate
    (``operators/expectations.py::expectations_report`` — one
    groupBy-less agg per batch) and lands one report row per
    expectation, keyed by batch_id, via dynamic partition overwrite —
    so a replayed batch (foreachBatch is at-least-once) REWRITES its
    own partition instead of appending a duplicate: idempotent by
    construction.  This is the streaming leg of the expectations
    family: declare the contract once, gate both the backfill and the
    live ingest with it, and alert on ``passed = 0`` rows in the
    report stream.

    Cross-batch semantics: every row-local kind (not_null /
    accepted_values / between / regex / expr) is additive — summing
    ``n_violations`` over batch_ids equals the batch-mode count over
    the union.  ``unique`` is the exception: per-batch surplus counts
    only see WITHIN-batch duplicates, so their sum lower-bounds the
    global count (a key repeated once per batch looks clean).  For a
    global uniqueness gate keep a key index as state (the
    ``stream_dedup_into_corpus`` shape) or run the batch report.
    """
    from pyspark.sql import functions as F

    from ..operators.expectations import expectations_report

    def report_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        report = expectations_report(batch_df, expectations).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        (
            report.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    writer = (
        stream.writeStream.foreachBatch(report_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_quality_into_snapshots(
    stream: DataFrame,
    expectations: list,
    table,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Continuous quality gate writing into a VERSIONED commit log
    (VERDICT r7 #8): every micro-batch runs the declarative expectation
    suite (``operators/expectations.py::expectations_report`` — one
    groupBy-less agg) and COMMITS its report as the next version of a
    ``sources.snapshots.SnapshotTable`` (``append=True``: prior
    verdicts are referenced, never rewritten), so the quality history
    is time-travelable and its CDC feed (``row_diff``) answers "which
    expectation changed status in this batch" — the operational loop a
    100 TB pipeline runs against its ingest.

    Idempotent under foreachBatch's at-least-once replay: each commit
    message carries the batch_id AND an order-insensitive content
    fingerprint of the batch's report rows, and a batch whose message
    already exists in the manifest log is skipped. Keying on batch_id
    alone (the first cut; ADVICE r8 #3) silently dropped real verdicts:
    a stream legitimately RESTARTED with a fresh checkpoint over new
    input restarts batch_id at 0, so its genuinely new reports looked
    like replays. With the fingerprint, only a true replay (same id,
    same verdict content) dedups; identical-content skips commit no
    information either way.
    """
    from pyspark.sql import functions as F

    from ..operators.expectations import expectations_report

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        report = expectations_report(batch_df, expectations).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        # order-insensitive fingerprint: sum of per-row md5-prefix ints
        # over the canonical (sorted-column) JSON of each report row —
        # one tiny agg over |expectations| rows.
        canon = F.to_json(F.struct(*sorted(report.columns)))
        fp_row = report.agg(
            F.coalesce(
                F.sum(F.conv(F.substring(F.md5(canon), 1, 14), 16, 10).cast("long")),
                F.lit(0),
            ).alias("fp")
        ).first()
        msg = f"quality batch {batch_id} fp={fp_row['fp']}"
        if any(v.get("message") == msg for v in table.versions()):
            return  # true replay: same batch, same verdict content
        table.commit(
            report, message=msg, append=table.current_version() is not None
        )

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_append_into_snapshot(
    stream: DataFrame,
    table,
    checkpoint_dir: str,
    stats_cols: list[str] | None = None,
    trigger_available_now: bool = True,
):
    """Stream DATA straight into a versioned ``SnapshotTable``: every
    micro-batch append-commits (prior files referenced, never
    rewritten — the O(1)-commit ingest shape), so a stream-built table
    is immediately time-travelable, CDC-diffable, ROW-DELETABLE
    (takedown composes: entries scope the files already landed, later
    batches are outside them), and — with ``stats_cols`` — pruned-
    readable: each batch's files get [min, max] manifest stats from
    their footers as they land, and ``read(where=...)`` skips landed
    batches the predicate cannot touch.

    Idempotent under foreachBatch's at-least-once replay by the
    ``stream_quality_into_snapshots`` contract: the commit message
    carries batch_id plus an order-insensitive content fingerprint
    (one extra agg scan per batch — micro-batch-sized), so a true
    replay skips while a fresh-checkpoint restart over new data still
    commits. The seen-message set is read from the manifests ONCE at
    sink start and maintained in the closure — a long-lived ingest
    stream pays O(1) dedup per batch, not a full manifest-log scan
    (which would make the sink quadratic in committed versions).

    Concurrency-safe by construction: every data commit is an append,
    and ``SnapshotTable.commit(append=True)`` detects a concurrent
    writer at the manifest link and rebases onto the new head — so
    this sink, a takedown stream, and a compaction can all target ONE
    table without lost updates (VERDICT r11 #1). Returns the started
    StreamingQuery.
    """
    from pyspark.sql import functions as F

    seen = {v.get("message") for v in table.versions()}

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        canon = F.to_json(F.struct(*sorted(batch_df.columns)))
        fp_row = batch_df.agg(
            F.coalesce(
                F.sum(
                    F.conv(F.substring(F.md5(canon), 1, 14), 16, 10).cast(
                        "long"
                    )
                ),
                F.lit(0),
            ).alias("fp")
        ).first()
        msg = f"stream batch {batch_id} fp={fp_row['fp']}"
        if msg in seen:
            return  # true replay: same batch, same content
        seen.add(msg)
        table.commit(
            batch_df,
            message=msg,
            append=table.current_version() is not None,
            stats_cols=stats_cols,
        )

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_takedown(
    requests: DataFrame,
    corpus_table,
    gram_index=None,
    minhash_index=None,
    ann_index=None,
    checkpoint_dir: str = None,
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
):
    """The right-to-be-forgotten pipeline: a stream of takedown
    requests (one ``id_col`` column) propagated across EVERY stored
    artifact that knows the document — the capstone composing the
    per-artifact delete designs (ARCHITECTURE.md, round-11 design
    notes):

    - the corpus ``SnapshotTable`` gets a key-list row delete
      (merge-on-read, O(request), scoped to landed files);
    - the ``GramIndex`` gets its refcount negation — the doc text is
      resolved FROM the corpus snapshot as it still stands in this
      batch (the index stores no text), so the corpus delete is
      sequenced after the gram retraction;
    - the ``MinHashIndex`` and ``IvfPqIndex`` get tombstone appends.

    Idempotent under replay PER LEG, not by one global guard: each
    artifact filters the request down to ids it still holds before
    mutating (gram → its live members; corpus → rows still present;
    tombstone legs are naturally idempotent — duplicate tombstones
    against absent rows are inert and distinct-ed at read), so a
    crash between legs re-runs the batch and the already-deleted legs
    no-op — partial progress is safe, not ambiguous. Leg ORDER is the
    one correctness constraint: the gram retraction reads the doc
    TEXT from the corpus snapshot (the index stores no text), so it
    runs before the corpus row delete. Requests are takedown-sized —
    id lists are collected driver-side (bounded, the same
    request-scale argument as every delete leg). Concurrent writers on
    the same artifacts are safe: the tombstone/ledger legs are
    appends (rebase internally) and the corpus key delete re-runs
    under ``_retry_conflicts`` (re-reading the head IS its rebase), so
    takedown composes with a live ingest stream on one table. Returns
    the started StreamingQuery.
    """
    from pyspark.sql import functions as F

    def takedown_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ids = batch_df.select(id_col).distinct()
        if gram_index is not None:
            gram_live = ids.join(
                gram_index.members().withColumnRenamed("doc_id", id_col),
                id_col,
                "left_semi",
            )
            live_ids = [r[0] for r in gram_live.collect()]  # request-sized
            if live_ids:
                docs = corpus_table.read().join(
                    F.broadcast(gram_live), id_col, "left_semi"
                )
                # loud-fail, never silently retain: a live gram member
                # whose corpus row is already gone (out-of-band corpus
                # delete) cannot have its grams retracted — the text is
                # the only source of the negation deltas
                missing = set(live_ids) - {
                    r[0] for r in docs.select(id_col).collect()
                }
                if missing:
                    raise ValueError(
                        f"stream_takedown: docs {sorted(missing)[:5]} are "
                        "live in the gram index but absent from the corpus "
                        "— their text is unrecoverable, so the gram "
                        "retraction cannot proceed (restore the corpus "
                        "rows or rebuild the gram index)"
                    )
                gram_index.delete(docs)
        id_list = [r[0] for r in ids.collect()]  # request-sized
        if minhash_index is not None:
            minhash_index.delete(id_list)
        if ann_index is not None:
            ann_index.delete(id_list)
        corpus_live = ids.join(
            corpus_table.read().select(id_col), id_col, "left_semi"
        )
        if corpus_live.limit(1).count():
            # delete_keys re-reads the head on each run, so a re-run
            # after a conflict (e.g. the ingest sink appending to the
            # same table) rebases the scope onto the new head
            _retry_conflicts(
                lambda: corpus_table.delete_keys(corpus_live, [id_col])
            )

    writer = (
        requests.writeStream.foreachBatch(takedown_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
