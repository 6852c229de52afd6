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
    micro-batch, build a count-min sketch of the batch's tokens and
    persist it PARTITIONED BY batch_id; the cumulative sketch is the
    cell-wise sum over all batch grids (CMS mergeability — the
    build-once/merge-anywhere property the batch query proves), probed
    at the union of every batch's top candidate tokens for the current
    corpus-wide top-``top_k`` report.

    Why this shape instead of one mutable grid: ``foreachBatch`` is
    at-least-once, and additive state double-counts on replay. Keeping
    per-batch grids with dynamic partition overwrite makes a replayed
    batch REWRITE its own partition — idempotent by construction, the
    same trick as ``stream_drift_monitor``'s report rows. Grids are
    tiny (≤ d·w cells each), so state grows by one sketch per batch,
    not with corpus size; compact old partitions by summing them into
    one when batch count matters.

    A CMS alone cannot ENUMERATE frequent keys, only score them, so
    each batch also records its local top-``candidates_per_batch``
    tokens: any corpus-wide heavy hitter is a local heavy hitter in at
    least one batch (counts are non-negative), so probing the union of
    local candidates cannot miss a true global top-k token whose
    weight arrived through candidate-recorded batches.
    """
    from pyspark.sql import functions as F

    from ..operators import cms as CMS
    from ..operators.mining import tokens_col

    grids = f"{state_path}/grids"
    cands = f"{state_path}/candidates"

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        bid = F.lit(batch_id).cast("long")
        toks = batch_df.select(
            F.explode(tokens_col(F.col(text_col))).alias("tok")
        )
        grid = CMS.cms_build(toks, "tok").withColumn("batch_id", bid)
        (
            grid.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(grids)
        )
        local_top = (
            toks.groupBy("tok")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("tok"))
            .limit(candidates_per_batch)
            .select("tok")
            .withColumn("batch_id", bid)
        )
        (
            local_top.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(cands)
        )
        cum = (
            spark.read.parquet(grids)
            .groupBy("row", "pos")
            .agg(F.sum("cnt").alias("cnt"))
        )
        probe = spark.read.parquet(cands).select("tok").distinct()
        report = (
            CMS.cms_estimate(probe, cum, "tok")
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
