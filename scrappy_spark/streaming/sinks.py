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
