"""Distributed total-order ranking and curriculum sharding.

Curriculum learning wants the corpus laid out in a global difficulty
order (easy→hard or a custom score) and cut into fixed-size shards in
that order. The naive Spark spelling —
``row_number().over(Window.orderBy(score))`` — puts an un-partitioned
ordered window on ONE task: fine at sf0.01, a single-executor
sort-of-everything at 100 TB.

``global_rank`` computes the exact same dense 0-based rank with the
classic two-phase scan (same machinery as sharding.assign_shards, but
count-based and multi-column):

1. ``repartitionByRange(orderCols)`` — partitions hold disjoint,
   ordered key ranges; a per-partition ``row_number`` is a cheap local
   sort, parallel across the cluster;
2. per-partition counts (one row per partition) are prefix-summed on a
   tiny n_partitions-row frame and broadcast back as offsets.

The order key must be made unique by appending a tiebreaker column
(callers pass e.g. ``[score, "doc_id"]``) — with ties the rank would
depend on partition placement.

The reference has no ordering beyond pandas ``head(limit)``
(article_querry.py:27); this is an engine extension for training-data
layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_rank(
    df: DataFrame,
    order_by: list[str | Column],
    rank_col: str = "rank",
) -> DataFrame:
    """Exact global 0-based rank in ``order_by`` order, no single-task
    sort. Equivalent to ``row_number() over (order by ...) - 1`` with a
    unique composite key.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    ranged = df.repartitionByRange(*cols).withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid").orderBy(*cols)
    local = ranged.withColumn("__local", F.row_number().over(w_local) - F.lit(1))
    # one row per partition; the prefix sum over the ~n_partitions-row
    # counts frame is a triangular self-join rather than a global-order
    # window — same O(p²) on a tiny frame, but no un-partitioned
    # WindowExec (whose "moving all data to a single partition" warning
    # would be noise here and a real hazard if the frame were data-
    # scale; a join can't silently become one).
    counts = ranged.groupBy("__pid").agg(F.count("*").cast("long").alias("__n"))
    before = counts.select(F.col("__pid").alias("__bpid"), F.col("__n").alias("__bn"))
    offsets = (
        counts.join(before, F.col("__bpid") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__bn"), F.lit(0)).cast("long").alias("__offset"))
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__offset") + F.col("__local")).cast("long"))
        .drop("__pid", "__local", "__offset")
    )


def curriculum_shards(
    df: DataFrame,
    order_by: list[str | Column],
    shard_size: int,
    rank_col: str = "rank",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Cut the corpus into fixed-row-count shards in global ``order_by``
    order: shard 0 holds the ``shard_size`` lowest-ranked rows, etc.
    Every shard except the last is exactly full, and shard boundaries
    are deterministic functions of the data — re-running on the same
    input yields byte-identical shard membership.
    """
    if shard_size <= 0:
        raise ValueError(f"shard_size must be positive, got {shard_size}")
    ranked = global_rank(df, order_by, rank_col=rank_col)
    return ranked.withColumn(
        shard_col, (F.col(rank_col) / F.lit(shard_size)).cast("long")
    )
