"""Size-bounded shard assignment via a distributed prefix sum.

Export jobs (training-data shards, archive files) want output files of
~equal byte size in a deterministic key order. That is a running
cumulative sum over the whole corpus — which, written naively as
``sum().over(Window.orderBy(key))``, collapses ALL rows into a single
partition (Spark puts an un-partitioned ordered window on one task):
correct at sf0.01, dead at 100 TB.

``assign_shards`` computes the same cumulative sum with the classic
two-phase scan:

1. ``repartitionByRange(key)`` so partitions hold disjoint key ranges
   in order; within each partition a per-partition window cumsum (cheap
   local sort, no single-task bottleneck);
2. per-partition totals (``spark_partition_id`` groupBy — one row per
   partition) are prefix-summed on a table of n_partitions rows and
   broadcast back, giving each partition its global byte offset.

Total cost: one range shuffle + one tiny agg + one broadcast join —
every stage parallel over the full cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assign_shards(
    df: DataFrame,
    size_col: str,
    shard_bytes: int,
    key: str = "doc_id",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Assign each row to ``floor(prefix_sum_before_row / shard_bytes)``
    in ascending ``key`` order (ties impossible: ``key`` must be
    unique). The first row of every shard starts at offset 0 of that
    shard, so no shard except the last is underfull by more than one
    document.
    """
    ranged = df.repartitionByRange(F.col(key)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "__local_before", F.coalesce(F.sum(size_col).over(w_local), F.lit(0))
    )
    # one row per partition → prefix offsets; tiny, broadcast back
    totals = ranged.groupBy("__pid").agg(
        F.sum(size_col).cast("long").alias("__psize")
    )
    # prefix sum as a triangular self-join on the tiny counts frame —
    # no un-partitioned WindowExec (see ranking.global_rank).
    before = totals.select(
        F.col("__pid").alias("__bpid"), F.col("__psize").alias("__bsize")
    )
    offsets = (
        totals.join(before, F.col("__bpid") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__bsize"), F.lit(0)).cast("long").alias("__offset"))
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            shard_col,
            ((F.col("__offset") + F.col("__local_before")) / F.lit(shard_bytes))
            .cast("long"),
        )
        .drop("__pid", "__local_before", "__offset")
    )
