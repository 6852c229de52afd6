"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join (e.g. lineitem ⋈
orders) is shuffling both sides on the key. Bucketing pays that
shuffle ONCE at write time: both tables hash-distributed into the same
number of buckets on the join key, so every future join/aggregation on
that key runs with zero Exchange — each task streams matching buckets.

Spark-native bucketing (``bucketBy`` + ``saveAsTable``) works on the
in-memory catalog with plain parquet — no Hive metastore needed; on a
cluster the same code targets the shared catalog. The bucket count is
a capacity decision: ≈ (table size / healthy partition size), held
constant across all co-bucketed tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally per-bucket sorted) table.

    Sorting within buckets makes downstream sort-merge joins skip their
    sort too — the join degenerates to a streamed merge."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back with bucket metadata intact (``spark.table``, not a
    path read — path reads drop bucketing info)."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With equal
    bucket counts the plan contains no Exchange on either side."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=on, how=how
    )
