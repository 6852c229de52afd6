"""Persistent article store: partitioned parquet with keep-first merge.

Replaces the reference's whole-CSV-rewrite-per-merge store
(raw_articles.csv, scrappy.py:325-351) — which stringifies list columns
and rewrites every byte on every merge — with a parquet table
partitioned by ``source``:

- real ArrayType columns round-trip losslessly;
- partition pruning serves per-source reads without scanning the rest;
- the merge writes to a staging path then swaps, so a failed merge
  never corrupts the store (the reference's overwrite can);
- "never deletes existing data" (README.md:17) holds by construction:
  merge = union + existing-wins window dedup.

At cluster scale the same API maps onto a Delta/Iceberg table with
``MERGE WHEN NOT MATCHED INSERT``; plain parquet keeps this repo
dependency-free.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import merge_keep_existing, newly_added
from ..schema import ARTICLES_SCHEMA


class ArticleStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.exists(self.path) and bool(os.listdir(self.path))

    def read(self) -> DataFrame:
        """Current store contents; empty frame with the canonical schema
        when the store does not exist yet (the reference's empty-DF
        fallback, article_querry.py:8-11)."""
        if not self.exists():
            return self.spark.createDataFrame([], ARTICLES_SCHEMA)
        return self.spark.read.parquet(self.path)

    def merge(self, new: DataFrame) -> DataFrame:
        """Merge a new batch in (existing wins per title); returns the
        newly-added rows (the reference's merge report, scrappy.py:
        339-348). Two jobs: one to write the merged store, one cheap
        anti-join for the report."""
        existing = self.read()
        report = newly_added(existing, new, keys=["title"]).localCheckpoint(eager=True)
        merged = merge_keep_existing(
            existing, new, keys=["title"], tiebreak=["date_added", "source"]
        )
        staging = self.path + ".staging"
        (
            merged.repartition("source")
            .write.mode("overwrite")
            .partitionBy("source")
            .parquet(staging)
        )
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.rename(staging, self.path)
        return report
