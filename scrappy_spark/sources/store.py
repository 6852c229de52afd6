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


def import_legacy_csv(spark: SparkSession, path: str) -> DataFrame:
    """Import a reference-format ``raw_articles.csv`` store.

    The reference persists via ``DataFrame.to_csv`` (scrappy.py:350),
    which stringifies list cells — ``authors``/``keywords`` arrive as
    ``"['a', 'b']"`` and ``institutions`` as the pre-flattened
    ``"A; B"`` string (flattened before save at scrappy.py:318-320).
    This importer recovers real types into ARTICLES_SCHEMA:

    - python-repr lists → arrays via quote-swap + ``from_json`` (an
      apostrophe inside a name defeats the parse → empty array; the
      information was already mangled by the CSV round-trip);
    - institutions → one group holding the ``"; "``-split names
      (original per-author nesting is unrecoverable from the flat form);
    - ``year`` int-or-"" → nullable int; ``date_added`` → date.
    """
    from pyspark.sql import functions as F

    raw = spark.read.csv(path, header=True, multiLine=True, escape='"')

    def parse_list(col: str):
        js = F.regexp_replace(F.col(col), "'", '"')
        parsed = F.from_json(js, "array<string>")
        return F.coalesce(parsed, F.array().cast("array<string>"))

    inst = F.when(
        F.col("institutions").isNull() | (F.col("institutions") == ""),
        F.array().cast("array<array<string>>"),
    ).otherwise(F.array(F.split(F.col("institutions"), "; ")))
    out = raw.select(
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        F.coalesce(F.col("title"), F.lit("")).alias("title"),
        F.col("abstract"),
        F.col("url"),
        parse_list("authors").alias("authors"),
        inst.alias("institutions"),
        parse_list("keywords").alias("keywords"),
        F.coalesce(F.col("term"), F.lit("")).alias("term"),
        F.col("year").cast("int").alias("year"),
        F.coalesce(F.to_date("date_added"), F.current_date()).alias("date_added"),
    )
    return out


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
