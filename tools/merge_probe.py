"""Measure the partition-selective merge vs a full-store rewrite.

Builds a synthetic article store (S source partitions, N rows), then
merges a batch touching exactly one source, timing:

- selective: ``ArticleStore.merge`` (rewrites only the touched
  partition, leaves the other S-1 partition directories on disk);
- full-rewrite: the reference's shape (read everything, union, write
  everything) for the same batch.

Also verifies the selectivity claim directly: untouched partition
files' mtimes are byte-identical before/after the selective merge.

Usage: python tools/merge_probe.py [n_rows] [n_sources]
Prints one JSON line; numbers feed ARCHITECTURE.md's scale notes.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scrappy_spark.session import get_spark
from scrappy_spark.sources.store import ArticleStore, dedup_keep_first, newly_added


def synth_articles(spark, n_rows: int, n_sources: int):
    # ~1 KB abstracts so write volume, not file metadata, dominates —
    # the regime a real store lives in.
    filler = F.repeat(F.concat(F.lit("lorem-"), F.col("id").cast("string"), F.lit(" ")), 64)
    return (
        spark.range(n_rows)
        .select(
            F.concat(F.lit("src"), (F.col("id") % n_sources).cast("string")).alias("source"),
            F.concat(F.lit("title-"), F.col("id").cast("string")).alias("title"),
            F.concat(F.lit("abstract "), filler).alias("abstract"),
            F.concat(F.lit("http://x/"), F.col("id").cast("string")).alias("url"),
            F.array(F.lit("author")).alias("authors"),
            F.array(F.array(F.lit("inst"))).alias("institutions"),
            F.array(F.lit("kw")).alias("keywords"),
            F.lit("term").alias("term"),
            F.lit(2024).cast("int").alias("year"),
            F.lit(datetime.date(2024, 1, 1)).alias("date_added"),
        )
    )


def tree_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def partition_mtimes(path: str) -> dict[str, float]:
    out = {}
    for d in os.listdir(path):
        if d.startswith("source="):
            full = os.path.join(path, d)
            out[d] = max(os.path.getmtime(os.path.join(full, f)) for f in os.listdir(full))
    return out


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_sources = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("merge_probe")
    base = tempfile.mkdtemp(prefix="merge_probe_")
    try:
        store_path = os.path.join(base, "store")
        store = ArticleStore(spark, store_path)

        t0 = time.time()
        store.merge(synth_articles(spark, n_rows, n_sources))
        t_initial = time.time() - t0

        # batch: 1000 genuinely-new titles (numeric id compare — a
        # lexicographic title compare would sweep in most of the
        # existing corpus and the probe would time the wrong workload),
        # all landing in ONE source partition
        batch = synth_articles(spark, n_rows + 1000, n_sources).filter(
            F.split(F.col("title"), "-").getItem(1).cast("long") >= n_rows
        ).withColumn("source", F.lit("src0"))

        before = partition_mtimes(store_path)
        t0 = time.time()
        store.merge(batch)
        t_selective = time.time() - t0
        after = partition_mtimes(store_path)
        untouched_stable = all(
            before[p] == after[p] for p in before if p != "source=src0"
        )
        bytes_selective = tree_bytes(os.path.join(store_path, "source=src0"))
        store_bytes = tree_bytes(store_path)

        # reference-shaped full rewrite of the same merge
        full_path = os.path.join(base, "full")
        shutil.copytree(store_path, full_path)
        t0 = time.time()
        existing = spark.read.parquet(full_path)
        added = dedup_keep_first(
            newly_added(existing, batch, keys=["title"]),
            keys=["title"],
            order_by=["date_added", "source"],
        )
        merged = existing.unionByName(added, allowMissingColumns=True)
        staging = full_path + ".staging"
        merged.repartition("source").write.mode("overwrite").partitionBy("source").parquet(staging)
        shutil.rmtree(full_path)
        os.rename(staging, full_path)
        t_full = time.time() - t0
        bytes_full = tree_bytes(full_path)

        print(
            json.dumps(
                {
                    "n_rows": n_rows,
                    "n_sources": n_sources,
                    "store_mb": round(store_bytes / 1e6, 1),
                    "initial_write_sec": round(t_initial, 2),
                    "selective_merge_sec": round(t_selective, 2),
                    "full_rewrite_merge_sec": round(t_full, 2),
                    "wall_speedup": round(t_full / t_selective, 2),
                    "selective_write_mb": round(bytes_selective / 1e6, 1),
                    "full_write_mb": round(bytes_full / 1e6, 1),
                    "write_amplification_ratio": round(bytes_full / max(bytes_selective, 1), 1),
                    "untouched_partitions_stable": untouched_stable,
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
