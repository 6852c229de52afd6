"""LLM-corpus operators, round-12 wave: the snapshot-layer MERGE
upsert (VERDICT r11 #4) — the one table-format verb a pipeline author
reached for and did not find after round 11 closed appends, row-level
deletes, pruned reads and streaming ingest.

The reference has no equivalent (its merge rewrites a whole CSV,
scrappy.py:350); this completes the Iceberg-verb surface of
``sources/snapshots.py`` alongside the round-11 takedown family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .llmdata15 import _tmp_root
from .registry import register

_MU_SQL = """
    WITH merged AS (
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
        WHERE doc_id < 300 AND doc_id NOT BETWEEN 120 AND 179
        UNION ALL
        SELECT doc_id, 'xx', CAST(n_chars + 1000 AS BIGINT)
        FROM documents WHERE doc_id BETWEEN 120 AND 179
        UNION ALL
        SELECT doc_id, 'zz', CAST(n_chars AS BIGINT)
        FROM documents WHERE doc_id BETWEEN 320 AND 329
    )
    SELECT doc_id, lang, n_chars,
           (SELECT CAST(count(*) AS BIGINT) FROM documents
            WHERE doc_id < 300) AS tt_rows_before,
           CAST(4 AS BIGINT) AS n_versions,
           CAST(2 AS BIGINT) AS merge_scope_files
    FROM merged
"""


@register(
    "q_snapshot_merge_upsert",
    sql=_MU_SQL,
    doc="Snapshot-layer MERGE upsert (VERDICT r11 #4): "
    "SnapshotTable.merge_keys commits the WHEN MATCHED THEN "
    "DELETE+INSERT composition as ONE version — the batch's keys land "
    "as an equality-delete entry scoped to the files present now "
    "(merge-on-read, key-range-pruned via manifest stats) and the "
    "batch itself appends, both in a single manifest, so readers "
    "never observe the between-state and a replayed batch is "
    "content-idempotent. The query builds a three-file table over "
    "docs <300 (manifest doc_id stats), then merges one batch that "
    "REPLACES docs 120-179 (lang='xx', n_chars+1000) and INSERTS "
    "docs 320-329 (lang='zz'). Oracle literals pin the lifecycle: "
    "n_versions=4 (the upsert is exactly one commit — a delete+append "
    "two-commit implementation fails the hash), merge_scope_files=2 "
    "of 3 (the [120, 329] key interval proves the first file "
    "untouched — the delete leg is stats-pruned, O(request) not "
    "O(table)), tt_rows_before recomputed from ground truth (time "
    "travel shows every pre-merge row). Concurrency: conflicts rebase "
    "like appends, rescoping against the new head (VERDICT r11 #1; "
    "two-writer tests in test_snapshots.py). Engine path "
    "sources/snapshots.py::merge_keys.",
    tags=("storage", "snapshot", "merge"),
)
def q_snapshot_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )
    root = _tmp_root(spark, sf_dir, "merge_upsert")
    table = SnapshotTable(spark, os.path.join(root, "t"))

    head = table.current_version()
    bounds = [(0, 100), (100, 200), (200, 300)]
    for i, (lo, hi) in enumerate(bounds):
        if head is None or head < i:
            table.commit(
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ).coalesce(1),
                append=i > 0,
                stats_cols=["doc_id"] if i == 0 else None,
            )
            head = i
    if head == 2:
        batch = (
            docs.filter(F.col("doc_id").between(120, 179)).select(
                "doc_id",
                F.lit("xx").alias("lang"),
                (F.col("n_chars") + 1000).alias("n_chars"),
            )
        ).unionByName(
            docs.filter(F.col("doc_id").between(320, 329)).select(
                "doc_id", F.lit("zz").alias("lang"), "n_chars"
            )
        )
        table.merge_keys(batch.coalesce(1), ["doc_id"])

    # audit flags recomputed from the PERSISTED manifests (the staged
    # setup rerun-skips), loud-fail on regression
    n_versions = len(table.versions())
    m = table._manifest(3)
    scopes = [len(e["files"]) for e in m.get("deletes", [])]
    if n_versions != 4 or scopes != [2]:
        raise ValueError(
            f"merge upsert lifecycle regressed: {n_versions} versions, "
            f"delete scopes {scopes}"
        )
    tt_rows = table.read(2).count()

    return table.read().select(
        "doc_id",
        "lang",
        "n_chars",
        F.lit(tt_rows).cast("long").alias("tt_rows_before"),
        F.lit(n_versions).cast("long").alias("n_versions"),
        F.lit(scopes[0]).cast("long").alias("merge_scope_files"),
    )
