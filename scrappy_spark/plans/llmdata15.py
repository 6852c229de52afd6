"""LLM-corpus operators, round-10 wave: stored-artifact lifecycles
(the train-once/serve-many shape VERDICT r9 asked for — persisted
IVF-PQ vector index and lang-id model), takedown/deletion for the
three stored index families, Iceberg-style column-identity schema
evolution (rename/drop), and the privacy release gate.

The reference has no equivalents (its store is one CSV it rewrites
per merge, scrappy.py:350); these close the production loop on the
round-9 extension families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .registry import register


def _tmp_root(spark: SparkSession, sf_dir: str, tag: str) -> str:
    """Session-unique scratch dir (the schema_evolution pattern):
    keyed by sf_dir + applicationId so driver reruns inside one
    session resume idempotently and a fresh session starts clean."""
    import hashlib
    import os
    import tempfile

    h = hashlib.md5(
        f"{tag}|{sf_dir}|{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"{tag}_{h}")


# ---------------------------------------------------------------------------
# Column-identity schema evolution: rename / drop / re-add
# ---------------------------------------------------------------------------


@register(
    "q_snapshot_schema_rename",
    sql="""
    WITH v0 AS (
        SELECT 'v0' AS snap, doc_id, lang AS language,
               CAST(NULL AS VARCHAR) AS source,
               CAST(n_chars AS BIGINT) AS n_chars,
               'doc_id,lang,n_chars' AS schema_sig
        FROM documents WHERE doc_id < 300),
    v4 AS (
        SELECT 'v4' AS snap, doc_id, lang AS language,
               CASE WHEN doc_id >= 300 THEN source END AS source,
               CAST(CASE WHEN doc_id >= 400 THEN n_chars END AS BIGINT)
                   AS n_chars,
               'doc_id,language,source,n_chars' AS schema_sig
        FROM documents WHERE doc_id < 450)
    SELECT snap, doc_id, language,
           coalesce(source, '~') AS source,
           CAST(coalesce(n_chars, -1) AS BIGINT) AS n_chars,
           schema_sig
    FROM (SELECT * FROM v0 UNION ALL SELECT * FROM v4)
    """,
    doc="Column-identity schema evolution (VERDICT r9 #5, the Iceberg "
    "second notch): v0 lands (doc_id, lang, n_chars); v1 RENAMES lang "
    "-> language (metadata-only — same files, column keeps its id); "
    "v2 appends rows under the new name plus a fresh source column; "
    "v3 DROPS n_chars; v4 re-adds n_chars via append — the re-added "
    "name gets a FRESH id, so v0's old n_chars values are NOT "
    "resurrected (old files read NULL under the new id). Output reads "
    "v0 (pre-rename names, proven by the schema_sig column built from "
    "the ACTUAL read's df.columns) and v4 (post-everything), row "
    "grain; the oracle reconstructs both directly from documents. "
    "Engine path sources/snapshots.py::rename_column/drop_column/"
    "_read_mapped (files matched to columns BY ID through the "
    "per-file write-schema registry).",
    tags=("storage", "snapshot", "schema"),
)
def q_snapshot_schema_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents")
    root = _tmp_root(spark, sf_dir, "schema_rename")
    table = SnapshotTable(spark, os.path.join(root, "table"))

    head = table.current_version()
    if head is None:
        table.commit(
            docs.filter(F.col("doc_id") < 300)
            .select("doc_id", "lang", "n_chars")
            .coalesce(1)
        )
        head = 0
    if head == 0:
        table.rename_column("lang", "language")
        head = 1
    if head == 1:
        table.commit(
            docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
            .select("doc_id", F.col("lang").alias("language"), "source")
            .coalesce(1),
            append=True,
        )
        head = 2
    if head == 2:
        table.drop_column("n_chars")
        head = 3
    if head == 3:
        table.commit(
            docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 450))
            .select(
                "doc_id", F.col("lang").alias("language"), "source", "n_chars"
            )
            .coalesce(1),
            append=True,
        )

    v0 = table.read(0)
    v4 = table.read(4)
    # schema_sig comes from the ACTUAL reads — wrong per-version names
    # would fail the value hash, not just a pytest assert
    part0 = v0.select(
        F.lit("v0").alias("snap"),
        "doc_id",
        F.col("lang").alias("language"),
        F.lit("~").alias("source"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.lit(",".join(v0.columns)).alias("schema_sig"),
    )
    part4 = v4.select(
        F.lit("v4").alias("snap"),
        "doc_id",
        "language",
        F.coalesce("source", F.lit("~")).alias("source"),
        F.coalesce(F.col("n_chars").cast("long"), F.lit(-1)).alias("n_chars"),
        F.lit(",".join(v4.columns)).alias("schema_sig"),
    )
    return part0.unionByName(part4)
