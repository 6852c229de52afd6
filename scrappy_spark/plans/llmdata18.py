"""Round-14 storage-lifecycle queries: snapshot branches & tags.

The reference rewrites one flat CSV per run (scrappy.py:350 — its
only "versioning" is the file it just overwrote); a 100 TB training
corpus instead needs Iceberg-style refs: named branches with
independent heads over SHARED data files, immutable tags pinning the
exact table a training run read, metadata-grain promotion, and
ref-aware GC. Engine path: sources/snapshots.py::create_branch /
tag / fast_forward / expire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .llmdata15 import _tmp_root
from .registry import register

_BL_SQL = """
    WITH legs AS (
        SELECT 'tag_baseline' AS leg, doc_id FROM documents WHERE doc_id < 200
        UNION ALL
        SELECT 'dev_head', doc_id FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT 'main_pre_merge', doc_id FROM documents WHERE doc_id < 300
    )
    SELECT l.leg, l.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
           CAST(2 AS BIGINT) AS n_branches,
           CAST(1 AS BIGINT) AS n_tags,
           CAST(0 AS BIGINT) AS tag_version,
           CAST(2 AS BIGINT) AS main_head,
           CAST(4 AS BIGINT) AS n_shared_files
    FROM legs l JOIN documents d USING (doc_id)
"""


@register(
    "q_snapshot_branch_lifecycle",
    sql=_BL_SQL,
    doc="Branches & tags for SnapshotTable (Iceberg refs): fork a "
    "'dev' branch from main@1 (one metadata commit — the manifest is "
    "copied, not a byte of data), append to it while main stays "
    "untouched, pin main@0 under an immutable tag, then PROMOTE dev "
    "by fast-forwarding main — again metadata-grain. Oracle literals "
    "recomputed from the persisted refs: n_branches=2, the tag "
    "resolves to version 0 (200 rows forever), the dev head and the "
    "fast-forwarded main head read identical row sets through "
    "IDENTICAL file lists (n_shared_files=4 — a copy-based fork or a "
    "rewrite-based promotion fails the literal), and main's "
    "pre-merge version stays time-travelable (300 rows). At 100 TB "
    "this is how an experiment re-cleans a corpus and promotes the "
    "result without copying the table or blocking ingest writers. "
    "Engine path sources/snapshots.py::create_branch/tag/"
    "fast_forward.",
    tags=("storage", "snapshot", "branch", "tag", "lifecycle"),
)
def q_snapshot_branch_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
        )
        .filter(F.col("doc_id") < 400)
    )
    root = _tmp_root(spark, sf_dir, "branch_lifecycle")
    table = SnapshotTable(spark, os.path.join(root, "t"))

    # staged setup — every step guards on persisted state so driver
    # reruns inside one session resume idempotently
    head = table.current_version()
    if head is None:
        table.commit(
            docs.filter(F.col("doc_id") < 200).repartition(2),
            "v0",
            stats_cols=["doc_id"],
        )
        head = 0
    if head == 0:
        table.commit(
            docs.filter(F.col("doc_id").between(200, 299)).repartition(1),
            "v1 append",
            append=True,
        )
        head = 1
    if "baseline" not in table.tags():
        table.tag("baseline", 0)
    if "dev" not in table.branches():
        table.create_branch("dev")
    dev = table.for_branch("dev")
    if dev.current_version() == 0:
        dev.commit(
            docs.filter(F.col("doc_id").between(300, 399)).repartition(1),
            "dev re-clean",
            append=True,
        )
    if table.current_version() == 1:
        table.fast_forward("dev")

    # audit literals recomputed from the PERSISTED refs/manifests,
    # loud-fail on regression
    n_branches = len(table.branches())
    tags = table.tags()
    main_head = table.current_version()
    main_m = table._manifest(main_head)
    dev_m = dev._manifest(dev.current_version())
    n_shared = len(set(main_m["files"]) & set(dev_m["files"]))
    if (
        n_branches != 2
        or tags.get("baseline", {}).get("version") != 0
        or main_head != 2
        or main_m.get("merged_from") != {"branch": "dev", "version": 1}
        or n_shared != 4
        or len(main_m["files"]) != 4
    ):
        raise ValueError(
            f"branch lifecycle regressed: n_branches={n_branches}, "
            f"tags={tags}, main_head={main_head}, "
            f"merged_from={main_m.get('merged_from')}, "
            f"n_shared={n_shared}/{len(main_m['files'])}"
        )

    lits = [
        F.lit(n_branches).cast("long").alias("n_branches"),
        F.lit(len(tags)).cast("long").alias("n_tags"),
        F.lit(tags["baseline"]["version"]).cast("long").alias("tag_version"),
        F.lit(main_head).cast("long").alias("main_head"),
        F.lit(n_shared).cast("long").alias("n_shared_files"),
    ]

    def leg(tag: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(tag).alias("leg"), "doc_id", "lang", "n_chars", *lits
        )

    return (
        leg("tag_baseline", table.read_tag("baseline"))
        .unionByName(leg("dev_head", dev.read()))
        .unionByName(leg("main_pre_merge", table.read(version=1)))
    )
