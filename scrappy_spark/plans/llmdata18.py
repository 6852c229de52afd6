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


# ---------------------------------------------------------------------------
# DataSource merge-on-read: pending deletes applied inside the Arrow scan
# ---------------------------------------------------------------------------

_MOR_SQL = """
    WITH visible AS (
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
        WHERE doc_id < 300
          AND doc_id NOT BETWEEN 50 AND 69
          AND doc_id NOT BETWEEN 200 AND 219
    )
    SELECT 'full' AS leg, doc_id, lang, n_chars,
           CAST(3 AS BIGINT) AS n_files,
           CAST(2 AS BIGINT) AS n_pending_entries,
           CAST(1 AS BIGINT) AS pred_scope_files,
           CAST(1 AS BIGINT) AS keys_scope_files
    FROM visible
    UNION ALL
    SELECT 'point', doc_id, lang, n_chars,
           CAST(3 AS BIGINT), CAST(2 AS BIGINT),
           CAST(1 AS BIGINT), CAST(1 AS BIGINT)
    FROM visible WHERE doc_id = 123
"""


@register(
    "q_snapshot_datasource_mor",
    sql=_MOR_SQL,
    doc="Merge-on-read through the scrappy_snapshot DataSource: a "
    "version with PENDING row-level deletes (one predicate entry, "
    "one takedown key list) reads correctly via spark.read.format — "
    "each file's InputPartition carries the delete entries scoping "
    "it and the executor applies them with pyarrow compute "
    "(vectorized predicate masks, anti-join against the delete-key "
    "parquet), no apply_deletes rewrite first. Oracle literals pin "
    "the REQUEST-GRAIN economics from the persisted manifest: both "
    "entries were stats-scoped to 1 of 3 files at delete time (an "
    "implementation that scopes table-wide carries 3 and fails), "
    "and a pushed point lookup composes with the delete program. "
    "Engine path sources/snapshot_datasource.py::_apply_delete_arrow "
    "+ snapshots.py::delete_where/delete_keys.",
    tags=("storage", "snapshot", "datasource", "delete", "mor"),
)
def q_snapshot_datasource_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.snapshot_datasource import SnapshotDataSource
    from ..sources.snapshots import SnapshotTable

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)

    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
        )
        .filter(F.col("doc_id") < 300)
    )
    root = _tmp_root(spark, sf_dir, "datasource_mor")
    table = SnapshotTable(spark, os.path.join(root, "t"))

    head = table.current_version()
    if head is None:
        # truncate(width=100) → exactly 3 files: [0,100), [100,200),
        # [200,300) — a deterministic layout the scope literals pin
        table.commit_partitioned(
            docs, "doc_id", "truncate", width=100, stats_cols=["doc_id"]
        )
        head = 0
    if head == 0:
        table.delete_where(("doc_id", "between", (50, 69)))
        head = 1
    if head == 1:
        table.delete_keys(
            docs.filter(F.col("doc_id").between(200, 219)).select("doc_id"),
            ["doc_id"],
        )

    # audit literals recomputed from the PERSISTED manifest
    m = table._manifest(table.current_version())
    entries = m.get("deletes", [])
    by_kind = {e["kind"]: e for e in entries}
    pred_scope = len(by_kind.get("pred", {}).get("files", []))
    keys_scope = len(by_kind.get("keys", {}).get("files", []))
    if len(entries) != 2 or pred_scope != 1 or keys_scope != 1:
        raise ValueError(
            f"datasource MOR regressed: entries={len(entries)}, "
            f"pred_scope={pred_scope}, keys_scope={keys_scope}"
        )

    lits = [
        F.lit(len(m["files"])).cast("long").alias("n_files"),
        F.lit(len(entries)).cast("long").alias("n_pending_entries"),
        F.lit(pred_scope).cast("long").alias("pred_scope_files"),
        F.lit(keys_scope).cast("long").alias("keys_scope_files"),
    ]

    def ds_load() -> DataFrame:
        # one load() per leg: the Spark 4.1 BatchScan-dedup sharp edge
        return (
            spark.read.format("scrappy_snapshot")
            .option("path", table.path)
            .load()
        )

    full = ds_load().select(
        F.lit("full").alias("leg"), "doc_id", "lang", "n_chars", *lits
    )
    point = (
        ds_load()
        .filter(F.col("doc_id") == 123)
        .select(
            F.lit("point").alias("leg"), "doc_id", "lang", "n_chars", *lits
        )
    )
    return full.unionByName(point)


# ---------------------------------------------------------------------------
# Bloom backfill: the metadata-only pruning-axis commit (add_blooms)
# ---------------------------------------------------------------------------

_BB_SQL = """
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(2 AS BIGINT) AS n_files,
           CAST(1 AS BIGINT) AS point_files_read,
           CAST(0 AS BIGINT) AS absent_files_read,
           CAST(1 AS BIGINT) AS bloom_version
    FROM documents WHERE doc_id = 123
"""


@register(
    "q_snapshot_bloom_backfill",
    sql=_BB_SQL,
    doc="add_blooms: per-file Bloom filters designated AFTER the "
    "fact as one metadata-only commit — the table here is written "
    "through the scrappy_snapshot DataSource writer (whose "
    "session-free commit hook cannot build blooms), then gains the "
    "point-lookup pruning axis via a single distributed backfill "
    "pass that scans only files missing a designated bloom. Oracle "
    "literals pin the axis from the persisted manifest: both files "
    "span the full doc_id range (no stats recorded, min/max could "
    "never prune), yet the point read opens 1 of 2 files and an "
    "absent key opens ZERO — only the bloom can prove that. "
    "bloom_version=1 pins that the backfill was one new version over "
    "the same file list. Engine path sources/snapshots.py::"
    "add_blooms + _collect_blooms.",
    tags=("storage", "snapshot", "bloom", "pruning", "datasource"),
)
def q_snapshot_bloom_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.snapshot_datasource import SnapshotDataSource
    from ..sources.snapshots import SnapshotTable

    spark.dataSource.register(SnapshotDataSource)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
        )
        .filter(F.col("doc_id") < 240)
    )
    root = _tmp_root(spark, sf_dir, "bloom_backfill")
    path = os.path.join(root, "t")
    table = SnapshotTable(spark, path)

    head = table.current_version()
    if head is None:
        (
            docs.repartition(2)
            .write.format("scrappy_snapshot")
            .mode("overwrite")
            .option("path", path)
            .save()
        )
        head = 0
    if head == 0:
        table.add_blooms(["doc_id"])

    m = table._manifest(table.current_version())
    rep_point = table.prune_report(("doc_id", "=", 123))
    rep_absent = table.prune_report(("doc_id", "=", 987654))
    if (
        table.current_version() != 1
        or len(m["files"]) != 2
        or m["files"] != table._manifest(0)["files"]
        or rep_point["n_read"] != 1
        or rep_absent["n_read"] != 0
    ):
        raise ValueError(
            f"bloom backfill regressed: head={table.current_version()}, "
            f"files={len(m['files'])}, point={rep_point}, "
            f"absent={rep_absent}"
        )

    return table.read(where=("doc_id", "=", 123)).select(
        "doc_id",
        "lang",
        "n_chars",
        F.lit(len(m["files"])).cast("long").alias("n_files"),
        F.lit(rep_point["n_read"]).cast("long").alias("point_files_read"),
        F.lit(rep_absent["n_read"]).cast("long").alias("absent_files_read"),
        F.lit(table.current_version()).cast("long").alias("bloom_version"),
    )


# ---------------------------------------------------------------------------
# Metadata tables: the table's own operational state as SQL
# ---------------------------------------------------------------------------

_MT_SQL = """
    SELECT * FROM (VALUES
        ('history', 'v0', CAST(-1 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
        ('history', 'v1', CAST(0 AS BIGINT), CAST(3 AS BIGINT), CAST(0 AS BIGINT)),
        ('history', 'v2', CAST(1 AS BIGINT), CAST(3 AS BIGINT), CAST(1 AS BIGINT)),
        ('files', 'agg', CAST(3 AS BIGINT), CAST(150 AS BIGINT), CAST(3 AS BIGINT)),
        ('refs', 'branch:aux', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        ('refs', 'branch:main', CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        ('refs', 'tag:stable', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT))
    ) AS t(leg, name, a, b, c)
"""


@register(
    "q_snapshot_metadata_tables",
    sql=_MT_SQL,
    doc="Metadata tables (Iceberg's table.files / table.history / "
    "table.refs): the snapshot table's own operational state as "
    "DataFrames — per-file size and row count read DISTRIBUTED from "
    "parquet footers (mapInPandas over the file list, no data bytes, "
    "no driver loop), commit history with lineage and pending-delete "
    "counts, and every branch/tag ref. Oracle literals pin a 3-commit "
    "lifecycle (2-file base, append to 3 files, a pending predicate "
    "delete), the footer-summed row inventory (150 rows across 3 "
    "stats-covered files — row_count counts PHYSICAL rows, the "
    "pending delete does not shrink it until apply_deletes), and the "
    "ref table after a tag and a fork. These views are how 'how many "
    "small files need compaction' becomes one SQL query at 100 TB. "
    "Engine path sources/snapshots.py::files_df/history_df/refs_df + "
    "sqlapi.register_snapshot(metadata=True).",
    tags=("storage", "snapshot", "metadata", "introspection"),
)
def q_snapshot_metadata_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .filter(F.col("doc_id") < 150)
    )
    root = _tmp_root(spark, sf_dir, "metadata_tables")
    table = SnapshotTable(spark, os.path.join(root, "t"))

    head = table.current_version()
    if head is None:
        table.commit(
            docs.filter(F.col("doc_id") < 100).repartition(2),
            "v0",
            stats_cols=["doc_id"],
        )
        head = 0
    if head == 0:
        table.commit(
            docs.filter(F.col("doc_id") >= 100).repartition(1),
            "v1 append",
            append=True,
        )
        head = 1
    if head == 1:
        table.delete_where(("doc_id", "between", (10, 19)))
    if "stable" not in table.tags():
        table.tag("stable", 1)
    if "aux" not in table.branches():
        table.create_branch("aux", version=1)

    history = table.history_df().select(
        F.lit("history").alias("leg"),
        F.concat(F.lit("v"), F.col("version")).alias("name"),
        F.coalesce(F.col("parent"), F.lit(-1)).cast("long").alias("a"),
        F.col("n_files").cast("long").alias("b"),
        F.col("n_pending_deletes").cast("long").alias("c"),
    )
    files = table.files_df().agg(
        F.lit("files").alias("leg"),
        F.lit("agg").alias("name"),
        F.count("*").cast("long").alias("a"),
        F.sum("row_count").cast("long").alias("b"),
        F.sum(F.col("has_stats").cast("long")).cast("long").alias("c"),
    )
    refs = table.refs_df().select(
        F.lit("refs").alias("leg"),
        F.concat_ws(":", "kind", "name").alias("name"),
        F.col("version").cast("long").alias("a"),
        F.lit(0).cast("long").alias("b"),
        F.lit(0).cast("long").alias("c"),
    )
    return history.unionByName(files).unionByName(refs)


# ---------------------------------------------------------------------------
# Incremental append scan: changes-since at file grain
# ---------------------------------------------------------------------------

_IR_SQL = """
    SELECT 'since_v0' AS leg, doc_id, lang,
           CAST(3 AS BIGINT) AS n_files_head
    FROM documents
    WHERE doc_id BETWEEN 100 AND 299 AND doc_id <> 250
    UNION ALL
    SELECT 'since_v1', doc_id, lang, CAST(3 AS BIGINT)
    FROM documents
    WHERE doc_id BETWEEN 200 AND 299 AND doc_id <> 250
"""


@register(
    "q_snapshot_incremental_read",
    sql=_IR_SQL,
    doc="Incremental append scan (Iceberg's changes-since): "
    "read_incremental(since) returns the rows ADDED after a version "
    "at FILE grain — the manifest set difference scanned, no "
    "row-level compare, no join — so an ingest consumer processes "
    "each landed batch exactly once by remembering its last version. "
    "The table stages three append commits plus a PENDING row-level "
    "delete (which keeps files, so the range stays append-only, and "
    "applies to the new files it scopes: doc 250 is absent from both "
    "legs). A rewrite inside the range raises loudly instead of "
    "re-surfacing rewritten rows as phantom adds (tested; row_diff "
    "is the CDC path across rewrites). Engine path "
    "sources/snapshots.py::read_incremental.",
    tags=("storage", "snapshot", "incremental", "cdc"),
)
def q_snapshot_incremental_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .filter(F.col("doc_id") < 300)
    )
    root = _tmp_root(spark, sf_dir, "incremental_read")
    table = SnapshotTable(spark, os.path.join(root, "t"))

    head = table.current_version()
    if head is None:
        table.commit(
            docs.filter(F.col("doc_id") < 100).repartition(1),
            "v0",
            stats_cols=["doc_id"],
        )
        head = 0
    if head == 0:
        table.commit(
            docs.filter(F.col("doc_id").between(100, 199)).repartition(1),
            "v1 append",
            append=True,
        )
        head = 1
    if head == 1:
        table.commit(
            docs.filter(F.col("doc_id").between(200, 299)).repartition(1),
            "v2 append",
            append=True,
        )
        head = 2
    if head == 2:
        table.delete_where(("doc_id", "=", 250))

    m = table._manifest(table.current_version())
    if table.current_version() != 3 or len(m["files"]) != 3:
        raise ValueError(
            f"incremental read regressed: head={table.current_version()}, "
            f"files={len(m['files'])}"
        )
    lit = F.lit(len(m["files"])).cast("long").alias("n_files_head")

    def leg(tag: str, since: int) -> DataFrame:
        return table.read_incremental(since).select(
            F.lit(tag).alias("leg"), "doc_id", "lang", lit
        )

    return leg("since_v0", 0).unionByName(leg("since_v1", 1))
