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


# ---------------------------------------------------------------------------
# Partition-spec pruning (VERDICT r11 #7 — the second Iceberg pruning axis)
# ---------------------------------------------------------------------------

_PS_SQL = """
    SELECT 'bucket' AS leg, doc_id, lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(8 AS BIGINT) AS n_files_total,
           CAST(1 AS BIGINT) AS n_files_read
    FROM documents WHERE doc_id IN (7, 123, 350)
    UNION ALL
    SELECT 'trunc', doc_id, lang, CAST(n_chars AS BIGINT),
           CAST(5 AS BIGINT), CAST(1 AS BIGINT)
    FROM documents WHERE doc_id BETWEEN 120 AND 179
"""


@register(
    "q_snapshot_partitioned_read",
    sql=_PS_SQL,
    doc="Partition-spec pruning for SnapshotTable reads (VERDICT r11 "
    "#7 — the second Iceberg pruning axis, alongside the manifest "
    "min/max stats): commit_partitioned records a partition SPEC "
    "(column id + transform) plus each data file's single partition "
    "VALUE, and read(where=...) drops files whose value disproves a "
    "conjunct before any scan. Two tables, two transforms: a BUCKET "
    "table (pmod(xxhash64(doc_id), 8) — the axis stats cannot "
    "express: a point lookup on a high-cardinality key touches 1/n "
    "of the files no matter how values interleave; the probe bucket "
    "is computed through Spark's own xxhash64 so write and read "
    "share the exact JVM hash) and a TRUNCATE table (width 100 — "
    "rows lie in [v, v+100), so RANGE conjuncts prune). Oracle "
    "literals pin that pruning actually happened: three point "
    "lookups each read 1 of 8 bucket files, the range leg reads 1 "
    "of 5 truncate files (a keep-everything implementation fails "
    "the hash), while the row payload pins that no matching row is "
    "ever dropped. Spec is keyed by COLUMN ID (rename-proof), "
    "carried through every manifest op, and spec-less history files "
    "are simply never partition-pruned — all pinned in "
    "test_snapshots.py. Engine path sources/snapshots.py::"
    "commit_partitioned/_part_prune.",
    tags=("storage", "snapshot", "pruning", "partitioning"),
)
def q_snapshot_partitioned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    ).filter(F.col("doc_id") < 500)
    root = _tmp_root(spark, sf_dir, "partitioned_read")

    bucket = SnapshotTable(spark, os.path.join(root, "b"))
    if bucket.current_version() is None:
        bucket.commit_partitioned(docs, "doc_id", "bucket", n=8)
    trunc = SnapshotTable(spark, os.path.join(root, "t"))
    if trunc.current_version() is None:
        trunc.commit_partitioned(docs, "doc_id", "truncate", width=100)

    out = None
    for key in (7, 123, 350):
        rep = bucket.prune_report(("doc_id", "=", key))
        if rep != {"n_files": 8, "n_read": 1, "n_pruned": 7}:
            raise ValueError(f"bucket pruning regressed for {key}: {rep}")
        part = bucket.read(where=("doc_id", "=", key)).select(
            F.lit("bucket").alias("leg"),
            "doc_id",
            "lang",
            "n_chars",
            F.lit(rep["n_files"]).cast("long").alias("n_files_total"),
            F.lit(rep["n_read"]).cast("long").alias("n_files_read"),
        )
        out = part if out is None else out.unionByName(part)
    where = ("doc_id", "between", (120, 179))
    rep = trunc.prune_report(where)
    if rep != {"n_files": 5, "n_read": 1, "n_pruned": 4}:
        raise ValueError(f"truncate pruning regressed: {rep}")
    return out.unionByName(
        trunc.read(where=where).select(
            F.lit("trunc").alias("leg"),
            "doc_id",
            "lang",
            "n_chars",
            F.lit(rep["n_files"]).cast("long").alias("n_files_total"),
            F.lit(rep["n_read"]).cast("long").alias("n_files_read"),
        )
    )


# ---------------------------------------------------------------------------
# Partition-spec EVOLUTION (VERDICT r12 #3 — re-partitioning as metadata)
# ---------------------------------------------------------------------------

_SE_SQL = """
    SELECT 'pt75' AS leg, doc_id, lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(13 AS BIGINT) AS n_files_total,
           CAST(2 AS BIGINT) AS n_files_read,
           CAST(2 AS BIGINT) AS n_specs
    FROM documents WHERE doc_id = 75
    UNION ALL
    SELECT 'pt300', doc_id, lang, CAST(n_chars AS BIGINT),
           CAST(13 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)
    FROM documents WHERE doc_id = 300
"""


@register(
    "q_snapshot_spec_evolution",
    sql=_SE_SQL,
    doc="Partition-spec EVOLUTION for SnapshotTable (VERDICT r12 #3 — "
    "the Iceberg move): a table's partitioning can CHANGE without "
    "rewriting history. The manifest carries a spec LIST with a spec "
    "id per file; commit_partitioned(append=True) under a different "
    "spec registers it as the new current spec, new files carry "
    "values under it, and read(where=...) prunes EACH FILE by the "
    "spec it was written with. At 100 TB this is the difference "
    "between re-partitioning being a metadata operation and a month "
    "of compute. The query commits docs <250 truncate(width=100) — 3 "
    "files — then appends docs 250-499 bucket(n=10) — 10 files. "
    "Oracle literals pin per-spec pruning on the PERSISTED manifests: "
    "a point in the old data (doc 75) reads 1 old truncate file + 1 "
    "new bucket file = 2 of 13 (old files pruned by the OLD spec, new "
    "by the NEW — a keep-everything implementation reads 13 and fails "
    "the hash; a spec-overwrite implementation loses old-file pruning "
    "and reads 4); a point in the new data (doc 300) reads 1 of 13 "
    "(every old truncate interval disproves it); n_specs=2 recomputed "
    "from the manifest's spec list (a rewrite implementation carries "
    "1). Engine path sources/snapshots.py::commit_partitioned/"
    "_pruned_files.",
    tags=("storage", "snapshot", "pruning", "partitioning", "evolution"),
)
def q_snapshot_spec_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    ).filter(F.col("doc_id") < 500)
    root = _tmp_root(spark, sf_dir, "spec_evolution")
    table = SnapshotTable(spark, os.path.join(root, "t"))

    head = table.current_version()
    if head is None:
        table.commit_partitioned(
            docs.filter(F.col("doc_id") < 250),
            "doc_id",
            "truncate",
            width=100,
        )
        head = 0
    if head == 0:
        table.commit_partitioned(
            docs.filter(F.col("doc_id") >= 250),
            "doc_id",
            "bucket",
            n=10,
            append=True,
        )

    # audit literals recomputed from the PERSISTED manifest (the
    # staged setup rerun-skips), loud-fail on regression
    m = table._manifest(table.current_version())
    n_specs = len(m.get("partition_specs", {"only": None}))
    rep75 = table.prune_report(("doc_id", "=", 75))
    rep300 = table.prune_report(("doc_id", "=", 300))
    if (
        n_specs != 2
        or rep75 != {"n_files": 13, "n_read": 2, "n_pruned": 11}
        or rep300 != {"n_files": 13, "n_read": 1, "n_pruned": 12}
    ):
        raise ValueError(
            f"spec evolution regressed: n_specs={n_specs}, "
            f"pt75={rep75}, pt300={rep300}"
        )

    def leg(tag: str, key: int, rep: dict) -> DataFrame:
        return table.read(where=("doc_id", "=", key)).select(
            F.lit(tag).alias("leg"),
            "doc_id",
            "lang",
            "n_chars",
            F.lit(rep["n_files"]).cast("long").alias("n_files_total"),
            F.lit(rep["n_read"]).cast("long").alias("n_files_read"),
            F.lit(n_specs).cast("long").alias("n_specs"),
        )

    return leg("pt75", 75, rep75).unionByName(leg("pt300", 300, rep300))


# ---------------------------------------------------------------------------
# Conditional MERGE (VERDICT r12 #7 — WHEN MATCHED AND cond, column subset)
# ---------------------------------------------------------------------------

_MC_SQL = """
    WITH merged AS (
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
        WHERE doc_id < 300
          AND NOT (doc_id BETWEEN 150 AND 249 AND doc_id % 2 = 0)
        UNION ALL
        SELECT doc_id, lang, CAST(n_chars + 10000 AS BIGINT)
        FROM documents
        WHERE doc_id BETWEEN 150 AND 249 AND doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, 'nw', CAST(n_chars + 10000 AS BIGINT)
        FROM documents WHERE doc_id BETWEEN 320 AND 329
    )
    SELECT doc_id, lang, n_chars,
           CAST(4 AS BIGINT) AS n_versions,
           CAST(2 AS BIGINT) AS merge_scope_files,
           CAST(50 AS BIGINT) AS n_delete_keys
    FROM merged
"""


@register(
    "q_snapshot_merge_conditional",
    sql=_MC_SQL,
    doc="Conditional MERGE at the snapshot layer (VERDICT r12 #7): "
    "merge_keys(matched_condition=..., update_cols=...) is WHEN "
    "MATCHED AND <cond over t/b> THEN UPDATE SET <subset>, WHEN NOT "
    "MATCHED THEN INSERT — still ONE commit. The delete leg is SPLIT "
    "by the condition (only keys that matched AND passed retire); a "
    "column-subset update composes the replacement row from the "
    "EXISTING row with only the named columns overwritten, reading "
    "only the stats-scoped candidate files, never the table. The "
    "query builds a three-file table over docs <300 (doc_id stats), "
    "then merges a batch covering 150-249 + 320-329 with "
    "matched_condition='b.doc_id % 2 = 0' and update_cols=['n_chars'] "
    "(+10000): EVEN docs 150-249 get the new n_chars but KEEP their "
    "lang (a whole-row-replace implementation overwrites lang to "
    "'nw' and fails the hash), ODD matched docs keep everything, "
    "320-329 insert whole. Lifecycle literals recomputed from the "
    "persisted manifests: n_versions=4 (one commit — a delete+append "
    "pair fails), merge_scope_files=2 of 3 (the even-key [150,248] "
    "interval proves the first file untouched), n_delete_keys=50 "
    "(exactly the passing keys — an unsplit delete leg carries 110 "
    "and fails loudly). Engine path sources/snapshots.py::"
    "_merge_keys_conditional.",
    tags=("storage", "snapshot", "merge"),
)
def q_snapshot_merge_conditional(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )
    root = _tmp_root(spark, sf_dir, "merge_conditional")
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
        batch = docs.filter(
            F.col("doc_id").between(150, 249)
            | F.col("doc_id").between(320, 329)
        ).select(
            "doc_id",
            F.lit("nw").alias("lang"),
            (F.col("n_chars") + 10000).alias("n_chars"),
        )
        table.merge_keys(
            batch.coalesce(1),
            ["doc_id"],
            matched_condition="b.doc_id % 2 = 0",
            update_cols=["n_chars"],
        )

    # audit literals recomputed from the PERSISTED manifests (the
    # staged setup rerun-skips), loud-fail on regression
    n_versions = len(table.versions())
    m = table._manifest(3)
    entries = m.get("deletes", [])
    scopes = [len(e["files"]) for e in entries]
    n_keys = (
        spark.read.parquet(*entries[0]["delete_files"]).count()
        if entries
        else 0
    )
    if n_versions != 4 or scopes != [2] or n_keys != 50:
        raise ValueError(
            f"conditional merge lifecycle regressed: {n_versions} "
            f"versions, delete scopes {scopes}, {n_keys} delete keys"
        )

    return table.read().select(
        "doc_id",
        "lang",
        "n_chars",
        F.lit(n_versions).cast("long").alias("n_versions"),
        F.lit(scopes[0]).cast("long").alias("merge_scope_files"),
        F.lit(n_keys).cast("long").alias("n_delete_keys"),
    )


# ---------------------------------------------------------------------------
# Snapshot DataSource read (VERDICT r12 #5 — the DSv2-style face)
# ---------------------------------------------------------------------------

_DS_SQL = """
    SELECT 'pt75' AS leg, doc_id, lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(13 AS BIGINT) AS n_files_total,
           CAST(2 AS BIGINT) AS n_files_planned
    FROM documents WHERE doc_id = 75
    UNION ALL
    SELECT 'pt300', doc_id, lang, CAST(n_chars AS BIGINT),
           CAST(13 AS BIGINT), CAST(1 AS BIGINT)
    FROM documents WHERE doc_id = 300
"""


@register(
    "q_snapshot_datasource_read",
    sql=_DS_SQL,
    doc="Snapshot table through Spark's native reader API with filter "
    "pushdown into manifest pruning (VERDICT r12 #5, the DSv2-style "
    "option): spark.read.format('scrappy_snapshot').option('path', "
    "...).load().filter(...) — a Spark 4 Python DataSource whose "
    "pushFilters (4.1 API) shrinks the FILE list through the same "
    "_pruned_files machinery as read(where=...) — min/max stats AND "
    "per-file partition specs under evolution — before any byte is "
    "scanned; every filter returns to Spark for post-scan "
    "re-evaluation, so pruning can only remove provably row-free "
    "files. Surviving files become one InputPartition each, read "
    "executor-side via pyarrow (Arrow batches; file-parallel, no "
    "row-at-a-time Python), with the version's column-id rename map "
    "applied and widening-append gaps null-filled per file. The query "
    "reads the evolved two-spec table (3 truncate + 10 bucket files) "
    "through the DataSource with point filters, pinning the PLANNED "
    "file counts from the reader's own pushFilters probe (2-of-13 "
    "and 1-of-13 — a pushdown that stops pruning fails the literals) "
    "and the row payload through Spark's planned path. Engine path "
    "sources/snapshot_datasource.py.",
    tags=("storage", "snapshot", "datasource", "pruning"),
)
def q_snapshot_datasource_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.snapshot_datasource import (
        SnapshotDataSource,
        SnapshotReader,
    )
    from ..sources.snapshots import SnapshotTable

    # runtime opt-ins: pushFilters needs the 4.1 conf; registration is
    # idempotent (driver sessions run without the engine's builder)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    ).filter(F.col("doc_id") < 500)
    root = _tmp_root(spark, sf_dir, "datasource_read")
    table = SnapshotTable(spark, os.path.join(root, "t"))
    head = table.current_version()
    if head is None:
        table.commit_partitioned(
            docs.filter(F.col("doc_id") < 250),
            "doc_id",
            "truncate",
            width=100,
        )
        head = 0
    if head == 0:
        table.commit_partitioned(
            docs.filter(F.col("doc_id") >= 250),
            "doc_id",
            "bucket",
            n=10,
            append=True,
        )

    def ds_load() -> DataFrame:
        # one load() per leg: each scan instance gets its own
        # pushFilters, so one leg's pushed point-filter can never
        # shadow the other's through a shared relation
        return (
            spark.read.format("scrappy_snapshot")
            .option("path", table.path)
            .load()
        )

    # planned-file literals recomputed from the reader's OWN
    # pushFilters probe (the persisted manifests), loud-fail
    import pyspark.sql.datasource as _D

    n_total = len(table._manifest(table.current_version())["files"])
    planned = {}
    for key in (75, 300):
        r = SnapshotReader({"path": table.path}, ds_load().schema)
        list(r.pushFilters([_D.EqualTo(("doc_id",), key)]))
        planned[key] = len(r.planned_files())
    if n_total != 13 or planned != {75: 2, 300: 1}:
        raise ValueError(
            f"datasource pushdown regressed: {n_total} files, "
            f"planned {planned}"
        )

    def leg(tag: str, key: int) -> DataFrame:
        return ds_load().filter(F.col("doc_id") == key).select(
            F.lit(tag).alias("leg"),
            "doc_id",
            "lang",
            "n_chars",
            F.lit(n_total).cast("long").alias("n_files_total"),
            F.lit(planned[key]).cast("long").alias("n_files_planned"),
        )

    return leg("pt75", 75).unionByName(leg("pt300", 300))


# ---------------------------------------------------------------------------
# Per-file Bloom pruning (the point-lookup axis stats cannot express)
# ---------------------------------------------------------------------------

_BL_SQL = """
    SELECT 'even' AS leg, doc_id, lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(2 AS BIGINT) AS n_files_total,
           CAST(1 AS BIGINT) AS n_files_read
    FROM documents WHERE doc_id = 76
    UNION ALL
    SELECT 'odd', doc_id, lang, CAST(n_chars AS BIGINT),
           CAST(2 AS BIGINT), CAST(1 AS BIGINT)
    FROM documents WHERE doc_id = 77
    UNION ALL
    SELECT 'absent', doc_id, lang, CAST(n_chars AS BIGINT),
           CAST(2 AS BIGINT), CAST(0 AS BIGINT)
    FROM documents WHERE FALSE
"""


@register(
    "q_snapshot_bloom_pruned_read",
    sql=_BL_SQL,
    doc="Per-file BLOOM filters in the snapshot manifest — the THIRD "
    "pruning axis, for the case neither of the other two covers: "
    "point lookups on columns whose values INTERLEAVE across files "
    "as they naturally landed (two files both spanning [0, 500) are "
    "never min/max-pruned, and bucket partitioning only helps by "
    "REWRITING the layout). commit(bloom_cols=['doc_id']) scans the "
    "new files' column once (the collected volume is the ~1 KB/file "
    "manifest payload, not the data), appends inherit the "
    "designation, and '='/'in' reads hash the literal with the "
    "JVM-equal pure xxh64 (same type-family guard as bucket probes) "
    "to drop files whose bloom proves the key definitely absent — "
    "'maybe present' keeps the file, so false positives cost "
    "selectivity, never correctness. The query commits even doc_ids "
    "<500 (bloom-designated) and appends odd doc_ids: both files "
    "span the SAME range, so a stats-only implementation reads 2-of-2 "
    "and fails the pinned literals — doc 76 reads 1-of-2, doc 77 "
    "reads the OTHER 1-of-2, and an absent key (doc_id=9999) reads "
    "0-of-2 (pinned via prune_report, recomputed from the persisted "
    "manifest). Engine path sources/snapshots.py::_collect_blooms/"
    "_bloom_excludes/_pruned_files.",
    tags=("storage", "snapshot", "pruning", "bloom"),
)
def q_snapshot_bloom_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    ).filter(F.col("doc_id") < 500)
    root = _tmp_root(spark, sf_dir, "bloom_pruned")
    table = SnapshotTable(spark, os.path.join(root, "t"))

    head = table.current_version()
    if head is None:
        table.commit(
            docs.filter(F.col("doc_id") % 2 == 0).coalesce(1),
            bloom_cols=["doc_id"],
        )
        head = 0
    if head == 0:
        table.commit(
            docs.filter(F.col("doc_id") % 2 == 1).coalesce(1),
            append=True,
        )

    # pruning literals recomputed from the PERSISTED manifest
    reps = {
        76: table.prune_report(("doc_id", "=", 76)),
        77: table.prune_report(("doc_id", "=", 77)),
        9999: table.prune_report(("doc_id", "=", 9999)),
    }
    if (
        reps[76] != {"n_files": 2, "n_read": 1, "n_pruned": 1}
        or reps[77] != {"n_files": 2, "n_read": 1, "n_pruned": 1}
        or reps[9999]["n_read"] != 0
    ):
        raise ValueError(f"bloom pruning regressed: {reps}")

    def leg(tag: str, key: int) -> DataFrame:
        return table.read(where=("doc_id", "=", key)).select(
            F.lit(tag).alias("leg"),
            "doc_id",
            "lang",
            "n_chars",
            F.lit(2).cast("long").alias("n_files_total"),
            F.lit(reps[key]["n_read"]).cast("long").alias("n_files_read"),
        )

    return (
        leg("even", 76)
        .unionByName(leg("odd", 77))
        .unionByName(leg("absent", 9999))
    )


# ---------------------------------------------------------------------------
# Multi-field partition specs (the full Iceberg spec shape)
# ---------------------------------------------------------------------------

_MF_SQL = """
    SELECT 'pt77' AS leg, doc_id, lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(1 AS BIGINT) AS n_files_read
    FROM documents WHERE doc_id = 77
    UNION ALL
    SELECT 'pt300', doc_id, lang, CAST(n_chars AS BIGINT),
           CAST(1 AS BIGINT)
    FROM documents WHERE doc_id = 300
"""


@register(
    "q_snapshot_multifield_partition",
    sql=_MF_SQL,
    doc="MULTI-FIELD partition specs — the full Iceberg shape: "
    "commit_partitioned_multi(docs, [('lang', 'identity', None), "
    "('doc_id', 'bucket', 5)]) records the spec as a FIELD LIST and "
    "each file's partition-value VECTOR; a read prunes a file when "
    "ANY field's component disproves a conjunct on that field's "
    "column. The oracle pins the composed economics: a point lookup "
    "carrying BOTH conjuncts (the row's own lang + its doc_id) reads "
    "EXACTLY 1 file — identity pruning drops every other lang's "
    "files, bucket pruning drops the same lang's other buckets — for "
    "two different rows (docs 77 and 300), recomputed from the "
    "persisted manifest via prune_report (a single-field or "
    "keep-everything implementation reads more and fails loudly); "
    "the row payload pins no matching row is ever dropped. "
    "Single-field commit_partitioned is the same code path with a "
    "one-field list and the unchanged flat manifest format. Engine "
    "path sources/snapshots.py::commit_partitioned_multi/"
    "_pruned_files.",
    tags=("storage", "snapshot", "pruning", "partitioning"),
)
def q_snapshot_multifield_partition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    ).filter(F.col("doc_id") < 500)
    root = _tmp_root(spark, sf_dir, "multifield_partition")
    table = SnapshotTable(spark, os.path.join(root, "t"))
    if table.current_version() is None:
        table.commit_partitioned_multi(
            docs, [("lang", "identity", None), ("doc_id", "bucket", 5)]
        )

    m = table._manifest(table.current_version())
    if len(m["partition_spec"].get("fields", [])) != 2:
        raise ValueError("multi-field spec missing from the manifest")

    def leg(tag: str, key: int) -> DataFrame:
        # the row's own lang: a one-row driver probe (request-sized)
        lang = docs.filter(F.col("doc_id") == key).first()["lang"]
        where = [("lang", "=", lang), ("doc_id", "=", key)]
        rep = table.prune_report(where)
        if rep["n_read"] != 1:
            raise ValueError(
                f"multi-field pruning regressed for doc {key}: {rep}"
            )
        return table.read(where=where).select(
            F.lit(tag).alias("leg"),
            "doc_id",
            "lang",
            "n_chars",
            F.lit(rep["n_read"]).cast("long").alias("n_files_read"),
        )

    return leg("pt77", 77).unionByName(leg("pt300", 300))
