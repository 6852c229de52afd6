"""Direct SQL surface: register the engine's tables as temp views and
run arbitrary Spark SQL against them.

The reference has no SQL at all (four hard-coded pandas predicates,
article_querry.py:13-28); this module is the "bring your own query"
completion of that surface — everything Catalyst supports works,
with the same lazy scans and pushdown the declared queries get.

    from scrappy_spark.sqlapi import register_tables
    register_tables(spark, "/root/testdata/sf0.01", store_path="mystore")
    spark.sql("SELECT source, count(*) FROM articles GROUP BY source")

CLI: ``--sql "SELECT ..."`` (fixture tables via ``--sf-dir``; the
article store is always registered as ``articles``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import load_table
from .schema import FIXTURE_TABLES


def register_tables(
    spark: SparkSession,
    sf_dir: str | None = None,
    store_path: str | None = None,
) -> list[str]:
    """Create temp views: every fixture table in ``sf_dir`` (skipping
    absent files) and the article store as ``articles``. Views are
    lazy — nothing is scanned until a query runs. Returns the view
    names registered."""
    names: list[str] = []
    if sf_dir is not None:
        import os

        for t in FIXTURE_TABLES:
            if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
                load_table(spark, sf_dir, t).createOrReplaceTempView(t)
                names.append(t)
    if store_path is not None:
        from .sources.store import ArticleStore

        ArticleStore(spark, store_path).read().createOrReplaceTempView("articles")
        names.append("articles")
    return names


def register_snapshot(
    spark: SparkSession,
    path: str,
    name: str,
    version: int | None = None,
    as_of: float | None = None,
    branch: str = "main",
    tag: str | None = None,
    metadata: bool = False,
    since: int | None = None,
) -> str:
    """SQL face for a :class:`~scrappy_spark.sources.snapshots.
    SnapshotTable` (VERDICT r12 #5): register the table at a pinned
    version (or TIMESTAMP AS OF via ``as_of``; default HEAD) as a temp
    view, so arbitrary Spark SQL — joins against fixtures, window
    functions, aggregations — runs over exactly that version's file
    list with the version's recorded (id-mapped) schema. The view is
    a snapshot in both senses: concurrent commits never move it, and
    re-registering is how you follow the head. Returns the view name.

    ``branch`` scopes version resolution to a branch's manifest line;
    ``tag`` pins a tagged (branch, version) pair from any handle;
    ``metadata=True`` additionally registers the Iceberg-style
    metadata tables as ``<name>_files`` / ``<name>_history`` /
    ``<name>_refs`` views, so operational questions (small-file skew,
    growth over versions, which refs pin what) are plain SQL too.

    CLI: ``--register-snapshot name=path[@version]`` (repeatable)
    alongside ``--sql``."""
    from .sources.snapshots import SnapshotTable, resolve_pin

    branch, version, as_of = resolve_pin(
        spark, path, branch=branch, version=version, as_of=as_of, tag=tag
    )
    t = SnapshotTable(spark, path, branch=branch)
    # resolve to a CONCRETE version once, so the data view and the
    # metadata views pin the same snapshot even against a concurrent
    # writer (head would re-resolve per view otherwise)
    if as_of is not None:
        if version is not None:
            raise ValueError("register_snapshot: pass version OR as_of")
        version = t.version_as_of(as_of)
    elif version is None:
        version = t.current_version()
    # since=N: the view is the INCREMENTAL append scan — rows added
    # after version N up to the pinned version (read_incremental's
    # file-grain changes-since, with its append-only-range guard) —
    # so an ingest consumer's "process the new batches" is plain SQL
    df = (
        t.read_incremental(since, version)
        if since is not None
        else t.read(version=version)
    )
    df.createOrReplaceTempView(name)
    if metadata:
        t.files_df(version=version).createOrReplaceTempView(f"{name}_files")
        t.history_df().createOrReplaceTempView(f"{name}_history")
        t.refs_df().createOrReplaceTempView(f"{name}_refs")
    return name


def run_sql(
    spark: SparkSession,
    query: str,
    sf_dir: str | None = None,
    store_path: str | None = None,
    snapshots: list[str] | None = None,
) -> DataFrame:
    """``snapshots``: CLI-shaped specs ``name=path[@pin]`` — each
    registers a snapshot-table view before the query runs. ``@N``
    pins a version, ``@ts:<epoch-seconds>`` a timestamp (TIMESTAMP
    AS OF), ``@tag:<name>`` a tag, ``@branch:<name>`` a branch's
    head; omitted = main HEAD."""
    register_tables(spark, sf_dir=sf_dir, store_path=store_path)
    for spec in snapshots or []:
        name, _, rest = spec.partition("=")
        if not name or not rest:
            raise ValueError(
                f"--register-snapshot expects name=path[@pin], "
                f"got {spec!r}"
            )
        path, _, ver = rest.rpartition("@")
        if not path:  # no '@': the whole rest is the path, read HEAD
            path, ver = rest, ""
        as_of = None
        version = None
        branch = "main"
        tag = None
        if ver.startswith("ts:"):
            as_of = float(ver[3:])
        elif ver.startswith("tag:"):
            tag = ver[4:]
        elif ver.startswith("branch:"):
            branch = ver[7:]
        elif ver:
            version = int(ver)
        register_snapshot(
            spark,
            path,
            name.strip(),
            version=version,
            as_of=as_of,
            branch=branch,
            tag=tag,
        )
    return spark.sql(query)
