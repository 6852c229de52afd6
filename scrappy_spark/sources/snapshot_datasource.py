"""Spark 4 Python DataSource for :class:`SnapshotTable` with FILTER
PUSHDOWN into manifest pruning (VERDICT r12 #5, the "better" option):

    spark.dataSource.register(SnapshotDataSource)
    df = (spark.read.format("scrappy_snapshot")
          .option("path", "/tables/docs")
          .option("version", 3)            # or .option("as_of", epoch)
          .load()
          .filter("doc_id = 7"))           # prunes at the MANIFEST

Why this beats a plain view: ``sqlapi.register_snapshot`` pins a
version for arbitrary SQL, but its view reads the version's WHOLE
file list — Spark's filter runs post-scan. This reader implements
``pushFilters`` (Spark 4.1 Python DataSource API): equality / range /
IN conjuncts on stats- or partition-tracked columns shrink the file
list through the same ``_pruned_files`` machinery ``read(where=...)``
uses — min/max stats, partition specs (bucket / truncate / identity,
per-file spec under evolution) — BEFORE any byte is scanned, and each
surviving file becomes one ``InputPartition`` read executor-side via
pyarrow (Arrow batches, no row-at-a-time Python). All filters are
returned to Spark for post-scan re-evaluation, so pruning can never
change results — it only removes provably row-free files, exactly the
Iceberg DSv2 contract.

Scale shape: planning is manifest-grain (driver metadata), the scan
is file-parallel across executors, and a selective predicate on a
100 TB table reads 1/n files by construction. Schema evolution
composes: each partition carries its file's column-id rename map and
the version's logical Arrow schema, so renamed columns read under
their current name and files predating a widening append yield typed
NULL columns.

The WRITE half completes the DSv2 story:

    df.write.format("scrappy_snapshot").mode("append")
      .option("path", ...).option("stats_cols", "doc_id").save()

— tasks stream Arrow batches to parquet under one writer-unique
staging dir; the job-level commit runs the session-free back half of
``SnapshotTable.commit`` (schema unification by column id, footer
stats, optimistic-concurrency append rebase), and an aborted job
reclaims its staging dir (nothing ever referenced it).

Pending row-level deletes are applied MERGE-ON-READ inside the scan
(round 14): each file's partition carries the delete entries scoping
it (columns resolved to current names at planning time), and the
executor applies them with pyarrow compute — predicates as vectorized
masks (NULL never matches → row kept), key lists as an anti-join
against the entry's delete-key parquet (request-grain: the scope was
stats-narrowed at delete time). Same results as ``read()`` /
``apply_deletes``, no rewrite required first.

Branch reads: ``.option("branch", "dev")`` scopes version resolution
(head / ``version`` / ``as_of``) to that branch's manifest line —
the DataSource face of ``SnapshotTable.for_branch``. The writer
accepts the option too, committing to the branch's head under its
own conflict gate.

SHARP EDGE (upstream, measured): when ONE ``load()`` feeds two
branches with DIFFERENT filters (e.g. a self-union of two point
lookups), Spark 4.1 plans each branch's pushdown correctly (traced:
two reader instances, each with its own pruned partition list) but
then DEDUPLICATES the two Python BatchScans at execution — scan
equality ignores pushed-filter state — so both branches execute ONE
branch's partitions and the other branch silently loses rows. This is
not controllable from inside the reader (our pushFilters already
re-prunes from the full list per call and unions across repeated
calls). Rules: (1) call ``load()`` once per differently-filtered
subplan — separate relations never dedup (measured correct); or
(2) pin pruning at load time with the ``where`` option —
``.option("where", '[["doc_id", "=", 7]]')`` (JSON conjunct triples,
same ops as ``read(where=...)``) prunes the file list in the reader
constructor, making the relation's partitions independent of any
branch's pushdown; the filter itself must still be applied (the
option prunes FILES, it does not filter rows).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(
        self, path: str, rename: dict[str, str], deletes: tuple = ()
    ):
        self.path = path
        self.rename = rename  # write-schema name -> current name
        # merge-on-read program: the delete entries scoping this file,
        # names already resolved to CURRENT columns at planning time
        self.deletes = deletes


def _conjunct(f: Filter):
    """Map a pushed Filter to the (col, op, value) conjunct form
    ``_pruned_files`` understands; None = not prunable here."""
    ops = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
        In: "in",
    }
    op = ops.get(type(f))
    if op is None or len(f.attribute) != 1:  # no nested refs
        return None
    val = list(f.value) if op == "in" else f.value
    return (f.attribute[0], op, val)


def _apply_delete_arrow(out, entry: dict):
    """One merge-on-read delete entry against one file's Arrow table —
    the executor-side twin of SnapshotTable._apply_delete, same NULL
    semantics: a NULL in a predicate or key column never matches, so
    the row is KEPT (SQL DELETE / anti-join behavior).

    Cost shape: predicate entries are pure vectorized compute; a keys
    entry re-reads its delete-key parquet per scoped file — delete
    lists are O(takedown request) and the entry's scope is
    stats-narrowed at delete time, so this stays request-grain, not
    table-grain."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if entry["kind"] == "pred":
        mask = None
        for name, op, val in entry["conjuncts"]:
            col = out[name]

            def lit(v):
                try:
                    return pa.scalar(v, type=col.type)
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    return v

            if op == "=":
                m = pc.equal(col, lit(val))
            elif op == "<":
                m = pc.less(col, lit(val))
            elif op == "<=":
                m = pc.less_equal(col, lit(val))
            elif op == ">":
                m = pc.greater(col, lit(val))
            elif op == ">=":
                m = pc.greater_equal(col, lit(val))
            elif op == "between":
                lo, hi = val
                m = pc.and_kleene(
                    pc.greater_equal(col, lit(lo)),
                    pc.less_equal(col, lit(hi)),
                )
            elif op == "in":
                vals = [v for v in val if v is not None]
                m = pc.is_in(col, value_set=pa.array(vals, type=col.type))
            else:  # pragma: no cover — delete_where validates ops
                raise ValueError(f"unknown delete op {op!r}")
            mask = m if mask is None else pc.and_kleene(mask, m)
        if mask is None:
            return out
        return out.filter(pc.invert(pc.fill_null(mask, False)))
    names = entry["names"]
    kt = pq.read_table(entry["delete_files"]).rename_columns(names)
    if len(names) == 1:
        col = out[names[0]]
        # drop NULLs from the probe set: pc.is_in matches null-vs-null
        # (measured), but anti-join semantics — and the DataFrame
        # path — keep NULL-keyed rows (a NULL key matches nothing)
        keys = pc.drop_null(kt[names[0]].cast(col.type))
        mask = pc.is_in(col, value_set=keys.combine_chunks())
        return out.filter(pc.invert(pc.fill_null(mask, False)))
    # acero's hash join already treats NULL keys as non-matching
    return out.join(kt, keys=names, join_type="left anti")


class SnapshotReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        from .snapshots import SnapshotTable

        path = options.get("path")
        if not path:
            raise ValueError("scrappy_snapshot: path option is required")
        # a throwaway driver-side handle: the reader only touches
        # manifests (metadata), never runs Spark jobs itself — except
        # the one-row bucket probes, which need the session
        from pyspark.sql import SparkSession

        from .snapshots import resolve_pin

        spark = SparkSession.getActiveSession()
        branch, version, as_of = resolve_pin(
            spark,
            path,
            branch=options.get("branch", "main"),
            version=options.get("version"),
            as_of=options.get("as_of"),
            tag=options.get("tag"),
        )
        self._table = SnapshotTable(spark, path, branch=branch)
        v = (
            self._table.version_as_of(float(as_of))
            if as_of is not None
            else (int(version) if version is not None else None)
        )
        v = self._table.current_version() if v is None else v
        if v is None:
            raise ValueError(f"snapshot table {path!r} has no commits")
        self._m = self._table._manifest(v)
        # merge-on-read: resolve each pending delete entry's columns
        # to CURRENT names at planning time (ids are rename-proof);
        # executors apply them per file with pyarrow compute — the
        # same semantics as the DataFrame path's _apply_delete
        # (predicate: NULL never matches, row kept; keys: anti-join).
        self._delete_prog: list[dict] = []
        if self._m.get("deletes"):
            _, by_key = self._table._resolve_cols(self._m)
            for e in self._m["deletes"]:
                if e["kind"] == "pred":
                    prog = {
                        "kind": "pred",
                        "conjuncts": [
                            [by_key[str(k)], op, v2]
                            for k, op, v2 in e["conjuncts"]
                        ],
                    }
                else:
                    prog = {
                        "kind": "keys",
                        "names": [
                            by_key[str(kc["id"])] for kc in e["key_cols"]
                        ],
                        "delete_files": list(e["delete_files"]),
                    }
                prog["files"] = set(e["files"])
                self._delete_prog.append(prog)
        self._schema = schema
        self._files = list(self._m["files"])
        # load-time pruning: .option("where", '[["col","op",value],...]')
        # — deterministic per relation, immune to the branch-dedup
        # sharp edge (see module docstring); rows still need the filter
        raw_where = options.get("where")
        if raw_where:
            conjuncts = [
                (c[0], c[1], tuple(c[2]) if isinstance(c[2], list) and c[1] == "between" else (c[2] if c[1] != "in" else list(c[2])))
                for c in json.loads(raw_where)
            ]
            self._files, _ = self._table._pruned_files(self._m, conjuncts)
        self._base_files = list(self._files)  # post-where floor
        self._pushed: list = []

    def __getstate__(self):
        # the reader is pickled to executors for read(); the table
        # handle (and its SparkSession) is planning-only state —
        # pushFilters/partitions run on the driver before pickling
        state = dict(self.__dict__)
        state["_table"] = None
        return state

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        conjuncts = []
        for f in filters:
            c = _conjunct(f)
            if c is not None and c[0] in self._schema.fieldNames():
                conjuncts.append(c)
        # Defensive contract: calls never compound and never
        # last-write-wins — each call prunes from the post-`where`
        # base list, and repeated calls on one reader UNION their
        # survivors, keeping every file any caller needs. Extra files
        # are re-filtered by Spark post-scan, so widening is always
        # correct. (The branch-dedup sharp edge in the module
        # docstring happens ABOVE this layer — per-branch planning
        # here is correct even there, traced.)
        pruned = list(self._base_files)
        if conjuncts:
            try:
                got, _ = self._table._pruned_files(self._m, conjuncts)
                keep = set(got)
                # intersect with the load-time `where` floor
                pruned = [p for p in self._base_files if p in keep]
            except ValueError:
                pass  # unknown column etc.: prune nothing
        if self._pushed:
            seen = set(self._files)
            self._files = self._files + [
                p for p in pruned if p not in seen
            ]
        else:
            self._files = list(pruned)
        self._pushed.append(conjuncts)
        # every filter goes back to Spark: pruning only removed
        # provably row-free FILES, rows still need the predicate
        return iter(filters)

    def partitions(self) -> list[_FilePartition]:
        schemas = self._m.get("schemas")
        file_schema = self._m.get("file_schema", {})
        cur_by_id = {
            c["id"]: c["name"] for c in self._m.get("columns", [])
        }
        parts = []
        for p in self._files:
            rename: dict[str, str] = {}
            if schemas is not None and p in file_schema:
                for c in schemas[file_schema[p]]:
                    if c["id"] in cur_by_id:
                        rename[c["name"]] = cur_by_id[c["id"]]
            dels = tuple(
                {k: v for k, v in e.items() if k != "files"}
                for e in self._delete_prog
                if p in e["files"]
            )
            parts.append(_FilePartition(p, rename, dels))
        return parts

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        tbl = pq.read_table(partition.path)
        if partition.rename:
            tbl = tbl.rename_columns(
                [partition.rename.get(n, n) for n in tbl.column_names]
            )
        cols = []
        for field in target:
            if field.name in tbl.column_names:
                arr = tbl[field.name]
                if arr.type != field.type:
                    arr = arr.cast(field.type)
            else:
                # file predates this column (widening append): typed NULL
                arr = pa.nulls(len(tbl), type=field.type)
            cols.append(arr)
        out = pa.table(cols, schema=target)
        for entry in partition.deletes:
            out = _apply_delete_arrow(out, entry)
            if out.schema != target:  # anti-join may drop metadata
                out = out.select(target.names).cast(target)
        yield from out.to_batches()

    # planned-files introspection for tests / prune pinning
    def planned_files(self) -> list[str]:
        return list(self._files)


class SnapshotDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "scrappy_snapshot"

    def schema(self) -> StructType:
        from .snapshots import SnapshotTable, _struct_of

        from pyspark.sql import SparkSession

        path = self.options.get("path")
        if not path:
            raise ValueError("scrappy_snapshot: path option is required")
        from .snapshots import resolve_pin

        spark = SparkSession.getActiveSession()
        branch, version, as_of = resolve_pin(
            spark,
            path,
            branch=self.options.get("branch", "main"),
            version=self.options.get("version"),
            as_of=self.options.get("as_of"),
            tag=self.options.get("tag"),
        )
        t = SnapshotTable(spark, path, branch=branch)
        v = (
            t.version_as_of(float(as_of))
            if as_of is not None
            else (int(version) if version is not None else None)
        )
        v = t.current_version() if v is None else v
        if v is None:
            raise ValueError(f"snapshot table {path!r} has no commits")
        m = t._manifest(v)
        if "columns" in m:
            return _struct_of(m["columns"])
        if "schema" in m:
            return StructType.fromJson(json.loads(m["schema"]))
        raise ValueError(
            f"scrappy_snapshot: version {v} predates schema recording"
        )

    def reader(self, schema: StructType) -> SnapshotReader:
        return SnapshotReader(dict(self.options), schema)

    def writer(self, schema: StructType, overwrite: bool):
        return SnapshotArrowWriter(dict(self.options), schema, overwrite)


# --------------------------------------------------------------- write path


class _WrittenFile(WriterCommitMessage):
    def __init__(self, path: str | None, rows: int):
        self.path = path
        self.rows = rows


class SnapshotArrowWriter(DataSourceArrowWriter):
    """The write half of the DSv2-style face:

        df.write.format("scrappy_snapshot").mode("append") \\
          .option("path", "/tables/docs") \\
          .option("stats_cols", "doc_id") \\
          .save()

    Each task streams its Arrow batches into ONE parquet file under a
    writer-unique ``data/snap-{token}`` staging dir (chosen once at
    plan time, so the whole job shares a dir the expire grace
    protects); the driver-side ``commit`` then runs the SAME manifest
    assembly + os.link publication as ``SnapshotTable.commit``
    (``_commit_new_files`` — session-free by design, because this
    hook runs in a Python worker with no SparkSession): schema
    unification by column id, footer min/max stats for
    ``stats_cols``, optimistic-concurrency append rebase. ``mode``
    maps exactly: ``append`` appends (parent files + new), any
    overwrite mode replaces. A failed job aborts by deleting the
    staging dir — nothing was ever referenced.

    ``.option("partition_by", "lang,doc_id:bucket:8")`` (round 14)
    partitions the write: each task splits its Arrow batches by the
    transform components — identity / truncate vectorially, bucket
    through the JVM-equality pure xxh64 (NULL hashes to the seed,
    exactly like Spark's xxhash64) — into one file per value
    combination under the same Hive-style staging layout
    ``commit_partitioned_multi`` uses, and the commit hook publishes
    through the session-free ``_commit_partitioned_staged``: the
    manifest records the spec + per-file value vectors, appends under
    a different spec EVOLVE it, and reads prune identically to the
    DataFrame write path (bucket-dir parity JVM-vs-pure is pinned by
    test). Scope: int/string partition columns (the types whose
    values round-trip the staging encoding and whose hash the pure
    xxh64 provably matches); pre-shuffle the frame by the partition
    columns to avoid one file per combination per task.

    Not supported here: ``bloom_cols`` — building Bloom filters needs
    a distributed pass over the new data, and this commit hook runs
    where no SparkSession exists; run ``add_blooms`` afterwards (one
    metadata-only commit) or commit through
    ``SnapshotTable.commit(bloom_cols=...)``."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("scrappy_snapshot: path option is required")
        self._path = path
        self._branch = options.get("branch", "main")
        if self._branch != "main" and not os.path.isdir(
            os.path.join(path, "_manifests", "branches", self._branch)
        ):
            raise ValueError(
                f"scrappy_snapshot: no branch {self._branch!r} at "
                f"{path!r} — create_branch first (a typo'd branch "
                f"name must not silently land data on a stray line)"
            )
        self._append = not overwrite
        self._schema = schema
        self._message = options.get("message", "")
        raw = options.get("stats_cols", "")
        self._stats_cols = [c.strip() for c in raw.split(",") if c.strip()]
        from .snapshots import _norm_part_fields, _token

        # .option("partition_by", "lang,doc_id:bucket:8") — the CLI
        # grammar; commits through _commit_partitioned_staged so the
        # manifest carries the spec + per-file values and reads prune
        self._norm: list[tuple] = []
        self._pnames: list[str] = []
        spec_raw = options.get("partition_by", "")
        if spec_raw:
            fields = []
            for f in spec_raw.split(","):
                bits = f.strip().split(":")
                if len(bits) == 1:
                    fields.append((bits[0], "identity", None))
                elif len(bits) == 3 and bits[1] in ("bucket", "truncate"):
                    fields.append((bits[0], bits[1], int(bits[2])))
                else:
                    raise ValueError(
                        f"scrappy_snapshot: bad partition_by field "
                        f"{f!r} (use 'col', 'col:bucket:N' or "
                        f"'col:truncate:W')"
                    )
            dtypes = {
                fld.name: fld.dataType.simpleString()
                for fld in schema.fields
            }
            self._norm = _norm_part_fields(fields, dtypes)
            for col, transform, _n, _w, st in self._norm:
                # the writer computes components in Python (no JVM):
                # restrict to the types whose values round-trip the
                # staged-dir encoding and — for bucket — whose hash
                # the pure xxh64 provably matches Spark's
                if st not in (
                    "tinyint", "smallint", "int", "bigint", "string",
                ):
                    raise ValueError(
                        f"scrappy_snapshot: partition_by {transform} "
                        f"on {col!r}: {st} is outside the writer's "
                        f"verified scope (int/string) — use "
                        f"SnapshotTable.commit_partitioned_multi"
                    )
            self._pnames = (
                ["__p"]
                if len(self._norm) == 1
                else [f"__p{i}" for i in range(len(self._norm))]
            )
        self._snap_dir = os.path.join(path, "data", f"snap-{_token()}")

    def write(self, iterator):
        import uuid

        import pyarrow.parquet as pq

        if self._norm:
            return self._write_partitioned(iterator)
        os.makedirs(self._snap_dir, exist_ok=True)
        out = os.path.join(
            self._snap_dir, f"part-{uuid.uuid4().hex[:12]}.parquet"
        )
        writer = None
        rows = 0
        try:
            for batch in iterator:
                if writer is None:
                    writer = pq.ParquetWriter(out, batch.schema)
                writer.write_batch(batch)
                rows += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        if writer is None:
            return _WrittenFile(None, 0)  # empty partition: no file
        return _WrittenFile(out, rows)

    def _components(self, batch):
        """Per-row partition component tuple for one Arrow batch —
        the Python twin of the expressions commit_partitioned_multi
        computes JVM-side: identity = the value, truncate =
        v - v % w, bucket = pmod(xxhash64(v), n) through the
        JVM-equality pure xxh64 (NULL hashes to the seed, exactly as
        Spark's xxhash64 does; identity/truncate NULLs land in the
        Hive default dir)."""
        from ..functions.xxh64 import SPARK_SEED, spark_xxhash64

        cols = []
        for col, transform, n, width, st in self._norm:
            vals = batch.column(batch.schema.get_field_index(col)).to_pylist()
            if transform == "identity":
                cols.append(vals)
            elif transform == "truncate":
                cols.append(
                    [None if v is None else v - v % width for v in vals]
                )
            else:  # bucket
                out = []
                memo: dict = {}
                for v in vals:
                    k = (type(v).__name__, v)
                    if k not in memo:
                        h = (
                            SPARK_SEED
                            if v is None
                            else spark_xxhash64(v, st)
                        )
                        memo[k] = None if h is None else int(h % n)
                    out.append(memo[k])
                if any(b is None for b in out):
                    raise ValueError(
                        f"scrappy_snapshot: partition_by bucket on "
                        f"{col!r}: a value fell outside the pure "
                        f"hash's verified scope"
                    )
                cols.append(out)
        return list(zip(*cols)) if cols else []

    def _write_partitioned(self, iterator):
        """One parquet file per distinct partition-value combination
        per task, under the same Hive-style ``__p=<value>`` layout
        ``commit_partitioned_multi`` stages — so the session-free
        commit half (``_commit_partitioned_staged``) recovers each
        file's value vector identically for both write paths."""
        import uuid

        import pyarrow.parquet as pq
        from urllib.parse import quote

        task = uuid.uuid4().hex[:12]
        writers: dict = {}
        rows = 0
        try:
            for batch in iterator:
                keys = self._components(batch)
                if not keys:
                    continue
                by_key: dict = {}
                for i, k in enumerate(keys):
                    by_key.setdefault(k, []).append(i)
                for k, idx in by_key.items():
                    w = writers.get(k)
                    if w is None:
                        comps = [
                            f"{self._pnames[j]}="
                            + (
                                "__HIVE_DEFAULT_PARTITION__"
                                if v is None
                                else quote(str(v), safe="")
                            )
                            for j, v in enumerate(k)
                        ]
                        d = os.path.join(self._snap_dir, *comps)
                        os.makedirs(d, exist_ok=True)
                        out = os.path.join(d, f"part-{task}.parquet")
                        w = pq.ParquetWriter(out, batch.schema)
                        writers[k] = w
                    w.write_batch(batch.take(idx))
                    rows += len(idx)
        finally:
            for w in writers.values():
                w.close()
        # files are recovered by the staged-dir walk at commit time
        return _WrittenFile(None, rows)

    def commit(self, messages):
        from .snapshots import SnapshotTable

        table = SnapshotTable(None, self._path, branch=self._branch)
        message = self._message or (
            f"datasource {'append' if self._append else 'replace'}"
        )
        if self._norm:
            table._commit_partitioned_staged(
                self._snap_dir,
                self._norm,
                self._pnames,
                self._schema,
                message,
                self._append,
                self._stats_cols or None,
                10,
            )
            return
        files = sorted(
            m.path for m in messages if m is not None and m.path
        )
        table._commit_new_files(
            files,
            self._schema,
            message,
            append=self._append,
            stats_cols=self._stats_cols or None,
            max_retries=10,
        )

    def abort(self, messages):
        import shutil

        # nothing referenced the staging dir; reclaim it eagerly
        shutil.rmtree(self._snap_dir, ignore_errors=True)
