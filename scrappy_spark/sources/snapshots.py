"""Snapshot table: immutable data files + atomic manifest pointer —
the core of every modern table format (Iceberg/Delta/Hudi), distilled
to a dependency-free implementation.

Why the engine carries this: at 100 TB, "overwrite the table" is not
an operation — writers must land new files WITHOUT disturbing readers,
and reproducibility demands that yesterday's training run can re-read
yesterday's exact table. Both fall out of two invariants:

1. **Data files are immutable.** Every commit writes fresh parquet
   files under ``data/snap-N/``; nothing ever rewrites or deletes a
   file a live manifest references.
2. **State is one pointer.** A version is a JSON manifest (the file
   list + row count + lineage) published by an atomic ``os.link`` —
   POSIX hard-linking fails if the name exists, so version N can land
   exactly once. Readers resolve the head (or any pinned version) to
   a file list and read only those files — a concurrent commit is
   invisible to them — and a concurrent WRITER is detected, never
   silently overwritten: the second writer to version N gets a
   :class:`CommitConflict` (optimistic concurrency, the Iceberg
   model). Appends rebase-and-retry automatically (an append's files
   are fresh, so it commutes with any concurrent commit — Iceberg's
   fast-append); every other operation surfaces the conflict loudly
   and is safe to re-run (each recomputes from the new head).

Consequences, each tested:

- **Time travel**: ``read(version=3)`` reproduces version 3 forever
  (until ``expire`` drops it).
- **Crash safety**: a writer dying mid-commit leaves an orphan
  ``data/snap-N`` dir and/or a tmp manifest — both invisible to
  readers (nothing references them) and swept by ``expire``.
- **O(1) commit**: publishing is one manifest write + one rename, no
  matter the table size.
- **Append without rewrite**: ``commit(df, append=True)`` references
  the parent's files PLUS the new ones — the 100 TB ingest shape
  (the reference rewrites its whole CSV per merge, scrappy.py:350).

On a real cluster the same layout works on any rename-capable store
(HDFS; on S3, swap the HEAD rename for a conditional PUT). This module
complements ``store.ArticleStore`` (partition-selective merge for the
articles table) with format-level versioning for arbitrary frames.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType


class CommitConflict(RuntimeError):
    """A concurrent writer published this version first (VERDICT r11
    #1). The losing commit's data files are orphans (swept by
    ``expire``); table state is untouched. Appends handle this
    internally by rebasing onto the new head; for every other
    operation the caller may simply re-run it — each reads the head
    at entry, so a re-run IS the rebase."""


def _branch_mdir(path: str, branch: str) -> str:
    if branch == "main":
        return os.path.join(path, "_manifests")
    return os.path.join(path, "_manifests", "branches", branch)


def _check_ref_name(name: str) -> None:
    """Refuse ref names that would escape the refs directory or
    collide with the manifest-listing grammar (``v*.json``, ``HEAD``,
    ``*.tmp``)."""
    import re

    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", name) or name in (
        "main",
        "HEAD",
    ):
        raise ValueError(
            f"invalid ref name {name!r}: use letters/digits/._- "
            f"(not starting with a dot, not 'main'/'HEAD')"
        )


def resolve_pin(
    spark,
    path: str,
    branch: str = "main",
    version: int | None = None,
    as_of: float | None = None,
    tag: str | None = None,
) -> tuple[str, int | None, float | None]:
    """The ONE place a (branch, version, as_of, tag) pin resolves to
    ``(branch, version, as_of)`` — shared by the DataFrame SQL face
    and both DataSource hooks so the mutual-exclusion and
    unknown-tag rules cannot drift between them. A ``tag`` overrides
    ``branch`` and is exclusive with ``version``/``as_of``."""
    if tag is None:
        return branch, version, as_of
    if version is not None or as_of is not None:
        raise ValueError("snapshot pin: pass tag OR version/as_of, not both")
    t = SnapshotTable(spark, path).tags().get(tag)
    if t is None:
        raise ValueError(f"snapshot table {path!r}: no tag {tag!r}")
    return t["branch"], t["version"], None


def _norm_part_fields(
    fields: list[tuple], dtypes: dict[str, str]
) -> list[tuple]:
    """Validate and normalize partition-spec fields to
    ``(col, transform, n, width, src_type)`` — shared by
    ``commit_partitioned_multi`` and the DataSource writer's
    ``partition_by`` option (pure dict algebra, session-free)."""
    norm: list[tuple] = []
    for fld in fields:
        col, transform = fld[0], fld[1]
        param = fld[2] if len(fld) > 2 else None
        if transform not in ("identity", "bucket", "truncate"):
            raise ValueError(
                f"unknown partition transform {transform!r} "
                "(identity | bucket | truncate)"
            )
        if col not in dtypes:
            raise ValueError(
                f"commit_partitioned: no column {col!r} in the frame"
            )
        src_type = dtypes[col]
        n = param if transform == "bucket" else None
        width = param if transform == "truncate" else None
        if transform == "bucket" and (not n or n < 2):
            raise ValueError("bucket transform needs n >= 2")
        if transform == "truncate":
            if not width or width < 1:
                raise ValueError("truncate transform needs width >= 1")
            if src_type not in ("tinyint", "smallint", "int", "bigint"):
                raise ValueError(
                    f"truncate partitioning needs an integral column, "
                    f"got {col!r}: {src_type}"
                )
        norm.append((col, transform, n, width, src_type))
    return norm


def _footer_rows(files: list[str]) -> int:
    """Summed parquet-footer row counts — metadata reads only, used
    for the per-commit summary (Iceberg's snapshot summary)."""
    import pyarrow.parquet as pq

    total = 0
    for p in files:
        total += pq.ParquetFile(p).metadata.num_rows
    return total


def _token() -> str:
    """Unique per-attempt suffix for staging paths: two concurrent
    writers must never share a data directory or tmp manifest (a
    shared ``snap-N`` dir would let one writer's cleanup destroy the
    other's landed-but-unpublished files)."""
    return uuid.uuid4().hex[:10]


def _unify_schemas(parent: StructType, new: StructType) -> StructType:
    """Parent schema + any new columns from ``new`` (appended in their
    ``new`` order), everything nullable (old files lack new columns).
    A same-name column with a DIFFERENT type raises — silent coercion
    across appends is how a table's history becomes unreadable."""
    by_name = {f.name: f for f in parent.fields}
    for f in new.fields:
        have = by_name.get(f.name)
        if have is not None and have.dataType != f.dataType:
            raise ValueError(
                f"schema evolution conflict on column {f.name!r}: "
                f"table has {have.dataType.simpleString()}, append has "
                f"{f.dataType.simpleString()} — cast before committing"
            )
    fields = [StructField(f.name, f.dataType, True) for f in parent.fields]
    fields += [
        StructField(f.name, f.dataType, True)
        for f in new.fields
        if f.name not in by_name
    ]
    return StructType(fields)


# Column-identity helpers (the Iceberg-style second notch of schema
# evolution): a manifest's ``columns`` entry is an ordered list of
# ``{"id", "name", "type"}`` dicts — the version's LOGICAL schema —
# and data files are mapped to columns BY ID through the per-file
# write-schema registry, so a rename is metadata-only, a dropped name
# re-added later gets a FRESH id (old files' values are never
# resurrected), and time travel shows each version under the names it
# had.


def _cols_of(struct: StructType, next_id: int) -> tuple[list[dict], int]:
    """Assign fresh ids to every field of ``struct`` (field order)."""
    cols = []
    for f in struct.fields:
        cols.append(
            {"id": next_id, "name": f.name, "type": f.dataType.jsonValue()}
        )
        next_id += 1
    return cols, next_id


def _struct_of(cols: list[dict]) -> StructType:
    from pyspark.sql.types import _parse_datatype_json_value

    return StructType(
        [
            StructField(c["name"], _parse_datatype_json_value(c["type"]), True)
            for c in cols
        ]
    )


def _unify_cols(
    parent: list[dict], new: StructType, next_id: int
) -> tuple[list[dict], list[dict], int]:
    """Unify a parent column list with an append's schema BY NAME:
    matching names keep their id (type conflict raises), unseen names
    get fresh ids appended in ``new`` order. Returns (unified columns,
    the append's WRITE schema — its own columns under their current
    ids, in ``new`` field order, next_id)."""
    by_name = {c["name"]: c for c in parent}
    write_cols: list[dict] = []
    added: list[dict] = []
    for f in new.fields:
        have = by_name.get(f.name)
        if have is not None:
            if _struct_of([have]).fields[0].dataType != f.dataType:
                raise ValueError(
                    f"schema evolution conflict on column {f.name!r}: "
                    f"table has column id {have['id']} with a different "
                    f"type — cast before committing"
                )
            write_cols.append(have)
        else:
            c = {"id": next_id, "name": f.name, "type": f.dataType.jsonValue()}
            next_id += 1
            added.append(c)
            write_cols.append(c)
    return list(parent) + added, write_cols, next_id


def _footer_minmax(files: list[str], wanted: dict[str, str]) -> dict:
    """Per-file ``[min, max, null_count]`` for the ``wanted`` columns
    ({write-time name: stats key}), read from parquet FOOTER metadata
    only — the writers already recorded row-group statistics, so
    collecting them is O(files) metadata reads, no row scanned (the
    same economics as ``profile.footer_stats``, here at the per-file
    grain the manifest needs for pruning). A column is recorded only
    when EVERY row group of the file carries comparable stats and the
    values are JSON-safe scalars (int/float/str/bool) — anything else
    is simply absent, and absence means "never pruned" (conservative),
    never "wrong".

    ``null_count`` is ``None`` when any row group omits it; full-cover
    metadata deletes (``_stats_full_cover``) require a KNOWN-ZERO null
    count, because parquet min/max exclude NULLs — dropping a file
    whose non-null values all match would silently delete its NULL
    rows, violating the 'NULL never matches' DELETE contract
    (ADVICE r11 #1).

    Floating-point physical types are skipped outright: parquet
    min/max exclude NaN while Spark orders NaN above every double, so
    a [min, max] interval cannot prove a float file row-free (a file
    with values [1, 3] plus NaN rows DOES match ``x > 5``) — stats on
    float columns would break the 'pruned read equals unpruned read +
    filter' guarantee (ADVICE r11 #4). Absence just means those
    columns are never pruned."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, list]] = {}
    for path in files:
        md = pq.ParquetFile(path).metadata
        names = {c: i for i, c in enumerate(md.schema.names)}
        per: dict[str, list] = {}
        for name, key in wanted.items():
            ci = names.get(name)
            if ci is None:
                continue
            if md.schema.column(ci).physical_type in ("FLOAT", "DOUBLE"):
                continue  # NaN breaks interval logic — never recorded
            lo = hi = None
            nulls: int | None = 0
            ok = md.num_row_groups > 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if (
                    st is None
                    or not st.has_min_max
                    or not isinstance(st.min, (int, float, str, bool))
                ):
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
                if nulls is None or not st.has_null_count:
                    nulls = None  # unknown: pruning fine, full cover never
                else:
                    nulls += st.null_count
            if ok:
                per[key] = [lo, hi, nulls]
        if per:
            out[path] = per
    return out


def _stats_full_cover(stats: dict, key: str, op: str, value) -> bool:
    """True when a file's recorded stats PROVE every row matches the
    conjunct — the metadata-delete dual of ``_stats_prune``: a
    fully-covered file can leave the manifest outright instead of
    carrying a residual delete predicate. Missing stats (or a type
    mismatch) are never full cover — and neither is a file with NULL
    rows in the column (or an unknown null count, including every
    legacy two-element ``[min, max]`` entry): min/max exclude NULLs,
    NULL never matches a conjunct, so such a file always keeps rows
    a full-cover drop would silently delete (ADVICE r11 #1)."""
    rng = stats.get(key)
    if rng is None:
        return False
    if len(rng) < 3 or rng[2] != 0:
        return False  # NULL rows present (or unknown): never full cover
    lo, hi = rng[0], rng[1]
    try:
        if op == "=":
            return lo == value and hi == value
        if op == "<":
            return hi < value
        if op == "<=":
            return hi <= value
        if op == ">":
            return lo > value
        if op == ">=":
            return lo >= value
        if op == "between":
            vlo, vhi = value
            return vlo <= lo and hi <= vhi
        if op == "in":
            # provable only for a single-valued file whose value is
            # listed (the common takedown shape after clustering)
            return lo == hi and any(v == lo for v in value)
    except TypeError:
        return False
    raise ValueError(f"unknown delete op {op!r}")


def _stats_prune(stats: dict, key: str, op: str, value) -> bool:
    """True when a file's recorded [min, max] PROVES no row matches —
    missing stats (or a type mismatch) keep the file. Pure interval
    logic; the caller still applies the real filter to survivors.
    Entries are ``[min, max]`` (legacy) or ``[min, max, null_count]``;
    pruning is NULL-safe either way (a conjunct matches no NULL row,
    so NULL rows never make a pruned file wrong)."""
    rng = stats.get(key)
    if rng is None:
        return False
    lo, hi = rng[0], rng[1]
    try:
        if op == "=":
            return value < lo or value > hi
        if op == "<":
            return lo >= value
        if op == "<=":
            return lo > value
        if op == ">":
            return hi <= value
        if op == ">=":
            return hi < value
        if op == "between":
            vlo, vhi = value
            return hi < vlo or lo > vhi
        if op == "in":
            # NULL list members match no row (SQL IN), so they are
            # ignored; an all-NULL/empty list proves every file row-free
            return all(v < lo or v > hi for v in value if v is not None)
    except TypeError:
        return False
    raise ValueError(f"unknown prune op {op!r}")


_BLOOM_K = 6


def _bloom_positions(h_signed: int, m: int, k: int) -> list[int]:
    """The ``k`` bit positions a value's xxhash64 sets in an ``m``-bit
    Bloom filter — Kirsch-Mitzenmacher double hashing (h1 + i*h2) over
    the hash's two 32-bit halves, h2 forced odd. The WRITE side
    computes the same arithmetic in Spark SQL expressions and the
    PROBE side here in Python, so the formula must stay in the
    integer ranges both share (h1, h2 < 2^32, i < k → no overflow)."""
    u = h_signed & ((1 << 64) - 1)
    h1 = u & 0xFFFFFFFF
    h2 = (u >> 32) | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _bloom_excludes(bloom: dict, hashes: list[int]) -> bool:
    """True when the file's Bloom filter PROVES none of ``hashes`` is
    present (every probe value definitely absent) — the only direction
    a Bloom can prune; 'maybe present' always keeps the file. A
    payload-less marker entry (``add_blooms`` records one for files
    whose column is absent or all-NULL, so backfills stay no-op-able)
    never prunes."""
    import base64

    if "b" not in bloom:
        return False  # marker: no filter recorded, keep the file
    bits = base64.b64decode(bloom["b"])
    m, k = bloom["m"], bloom["k"]
    for h in hashes:
        if all(
            (bits[p >> 3] >> (p & 7)) & 1 for p in _bloom_positions(h, m, k)
        ):
            return False  # maybe present: cannot prune
    return True


def _collect_blooms(
    spark: SparkSession, files: list[str], cols: list[str], m: int, k: int
) -> dict:
    """Per-file ``m``-bit Bloom filters over each column in ``cols``,
    built in ONE distributed pass: hash every non-null value with
    Spark's own xxhash64 (JVM-side), expand to its k bit positions
    (pure SQL arithmetic mirroring ``_bloom_positions``), and fold
    each (file, column) group's distinct positions into a bitset via
    ``applyInPandas`` — the collected volume is exactly the manifest
    payload (~m/8 bytes per file per column), never the data. Returns
    ``{file: {col_name: {"m", "k", "b"(base64)}}}``; columns absent
    from a file contribute nothing (absent = never pruned)."""
    import base64
    from urllib.parse import unquote, urlparse

    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.read.parquet(*files)
    legs = []
    for c in cols:
        if c not in df.columns:
            continue
        u = F.xxhash64(F.col(c))
        h1 = u.bitwiseAND(F.lit(0xFFFFFFFF))
        h2 = F.shiftrightunsigned(u, 32).bitwiseOR(F.lit(1))
        arr = F.when(
            F.col(c).isNotNull(),
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.pmod(h1 + F.lit(i) * h2, F.lit(m)).alias("bit"),
                    )
                    for i in range(k)
                ]
            ),
        ).otherwise(F.array())
        legs.append(arr)
    if not legs:
        return {}
    pos = (
        df.select(
            F.input_file_name().alias("f"),
            F.explode(F.concat(*legs)).alias("p"),
        )
        .select("f", F.col("p.c").alias("c"), F.col("p.bit").alias("bit"))
        .distinct()
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = bytearray(m // 8)
        for p in pdf["bit"]:
            p = int(p)
            bits[p >> 3] |= 1 << (p & 7)
        return pd.DataFrame(
            {
                "f": [pdf["f"].iloc[0]],
                "c": [pdf["c"].iloc[0]],
                "b": [base64.b64encode(bytes(bits)).decode()],
            }
        )

    rows = (
        pos.groupBy("f", "c")
        .applyInPandas(fold, "f string, c string, b string")
        .collect()
    )
    # input_file_name() returns a percent-encoded URI (ADVICE r9 #2)
    by_real = {os.path.abspath(p): p for p in files}
    out: dict = {}
    for r in rows:
        real = by_real.get(os.path.abspath(unquote(urlparse(r["f"]).path)))
        if real is not None:
            out.setdefault(real, {})[r["c"]] = {"m": m, "k": k, "b": r["b"]}
    return out


def corpus_fingerprint(docs: DataFrame, id_col: str) -> list[int]:
    """``[row_count, order-insensitive id-hash XOR]`` — the cheap
    corpus identity a multi-commit artifact build stages alongside its
    parameters (one agg over the id column the build scans anyway).
    XOR, not SUM: a 64-bit hash sum overflows under ANSI arithmetic on
    any real corpus; XOR is order-insensitive and overflow-free at any
    row count."""
    from pyspark.sql import functions as F

    r = docs.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(F.col(id_col).cast("string"))), F.lit(0)
        ).alias("h"),
    ).first()
    return [int(r["n"]), int(r["h"])]


def stage_build_params(path: str, params: dict) -> None:
    """Crash-safe parameter staging for multi-commit artifact builds
    (ADVICE r11 #3). The index families (GramIndex / MinHashIndex /
    IvfPqIndex / LangIdModel) land their meta manifest LAST so a crash
    mid-build leaves no readable index, and a RETRIED build reuses
    tables the crashed attempt already committed. That reuse is only
    sound when the retry runs the SAME build: a retry with different
    parameters (or a changed corpus) would silently pair fresh meta
    with data committed under the old parameters — an index that
    serves wrong results with no error. So the params (plus a corpus
    fingerprint) are staged ATOMICALLY under ``.build_params.json``
    BEFORE the first data commit; a build that finds a sidecar
    verifies it is resuming the same build and refuses loudly on any
    mismatch (the remedy is a fresh path, or removing the crashed
    directory). Artifacts built before staging existed carry no
    sidecar; their first rebuild stages one.

    Publication is the same ``os.link`` put-if-absent as ``_publish``
    (ADVICE r12 #3): a check-then-rename would let two concurrent
    builders both pass the isfile check and race the rename —
    last-writer-wins would silently bypass the very mixed-parameter
    guard this sidecar exists to enforce. With the link, the first
    staging wins atomically and the loser re-reads and compares,
    refusing loudly on a conflicting build."""
    import os as _os

    def _require_same(staged: dict) -> None:
        if staged != params:
            diff = sorted(
                k
                for k in set(staged) | set(params)
                if staged.get(k) != params.get(k)
            )
            raise ValueError(
                f"build at {path!r}: a prior (possibly crashed or "
                f"concurrent) build staged different parameters — "
                f"mismatched keys {diff} "
                f"(staged {staged!r}, requested {params!r}); reusing its "
                "committed tables would corrupt the index. Build at a "
                "fresh path or remove the directory to rebuild."
            )

    sidecar = _os.path.join(path, ".build_params.json")
    if _os.path.isfile(sidecar):
        with open(sidecar) as f:
            _require_same(json.load(f))
        return
    _os.makedirs(path, exist_ok=True)
    tmp = f"{sidecar}.{_token()}.tmp"  # writer-unique: tmps never collide
    with open(tmp, "w") as f:
        json.dump(params, f, indent=1)
    try:
        os.link(tmp, sidecar)
    except FileExistsError:
        # a concurrent builder staged first — honor ITS params
        os.unlink(tmp)
        with open(sidecar) as f:
            _require_same(json.load(f))
        return
    os.unlink(tmp)


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str, branch: str = "main"):
        self.spark = spark
        self.path = path
        self.branch = branch
        if branch != "main":
            _check_ref_name(branch)
        # "main" lives at the legacy location (_manifests/vN.json) so
        # every pre-branch table IS a main branch; named branches get
        # their own manifest dir and therefore their own linear version
        # sequence, optimistic-concurrency gate, HEAD and time travel.
        # DATA files are shared: every branch's commits land under
        # <path>/data and manifests reference across branch lines
        # (a fork copies the manifest, never a byte of data).
        self._mdir = _branch_mdir(path, branch)
        # bucket-probe memo: (spec key, literal) -> bucket | None.
        # Safe to cache per handle — a spec entry is immutable once
        # written (evolution adds a NEW spec id) and the hash is a
        # pure function of (literal, source_type, n).
        self._bucket_probe_cache: dict = {}

    # ------------------------------------------------------------- state

    def _head_path(self) -> str:
        return os.path.join(self._mdir, "HEAD")

    def current_version(self) -> int | None:
        """Latest committed version — the max manifest PRESENT, not
        the HEAD file: the manifest link in ``_publish`` is the
        atomic commit point, so deriving the head from the manifest
        listing makes a concurrent writer impossible to miss (two
        writers racing HEAD rename could regress the pointer; two
        writers cannot both own ``vN.json``). HEAD is still written
        as an advisory pointer for external tools. O(versions)
        metadata listing — ``expire`` bounds it."""
        if not os.path.isdir(self._mdir):
            return None
        best = None
        for name in os.listdir(self._mdir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    n = int(name[1:-5])
                except ValueError:
                    continue
                best = n if best is None or n > best else best
        return best

    def versions(self) -> list[dict]:
        """All committed manifests, ascending by version."""
        if not os.path.isdir(self._mdir):
            return []
        out = []
        for name in sorted(os.listdir(self._mdir)):
            if name.startswith("v") and name.endswith(".json"):
                with open(os.path.join(self._mdir, name)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda m: m["version"])

    def _manifest(self, version: int) -> dict:
        p = os.path.join(self._mdir, f"v{version}.json")
        with open(p) as f:
            return json.load(f)

    def _parent_identity(
        self, pm: dict
    ) -> tuple[list[dict], dict, dict, int]:
        """``(columns, schemas, file_schema, next_col_id)`` of a parent
        manifest, upgrading legacy manifests on the way: a parent that
        predates column recording gets its schema inferred — from its
        RECORDED flat schema when present, else from its files' footer
        union (ADVICE r9 #3: trusting ``df.schema`` alone silently
        dropped parent-only columns from the next version) — with ids
        assigned by position and every parent file name-mapped to that
        one write schema (the Iceberg imported-file move)."""
        if "columns" in pm:
            return (
                [dict(c) for c in pm["columns"]],
                {k: [dict(c) for c in v] for k, v in pm["schemas"].items()},
                dict(pm["file_schema"]),
                int(pm["next_col_id"]),
            )
        if "schema" in pm:
            st = StructType.fromJson(json.loads(pm["schema"]))
        else:
            st = (
                self.spark.read.option("mergeSchema", "true")
                .parquet(*pm["files"])
                .schema
            )
        cols, next_id = _cols_of(st, 1)
        return cols, {"0": cols}, {p: "0" for p in pm["files"]}, next_id

    @staticmethod
    def _intern_schema(schemas: dict, write_cols: list[dict]) -> str:
        """Schema-registry id for ``write_cols``, reusing an existing
        entry when one matches by value."""
        for sid, cols in schemas.items():
            if cols == write_cols:
                return sid
        sid = str(1 + max((int(k) for k in schemas), default=-1))
        schemas[sid] = write_cols
        return sid

    # ------------------------------------------------------------ commit

    def commit(
        self,
        df: DataFrame,
        message: str = "",
        append: bool = False,
        stats_cols: list[str] | None = None,
        max_retries: int = 10,
        bloom_cols: list[str] | None = None,
        bloom_bits: int = 8192,
    ) -> dict:
        """Publish ``df`` as the next version; returns its manifest.

        ``bloom_cols`` designates columns that get a PER-FILE Bloom
        filter in the manifest (``bloom_bits`` bits ≈ bits/8 bytes per
        file per column) — the point-lookup pruning axis min/max stats
        cannot express when values INTERLEAVE across files (two files
        both spanning [0, N] are never range-pruned, but a Bloom
        proves 'this exact key is definitely absent here'), and bucket
        partitioning expresses only by rewriting the layout. Building
        scans the new files' designated columns once (one distributed
        pass; the collected volume is the manifest payload, not the
        data); probing hashes the literal with the JVM-equal pure
        xxh64, so '=' and 'in' conjuncts drop bloom-excluded files
        before any scan. Appends inherit the parent's designations
        (new files get blooms, retained files keep theirs); files
        without a bloom are simply never bloom-pruned, and a 'maybe
        present' answer always keeps the file — false positives cost
        selectivity, never correctness.

        ``append=False``: the new version's content is exactly ``df``.
        ``append=True``: content is parent's files + ``df``'s new files
        (no read, no rewrite of existing data).

        ``stats_cols`` designates columns whose per-file [min, max] is
        recorded in the manifest (from parquet footers — metadata
        reads, no row scanned), enabling ``read(where=...)`` to prune
        files without opening them (VERDICT r10 #7 — at 100 TB a
        selective read that lists every file of a version scans the
        world; Iceberg's answer is manifest-level column stats, and
        this is that move). Stats are keyed by COLUMN ID, so they
        survive renames; appends inherit the parent's designated
        columns automatically (new files get stats, retained files
        keep theirs), and files without stats are simply never pruned.

        Schema evolution: every manifest records its version's schema
        (all-nullable), and an append UNIFIES the parent schema with
        ``df``'s — new columns join the table (old files read NULL for
        them), same-name columns must keep their type (conflict raises;
        silent coercion is how tables rot). ``read`` applies the
        RECORDED schema, so a widened append is visible immediately and
        time travel shows each version with the schema it had — without
        per-read footer merging (the mergeSchema cost real formats also
        avoid by recording schema in metadata).

        Write order is the crash-safety argument: (1) data files land
        in a writer-unique dir — unreferenced until (3), so a crash
        here orphans bytes, never corrupts state; (2) the manifest is
        written COMPLETE under a tmp name; (3) it is LINKED into place
        — the single atomic publication point, which also DETECTS a
        concurrent writer (VERDICT r11 #1): the second writer to a
        version gets a :class:`CommitConflict`. An append losing the
        race rebases onto the new head and retries (its files are
        fresh, so it commutes with any concurrent commit — Iceberg's
        fast-append; the manifest assembly re-runs against the new
        parent, manifest-grain work only); a replace raises instead —
        rebasing it would wipe the concurrent commit's content, a
        decision that belongs to the caller.
        """
        snap_dir = os.path.join(self.path, "data", f"snap-{_token()}")
        df.write.mode("overwrite").parquet(snap_dir)
        new_files = sorted(
            os.path.join(snap_dir, f)
            for f in os.listdir(snap_dir)
            if f.endswith(".parquet")
        )
        # bloom designations: requested names + (on append) the head's
        # existing designations, so appended files stay prunable. A
        # designation a CONCURRENT writer adds mid-rebase is simply
        # absent on these files (never pruned — conservative).
        want = list(bloom_cols or [])
        head = self.current_version()
        if head is not None:
            pm0 = self._manifest(head)
            by_id = {c["id"]: c["name"] for c in pm0.get("columns", [])}
            for i in pm0.get("bloom_ids", []):
                name = by_id.get(i)
                if name is not None and name not in want:
                    want.append(name)
        new_blooms = None
        if want:
            missing = [c for c in want if c not in df.columns]
            if missing and bloom_cols and missing[0] in bloom_cols:
                raise ValueError(
                    f"bloom_cols: no column {missing[0]!r} in the frame"
                )
            new_blooms = (
                _collect_blooms(
                    self.spark, new_files, want, bloom_bits, _BLOOM_K
                ),
                want,
            )
        return self._commit_new_files(
            new_files,
            df.schema,
            message,
            append,
            stats_cols,
            max_retries,
            new_blooms=new_blooms,
        )

    def _commit_new_files(
        self,
        new_files: list[str],
        df_schema: StructType,
        message: str,
        append: bool,
        stats_cols: list[str] | None,
        max_retries: int,
        new_blooms: tuple[dict, list[str]] | None = None,
    ) -> dict:
        """Manifest assembly + publication for files ALREADY staged
        under a writer-unique dir — the back half of :meth:`commit`,
        split out because it is session-free (dict algebra + pyarrow
        footer reads + the os.link publish): the ``scrappy_snapshot``
        DataSource writer commits through this from the Python worker
        where no SparkSession exists. Same append rebase-retry /
        replace-raises conflict semantics as ``commit``."""
        # per-commit summary, computed ONCE outside the rebase-retry
        # loop (new_files never changes across rebases)
        summary = {
            "added_files": len(new_files),
            "added_rows": _footer_rows(new_files),
        }
        conflict: CommitConflict | None = None
        for _ in range(max_retries + 1):
            parent = self.current_version()
            version = 0 if parent is None else parent + 1
            stats: dict = {}
            stats_ids: list[int] = []
            deletes: list[dict] = []
            if append and parent is not None:
                pm = self._manifest(parent)
                (
                    files,
                    cols,
                    identity,
                    (stats, stats_ids),
                    deletes,
                ) = self._assemble_append(pm, df_schema, new_files, stats_cols)
                cols, schemas, file_schema, next_id = identity
            else:
                # replace: old files drop out, but column IDENTITY
                # carries by (name, type) from the parent's columns so
                # a rename history survives a content rewrite
                pcols: list[dict] = []
                next_id = 1
                pm = self._manifest(parent) if parent is not None else {}
                if "columns" in pm:
                    pcols = pm["columns"]
                    next_id = int(pm["next_col_id"])
                by_name = {c["name"]: c for c in pcols}
                cols = []
                for f in df_schema.fields:
                    have = by_name.get(f.name)
                    if (
                        have is not None
                        and _struct_of([have]).fields[0].dataType
                        == f.dataType
                    ):
                        cols.append(dict(have))
                    else:
                        cols.append(
                            {
                                "id": next_id,
                                "name": f.name,
                                "type": f.dataType.jsonValue(),
                            }
                        )
                        next_id += 1
                files = new_files
                schemas = {}
                sid = self._intern_schema(schemas, cols)
                file_schema = {p: sid for p in files}
                # designation survives a rewrite for columns that kept
                # their identity; fresh designations from stats_cols
                live_ids = {c["id"] for c in cols}
                stats_ids = [
                    i for i in pm.get("stats_ids", []) if i in live_ids
                ]
                for name in stats_cols or []:
                    hit = [c["id"] for c in cols if c["name"] == name]
                    if not hit:
                        raise ValueError(
                            f"stats_cols: no column {name!r} in the table"
                        )
                    if hit[0] not in stats_ids:
                        stats_ids.append(hit[0])
                by_id = {c["id"]: c["name"] for c in cols}
                stats = _footer_minmax(
                    new_files, {by_id[i]: str(i) for i in stats_ids}
                )
            # per-file Bloom filters: the designation carries for
            # columns that keep their identity (like stats_ids);
            # appended files' blooms join the parent's, a replace
            # starts from only the fresh ones (old files are gone)
            blooms_t = None
            if new_blooms is not None or pm.get("bloom_ids"):
                id_by_name = {c["name"]: c["id"] for c in cols}
                live_ids = {c["id"] for c in cols}
                bloom_ids = [
                    i for i in pm.get("bloom_ids", []) if i in live_ids
                ]
                file_blooms = (
                    dict(pm.get("blooms", {})) if append else {}
                )
                if new_blooms is not None:
                    by_name_blooms, want = new_blooms
                    for name in want:
                        cid = id_by_name.get(name)
                        if cid is not None and cid not in bloom_ids:
                            bloom_ids.append(cid)
                    for p, per in by_name_blooms.items():
                        slot = dict(file_blooms.get(p, {}))
                        for name, bloom in per.items():
                            cid = id_by_name.get(name)
                            if cid is not None:
                                slot[str(cid)] = bloom
                        if slot:
                            file_blooms[p] = slot
                if bloom_ids:
                    blooms_t = (file_blooms, bloom_ids)
            try:
                return self._publish(
                    version,
                    parent,
                    files,
                    message,
                    _struct_of(cols),
                    identity=(cols, schemas, file_schema, next_id),
                    stats=(stats, stats_ids),
                    deletes=deletes,
                    blooms=blooms_t,
                    summary=summary,
                )
            except CommitConflict as exc:
                if not append:
                    raise
                conflict = exc  # rebase: re-assemble against the new head
        assert conflict is not None
        raise conflict

    def _assemble_append(
        self,
        pm: dict,
        new_schema: StructType,
        new_files: list[str],
        stats_cols: list[str] | None,
    ) -> tuple[list[str], list[dict], tuple, tuple[dict, list[int]], list]:
        """Manifest assembly for appending ``new_files`` (written under
        ``new_schema``) onto parent manifest ``pm``: schema unification
        by column id, write-schema registration, stats inheritance +
        footer collection for the new files. Pending row-level deletes
        carry unchanged — their file scopes name only pre-existing
        files, so the appended rows are OUTSIDE every entry (a
        re-ingested key survives its old takedown). Returns
        ``(files, cols, identity, (stats, stats_ids), deletes)``.
        Shared by ``commit(append=True)`` and ``merge_keys``."""
        deletes = list(pm.get("deletes", []))
        pcols, schemas, file_schema, next_id = self._parent_identity(pm)
        cols, write_cols, next_id = _unify_cols(pcols, new_schema, next_id)
        files = pm["files"] + new_files
        sid = self._intern_schema(schemas, write_cols)
        for p in new_files:
            file_schema[p] = sid
        stats = dict(pm.get("stats", {}))
        stats_ids = list(pm.get("stats_ids", []))
        for name in stats_cols or []:
            hit = [c["id"] for c in cols if c["name"] == name]
            if not hit:
                raise ValueError(
                    f"stats_cols: no column {name!r} in the table"
                )
            if hit[0] not in stats_ids:
                stats_ids.append(hit[0])
        by_id = {c["id"]: c["name"] for c in write_cols}
        stats.update(
            _footer_minmax(
                new_files, {by_id[i]: str(i) for i in stats_ids if i in by_id}
            )
        )
        return (
            files,
            cols,
            (cols, schemas, file_schema, next_id),
            (stats, stats_ids),
            deletes,
        )

    def commit_partitioned(
        self,
        df: DataFrame,
        col: str,
        transform: str,
        message: str = "",
        n: int | None = None,
        width: int | None = None,
        append: bool = False,
        stats_cols: list[str] | None = None,
        max_retries: int = 10,
    ) -> dict:
        """Commit ``df`` PARTITIONED by a transform of one column — the
        second Iceberg pruning axis (VERDICT r11 #7), alongside the
        min/max file stats: the manifest records a partition SPEC
        (column id + transform) and each data file's single partition
        VALUE, and ``read(where=...)`` prunes files whose value
        disproves a conjunct BEFORE any scan. Transforms:

        - ``identity`` — one file set per distinct value; any
          comparison op prunes (the value is a [v, v] interval).
        - ``bucket`` (``n`` buckets) — ``pmod(xxhash64(col), n)``;
          EQUALITY conjuncts prune to one bucket. This is the axis
          min/max stats cannot express: a point lookup on a
          high-cardinality key touches 1/n of the files no matter how
          values interleave.
        - ``truncate`` (integral ``width``) — value ``v - v % width``;
          rows lie in [v, v+width), so range ops prune.

        The write shuffles once on the transform (each partition value
        lands contiguously → one file per value per final task) and
        uses Spark's ``partitionBy`` on a synthetic ``__p`` column, so
        data files keep EVERY real column (the id-mapped read is
        unchanged). Spec EVOLUTION is Iceberg's (VERDICT r12 #3): an
        append under a DIFFERENT spec registers it as a new spec id in
        the manifest's spec list and becomes the table's current spec;
        the new files carry values under it while old files keep
        pruning under the spec they were written with — changing how a
        100 TB table partitions is a metadata operation, never a
        rewrite. A spec set on a table with unpartitioned history
        leaves old files value-less — they are simply never
        partition-pruned; renames never break pruning (specs are keyed
        by column id); every other manifest op carries specs + values
        through automatically; a REPLACE resets the table to its
        single new spec. NULL column values land in a value-less file
        (kept by every conjunct). Conflicts rebase like appends."""
        return self._commit_partitioned_impl(
            df,
            [(col, transform, n if transform == "bucket" else width)],
            message or f"partitioned commit ({transform} on {col})",
            append,
            stats_cols,
            max_retries,
        )

    def commit_partitioned_multi(
        self,
        df: DataFrame,
        fields: list[tuple],
        message: str = "",
        append: bool = False,
        stats_cols: list[str] | None = None,
        max_retries: int = 10,
    ) -> dict:
        """MULTI-FIELD partition spec — the full Iceberg shape (real
        tables partition by e.g. ``(lang, bucket(doc_id))``):

            t.commit_partitioned_multi(df, [
                ("lang", "identity", None),
                ("doc_id", "bucket", 8),
            ])

        Each field is ``(column, transform, param)`` — ``param`` is
        ``n`` for bucket, ``width`` for truncate, ignored for
        identity. The write shuffles once on the field tuple (one file
        per value combination per final task, nested Hive-style dirs);
        the manifest records the spec as a FIELD LIST and each file's
        value VECTOR, and a read prunes a file when ANY field's
        component disproves a conjunct on that field's column — a
        point lookup on both fields touches one file. Everything else
        (evolution, carry, NULL components landing value-less for
        that field, rename-proof column ids) matches the
        single-field ``commit_partitioned``, which is the same code
        path with a one-field list (and the unchanged single-field
        manifest format)."""
        if not fields:
            raise ValueError("commit_partitioned_multi: no fields")
        return self._commit_partitioned_impl(
            df,
            list(fields),
            message
            or "partitioned commit ("
            + ", ".join(f"{t} on {c}" for c, t, *_ in fields)
            + ")",
            append,
            stats_cols,
            max_retries,
        )

    def _commit_partitioned_impl(
        self,
        df: DataFrame,
        fields: list[tuple],
        message: str,
        append: bool,
        stats_cols: list[str] | None,
        max_retries: int,
    ) -> dict:
        from pyspark.sql import functions as F

        norm = _norm_part_fields(fields, dict(df.dtypes))
        out = df
        pnames: list[str] = []
        for i, (col, transform, n, width, _st) in enumerate(norm):
            if transform == "identity":
                expr = F.col(col)
            elif transform == "bucket":
                expr = F.pmod(F.xxhash64(F.col(col)), F.lit(n))
            else:
                expr = F.col(col) - F.pmod(F.col(col), F.lit(width))
            name = "__p" if len(norm) == 1 else f"__p{i}"
            out = out.withColumn(name, expr)
            pnames.append(name)
        snap_dir = os.path.join(self.path, "data", f"snap-{_token()}")
        (
            out.repartition(*pnames)
            .write.partitionBy(*pnames)
            .mode("overwrite")
            .parquet(snap_dir)
        )
        return self._commit_partitioned_staged(
            snap_dir, norm, pnames, df.schema, message, append,
            stats_cols, max_retries,
        )

    def _commit_partitioned_staged(
        self,
        snap_dir: str,
        norm: list[tuple],
        pnames: list[str],
        df_schema: StructType,
        message: str,
        append: bool,
        stats_cols: list[str] | None,
        max_retries: int,
    ) -> dict:
        """The session-free back half of a partitioned commit: walk a
        staged Hive-style ``__p=<value>`` dir tree, recover each
        file's partition-value vector, and publish under the
        rebase-retry gate. Split out (round 14) so the
        ``scrappy_snapshot`` DataSource writer's ``partition_by``
        option can commit from the Python worker where no
        SparkSession exists — the same move as
        :meth:`_commit_new_files` for plain commits."""
        from urllib.parse import unquote

        depth = len(norm)
        new_files: list[str] = []
        parts: dict[str, object] = {}
        for dirpath, _dns, fns in os.walk(snap_dir):
            rel = os.path.relpath(dirpath, snap_dir)
            comps = [] if rel == "." else rel.split(os.sep)
            if len(comps) != depth or not all(
                c.startswith(f"{pnames[i]}=") for i, c in enumerate(comps)
            ):
                continue
            vals: list = []
            for i, comp in enumerate(comps):
                raw = unquote(comp.split("=", 1)[1])
                _col, transform, _n, _w, st = norm[i]
                if raw == "__HIVE_DEFAULT_PARTITION__":
                    vals.append(None)  # NULL component: never pruned
                elif transform in ("bucket", "truncate") or st in (
                    "tinyint",
                    "smallint",
                    "int",
                    "bigint",
                ):
                    vals.append(int(raw))
                else:
                    vals.append(raw)
            val: object = vals[0] if depth == 1 else vals
            has_val = any(v is not None for v in vals)
            for f in sorted(fns):
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    new_files.append(p)
                    if has_val:
                        parts[p] = val
        new_files.sort()
        # per-commit summary, computed once outside the rebase-retry
        # loop (new_files never changes across rebases)
        summary = {
            "added_files": len(new_files),
            "added_rows": _footer_rows(new_files),
        }
        conflict: CommitConflict | None = None
        for _ in range(max_retries + 1):
            parent = self.current_version()
            version = 0 if parent is None else parent + 1
            if append and parent is not None:
                pm = self._manifest(parent)
                (
                    files,
                    cols,
                    identity,
                    stats_t,
                    deletes,
                ) = self._assemble_append(pm, df_schema, new_files, stats_cols)
                all_parts = dict(pm.get("partitions", {}))
            else:
                # replace: same identity-carry rules as commit() — a
                # column that keeps its (name, type) keeps its id, so
                # rename history and stats designations survive
                deletes = []
                pm = self._manifest(parent) if parent is not None else {}
                pcols = pm.get("columns", [])
                next_id = int(pm.get("next_col_id", 1))
                by_name = {c["name"]: c for c in pcols}
                cols = []
                for f in df_schema.fields:
                    have = by_name.get(f.name)
                    if (
                        have is not None
                        and _struct_of([have]).fields[0].dataType
                        == f.dataType
                    ):
                        cols.append(dict(have))
                    else:
                        cols.append(
                            {
                                "id": next_id,
                                "name": f.name,
                                "type": f.dataType.jsonValue(),
                            }
                        )
                        next_id += 1
                schemas: dict = {}
                sid = self._intern_schema(schemas, cols)
                identity = (
                    cols,
                    schemas,
                    {p: sid for p in new_files},
                    next_id,
                )
                files = new_files
                live_ids = {c["id"] for c in cols}
                stats_ids = [
                    i for i in pm.get("stats_ids", []) if i in live_ids
                ]
                by_id = {c["id"]: c["name"] for c in cols}
                for name in stats_cols or []:
                    hit = [c["id"] for c in cols if c["name"] == name]
                    if not hit:
                        raise ValueError(
                            f"stats_cols: no column {name!r} in the table"
                        )
                    if hit[0] not in stats_ids:
                        stats_ids.append(hit[0])
                stats_t = (
                    _footer_minmax(
                        new_files, {by_id[i]: str(i) for i in stats_ids}
                    ),
                    stats_ids,
                )
                all_parts = {}
                pm = {}  # a replace SETS the spec; no parent-spec check
            id_by_name = {c["name"]: c["id"] for c in cols}
            field_dicts = [
                {
                    "id": id_by_name[c0],
                    "transform": t0,
                    "n": n0,
                    "width": w0,
                    "source_type": st0,
                }
                for (c0, t0, n0, w0, st0) in norm
            ]
            # single-field specs keep the original flat format (no
            # manifest churn); multi-field specs carry a field list
            spec = (
                field_dicts[0]
                if len(field_dicts) == 1
                else {"fields": field_dicts}
            )
            pspec = pm.get("partition_spec")
            specs = spec_id = file_specs = None
            if "partition_specs" in pm or (
                pspec is not None and pspec != spec
            ):
                # spec evolution: the parent's spec list (synthesized
                # as {"0": spec} for a single-spec parent) gains this
                # commit's spec under a fresh id — or reuses a prior
                # id when the table returns to a spec it already had.
                # Old files keep their spec ids; only value-bearing
                # new files take the new id.
                if "partition_specs" in pm:
                    specs = {k: dict(v) for k, v in pm["partition_specs"].items()}
                    file_specs = dict(pm.get("partition_file_specs", {}))
                else:
                    specs = {"0": pspec}
                    file_specs = {
                        f: "0" for f in pm.get("partitions", {})
                    }
                spec_id = next(
                    (k for k, v in specs.items() if v == spec), None
                )
                if spec_id is None:
                    spec_id = str(1 + max(int(k) for k in specs))
                    specs[spec_id] = spec
                for f in new_files:
                    if f in parts:
                        file_specs[f] = spec_id
            all_parts.update(parts)
            try:
                return self._publish(
                    version,
                    parent,
                    files,
                    message,
                    _struct_of(cols),
                    identity=identity,
                    stats=stats_t,
                    deletes=deletes,
                    partition=(spec, all_parts, specs, spec_id, file_specs),
                    summary=summary,
                )
            except CommitConflict as exc:
                if not append:
                    raise
                conflict = exc
        assert conflict is not None
        raise conflict

    def commit_files(self, files: list[str], message: str = "") -> dict:
        """Publish a new version referencing an EXPLICIT file list —
        the compaction path (operators/layout.py::compact_snapshot):
        rewritten bins contribute fresh files the caller already landed
        under ``data/snap-<next>/``, untouched bins contribute the
        parent's ORIGINAL files unchanged. Immutability holds — no file
        a prior manifest references is rewritten or moved, so time
        travel across the compaction stays exact; publication is the
        same tmp-write + rename dance as ``commit``.
        """
        parent = self.current_version()
        version = 0 if parent is None else parent + 1
        if parent is not None and self._manifest(parent).get("deletes"):
            # a rewritten bin's fresh file is outside every delete
            # entry's scope, so compacting THROUGH pending row-level
            # deletes would resurrect the deleted rows — materialize
            # them first, then compact.
            raise ValueError(
                "commit_files: pending row-level deletes — run "
                "apply_deletes() before compaction"
            )
        missing = [f for f in files if not os.path.isfile(f)]
        if missing:
            raise ValueError(
                f"commit_files: {len(missing)} referenced files do not "
                f"exist, e.g. {missing[0]!r}"
            )
        schema = None
        identity = None
        stats = None
        if parent is not None:
            pm = self._manifest(parent)
            if "columns" in pm:
                # compaction preserves the table schema AND column
                # identity: reused files keep their write-schema
                # mapping; fresh (rewritten) files were produced by
                # read_files under the CURRENT names, so they map to
                # the current column list.
                cols, schemas, pfs, next_id = self._parent_identity(pm)
                file_schema = {p: pfs[p] for p in files if p in pfs}
                fresh = [p for p in files if p not in pfs]
                if fresh:
                    sid = self._intern_schema(schemas, cols)
                    for p in fresh:
                        file_schema[p] = sid
                schema = _struct_of(cols)
                identity = (cols, schemas, file_schema, next_id)
                stats_ids = list(pm.get("stats_ids", []))
                if stats_ids:
                    # reused files keep their stats; rewritten bins'
                    # fresh files get theirs from their own footers
                    file_stats = dict(pm.get("stats", {}))
                    by_id = {c["id"]: c["name"] for c in cols}
                    file_stats.update(
                        _footer_minmax(
                            fresh,
                            {
                                by_id[i]: str(i)
                                for i in stats_ids
                                if i in by_id
                            },
                        )
                    )
                    stats = (file_stats, stats_ids)
            elif "schema" in pm:  # legacy flat-schema table
                schema = StructType.fromJson(json.loads(pm["schema"]))
        return self._publish(
            version,
            parent,
            list(files),
            message,
            schema,
            identity=identity,
            stats=stats,
        )

    def _publish(
        self,
        version: int,
        parent: int | None,
        files: list[str],
        message: str,
        schema=None,
        identity: tuple[list[dict], dict, dict, int] | None = None,
        stats: tuple[dict, list[int]] | None = None,
        deletes: list[dict] | None = None,
        partition: tuple | None = None,
        blooms: tuple[dict, list[int]] | None = None,
        summary: dict | None = None,
    ) -> dict:
        manifest = {
            "version": version,
            "parent": parent,
            "message": message,
            "committed_at": time.time(),
            "files": files,
            "n_files": len(files),
        }
        if partition is not None:
            # (current spec, per-file values, spec list, current spec
            # id, per-file spec ids) — the last three None outside an
            # evolved table (single-spec manifests stay in the simple
            # legacy format)
            spec, parts, specs, spec_id, file_specs = partition
            if spec is not None:
                manifest["partition_spec"] = spec
                manifest["partitions"] = {
                    p: parts[p] for p in files if p in parts
                }
                if specs is not None:
                    manifest["partition_specs"] = specs
                    manifest["partition_spec_id"] = spec_id
                    manifest["partition_file_specs"] = {
                        p: file_specs[p] for p in files if p in file_specs
                    }
        elif parent is not None:
            # spec(s) + per-file values carry across every manifest-
            # level op (append / delete / rename / compaction / merge)
            # by default, filtered to the files still present — specs
            # are keyed by COLUMN ID, so renames are pruning-proof, and
            # files committed without values (pre-spec history, plain
            # appends) simply never partition-prune
            try:
                pm = self._manifest(parent)
            except FileNotFoundError:
                pm = {}
            if "partition_spec" in pm:
                manifest["partition_spec"] = pm["partition_spec"]
                pparts = pm.get("partitions", {})
                manifest["partitions"] = {
                    p: pparts[p] for p in files if p in pparts
                }
                if "partition_specs" in pm:
                    manifest["partition_specs"] = pm["partition_specs"]
                    manifest["partition_spec_id"] = pm.get(
                        "partition_spec_id"
                    )
                    fs = pm.get("partition_file_specs", {})
                    manifest["partition_file_specs"] = {
                        p: fs[p] for p in files if p in fs
                    }
        if summary:
            manifest["summary"] = summary
        if deletes:
            manifest["deletes"] = deletes
        if schema is not None:
            manifest["schema"] = schema.json()
        if identity is not None:
            cols, schemas, file_schema, next_id = identity
            manifest["columns"] = cols
            manifest["schemas"] = schemas
            manifest["file_schema"] = file_schema
            manifest["next_col_id"] = next_id
        if stats is not None and stats[1]:
            file_stats, stats_ids = stats
            manifest["stats"] = {
                p: file_stats[p] for p in files if p in file_stats
            }
            manifest["stats_ids"] = stats_ids
        if blooms is not None and blooms[1]:
            file_blooms, bloom_ids = blooms
            manifest["blooms"] = {
                p: file_blooms[p] for p in files if p in file_blooms
            }
            manifest["bloom_ids"] = bloom_ids
        elif parent is not None and blooms is None:
            # blooms carry across manifest-level ops (delete / rename /
            # compaction / merge) like the partition spec: filtered to
            # surviving files, keyed by column id so renames are safe;
            # rewritten files simply lack an entry (never bloom-pruned)
            try:
                _pm = self._manifest(parent)
            except FileNotFoundError:
                _pm = {}
            if _pm.get("bloom_ids"):
                pb = _pm.get("blooms", {})
                manifest["blooms"] = {
                    p: pb[p] for p in files if p in pb
                }
                manifest["bloom_ids"] = _pm["bloom_ids"]
        os.makedirs(self._mdir, exist_ok=True)
        # write COMPLETE under a writer-unique tmp name, then LINK into
        # place: os.link is POSIX-atomic and fails when the name exists,
        # so version N lands exactly once — the second writer gets a
        # CommitConflict instead of silently overwriting the first
        # (VERDICT r11 #1; on an object store this is the conditional
        # PUT / put-if-absent the same design rides).
        tmp = os.path.join(self._mdir, f".v{version}.{_token()}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        try:
            os.link(tmp, os.path.join(self._mdir, f"v{version}.json"))
        except FileExistsError:
            os.unlink(tmp)
            raise CommitConflict(
                f"snapshot table {self.path!r}: version {version} was "
                f"committed by a concurrent writer — re-read the head "
                f"and retry (appends rebase automatically)"
            ) from None
        os.unlink(tmp)
        self._advise_head(version)
        return manifest

    def _advise_head(self, version: int) -> None:
        """Advisory HEAD (external tools): monotonic best-effort — the
        manifest listing, not this file, is the source of truth."""
        head_tmp = os.path.join(self._mdir, f".HEAD.{_token()}.tmp")
        with open(head_tmp, "w") as f:
            f.write(str(version))
        try:
            with open(self._head_path()) as f:
                cur = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            cur = None
        if cur is None or cur < version:
            os.rename(head_tmp, self._head_path())
        else:
            os.unlink(head_tmp)

    # ----------------------------------------------------- rename / drop

    def rename_column(self, old: str, new: str, message: str = "") -> dict:
        """Metadata-only rename: publishes a new version with the SAME
        files whose column ``old`` is now named ``new`` — no byte of
        data moves (the column keeps its id; files are mapped by id at
        read). Time travel shows each version under its own names.
        Raises if ``old`` is absent or ``new`` already exists."""
        parent = self.current_version()
        if parent is None:
            raise ValueError(f"snapshot table {self.path!r} has no commits")
        pm = self._manifest(parent)
        cols, schemas, file_schema, next_id = self._parent_identity(pm)
        names = [c["name"] for c in cols]
        if old not in names:
            raise ValueError(f"rename_column: no column {old!r} ({names})")
        if new in names:
            raise ValueError(
                f"rename_column: column {new!r} already exists ({names})"
            )
        cols = [dict(c, name=new) if c["name"] == old else c for c in cols]
        return self._publish(
            parent + 1,
            parent,
            pm["files"],
            message or f"rename {old} -> {new}",
            _struct_of(cols),
            identity=(cols, schemas, file_schema, next_id),
            stats=(pm.get("stats", {}), pm.get("stats_ids", [])),
            deletes=pm.get("deletes", []),
        )

    def drop_column(self, name: str, message: str = "") -> dict:
        """Metadata-only drop: the column's id leaves the logical
        schema (data files are untouched — old versions still read
        it). A LATER append re-adding the same name gets a FRESH id,
        so the dropped column's old values are never resurrected under
        the new name (the Iceberg re-add contract)."""
        parent = self.current_version()
        if parent is None:
            raise ValueError(f"snapshot table {self.path!r} has no commits")
        pm = self._manifest(parent)
        cols, schemas, file_schema, next_id = self._parent_identity(pm)
        if name not in [c["name"] for c in cols]:
            raise ValueError(f"drop_column: no column {name!r}")
        dropped_id = next(c["id"] for c in cols if c["name"] == name)
        for e in pm.get("deletes", []):
            refs = (
                {k for k, _, _ in e["conjuncts"]}
                if e["kind"] == "pred"
                else {str(kc["id"]) for kc in e["key_cols"]}
            )
            if str(dropped_id) in refs:
                raise ValueError(
                    f"drop_column: pending row-level delete references "
                    f"{name!r} — run apply_deletes() first"
                )
        cols = [c for c in cols if c["name"] != name]
        if not cols:
            raise ValueError("drop_column: cannot drop the last column")
        return self._publish(
            parent + 1,
            parent,
            pm["files"],
            message or f"drop {name}",
            _struct_of(cols),
            identity=(cols, schemas, file_schema, next_id),
            stats=(
                pm.get("stats", {}),
                [
                    i
                    for i in pm.get("stats_ids", [])
                    if i in {c["id"] for c in cols}
                ],
            ),
            deletes=pm.get("deletes", []),
        )

    # ---------------------------------------------------- row-level delete

    def _resolve_cols(self, m: dict) -> tuple[dict, dict]:
        """(name → stats/delete key, key → current name) for a
        manifest: column ids for identity manifests, bare names for
        legacy ones."""
        if "columns" in m:
            by_name = {c["name"]: str(c["id"]) for c in m["columns"]}
            by_key = {str(c["id"]): c["name"] for c in m["columns"]}
        else:
            names = StructType.fromJson(json.loads(m["schema"])).names if "schema" in m else []
            by_name = {n: n for n in names}
            by_key = dict(by_name)
        return by_name, by_key

    def delete_where(self, where, message: str = "") -> dict:
        """Row-level delete by predicate — the merge-on-read move
        (Iceberg's metadata/equality-delete economics): publishes a new
        version whose manifest carries the predicate SCOPED to the
        files present now, no data read or rewritten (O(manifest)).
        Files whose [min, max] stats prove EVERY row matches leave the
        file list outright (the metadata-delete fast path — their bytes
        stop being read immediately); the rest carry the residual
        predicate, applied at read. Later appends are OUTSIDE the
        scope: a re-ingested row is not retro-deleted. Time travel is
        unaffected — parent versions still show the rows.

        ``where``: the ``read(where=...)`` conjunct form. Predicate
        columns are recorded by COLUMN ID (rename-proof); NULL never
        matches a conjunct, so rows with NULL in a predicate column
        are kept (SQL DELETE semantics)."""
        parent = self.current_version()
        if parent is None:
            raise ValueError(f"snapshot table {self.path!r} has no commits")
        pm = self._manifest(parent)
        by_name, _ = self._resolve_cols(pm)
        conjuncts = [where] if isinstance(where, tuple) else list(where)
        norm = []
        for col, op, val in conjuncts:
            if col not in by_name:
                raise ValueError(
                    f"delete_where: no column {col!r} ({sorted(by_name)})"
                )
            # validate BEFORE persisting: an unknown op recorded in the
            # manifest would poison every later read/apply_deletes
            # (stats-less files skip the op dispatch in the prune
            # helpers, so they cannot catch it here)
            if op not in ("=", "<", "<=", ">", ">=", "between", "in"):
                raise ValueError(
                    f"delete_where: unknown op {op!r} "
                    "(= < <= > >= between in)"
                )
            if op in ("between", "in"):
                val = list(val)
            norm.append([by_name[col], op, val])
        stats = pm.get("stats", {})
        full = [
            p
            for p in pm["files"]
            if all(
                _stats_full_cover(stats.get(p, {}), k, op, v)
                for k, op, v in norm
            )
        ]
        remaining = [p for p in pm["files"] if p not in set(full)]
        deletes = [
            dict(e, files=[f for f in e["files"] if f not in set(full)])
            for e in pm.get("deletes", [])
        ]
        deletes = [e for e in deletes if e["files"]]
        # scope the residual predicate to files that MIGHT hold a
        # matching row — a file whose stats already prune the predicate
        # carries no merge-on-read leg, and when stats settle the whole
        # delete (full covers + clean rest) no entry is recorded at all
        scope = [
            p
            for p in remaining
            if not any(
                _stats_prune(stats.get(p, {}), k, op, v) for k, op, v in norm
            )
        ]
        if scope:
            deletes = deletes + [
                {"kind": "pred", "conjuncts": norm, "files": scope}
            ]
        return self._publish(
            parent + 1,
            parent,
            remaining,
            message or f"delete where {norm}",
            _struct_of(pm["columns"]) if "columns" in pm else None,
            identity=self._parent_identity(pm) if "columns" in pm else None,
            stats=(stats, pm.get("stats_ids", [])),
            deletes=deletes,
        )

    def delete_keys(
        self, keys: DataFrame, key_cols: list[str], message: str = ""
    ) -> dict:
        """Row-level delete by KEY LIST — the equality-delete file:
        the keys land as parquet next to the version's data (takedown
        lists can be millions of rows; they do not belong in a JSON
        manifest), the manifest records the entry scoped to the files
        present now, and reads anti-join the keys against exactly
        those files. O(request) commit, no data rewritten; rows whose
        key is NULL never match (anti-join semantics)."""
        parent = self.current_version()
        if parent is None:
            raise ValueError(f"snapshot table {self.path!r} has no commits")
        pm = self._manifest(parent)
        by_name, _ = self._resolve_cols(pm)
        missing = [c for c in key_cols if c not in by_name]
        if missing:
            raise ValueError(
                f"delete_keys: no column {missing[0]!r} ({sorted(by_name)})"
            )
        version = parent + 1
        del_dir = os.path.join(self.path, "data", f"deletes-{_token()}")
        keys.select(*key_cols).distinct().write.mode("overwrite").parquet(
            del_dir
        )
        delete_files = sorted(
            os.path.join(del_dir, f)
            for f in os.listdir(del_dir)
            if f.endswith(".parquet")
        )
        # scope: a single-column key list has a [min, max]; files whose
        # stats prune that interval cannot hold a matching row, so they
        # carry no anti-join leg (and apply_deletes never rewrites
        # them) — at 100 TB a takedown request touches few files.
        scope = list(pm["files"])
        if len(key_cols) == 1:
            bounds = (
                keys.selectExpr(
                    f"min({key_cols[0]}) AS lo", f"max({key_cols[0]}) AS hi"
                ).collect()[0]
            )
            if bounds["lo"] is not None:
                stats = pm.get("stats", {})
                kkey = by_name[key_cols[0]]
                scope = [
                    p
                    for p in scope
                    if not _stats_prune(
                        stats.get(p, {}),
                        kkey,
                        "between",
                        (bounds["lo"], bounds["hi"]),
                    )
                ]
        entry = {
            "kind": "keys",
            "key_cols": [
                {"id": by_name[c], "name": c} for c in key_cols
            ],
            "delete_files": delete_files,
            "files": scope,
        }
        return self._publish(
            version,
            parent,
            list(pm["files"]),
            message or f"delete keys on {key_cols}",
            _struct_of(pm["columns"]) if "columns" in pm else None,
            identity=self._parent_identity(pm) if "columns" in pm else None,
            stats=(pm.get("stats", {}), pm.get("stats_ids", [])),
            deletes=pm.get("deletes", []) + [entry],
        )

    def merge_keys(
        self,
        batch: DataFrame,
        key_cols: list[str],
        message: str = "",
        stats_cols: list[str] | None = None,
        max_retries: int = 10,
        matched_condition: str | None = None,
        update_cols: list[str] | None = None,
    ) -> dict:
        """Keyed MERGE upsert in ONE commit (VERDICT r11 #4 — MERGE
        WHEN MATCHED THEN DELETE+INSERT at the table layer): the
        batch's keys become an equality-delete entry scoped to the
        files present now, and the batch itself appends — BOTH in a
        single manifest, so readers never observe the between-state
        (a matched key is never absent, never doubled). O(request +
        batch): no existing data is read or rewritten; the delete leg
        is merge-on-read exactly like ``delete_keys``, key-range
        scoped via manifest stats when single-keyed. Time travel shows
        the pre-merge rows; replaying the same batch is idempotent at
        the content level (the replay's delete retires the first
        merge's rows and re-inserts identical ones — tested).

        NULL-key batch rows never match the anti-join, so they are
        pure inserts (SQL MERGE's NULL semantics). Keys must exist in
        the table's schema (a key column old files lack cannot match
        anything — refused loudly). Batches should carry each key once
        (duplicate-key rows all insert, like a multi-row MERGE source).

        ``matched_condition`` / ``update_cols`` (VERDICT r12 #7 — the
        conditional MERGE verbs): ``matched_condition`` is a SQL
        boolean over the matched pair with the table row as ``t`` and
        the batch row as ``b`` (e.g. ``"b.quality > t.quality"``) —
        WHEN MATCHED AND cond THEN UPDATE, matched rows failing it
        keep their current values and their batch rows are dropped.
        ``update_cols`` restricts the update to a column SUBSET: the
        replacement row is the EXISTING row with only those columns
        overwritten from the batch ("update quality_score, keep
        text"); unmatched batch rows still insert whole. Either option
        switches to the conditional path: the stats-scoped candidate
        files are READ (merge-on-read, request-sized — never the
        table) to evaluate the condition / compose replacements, the
        delete leg is split to exactly the keys that matched AND
        passed, and everything still publishes as ONE commit. A merge
        where nothing matches the condition and nothing inserts is a
        no-op: the PARENT manifest returns unchanged (no junk
        versions).

        Conflicts rebase like appends: the delete scope is recomputed
        against the new head each attempt, so keep-new semantics hold
        relative to the commit's ACTUAL position in the history."""
        missing_batch = [c for c in key_cols if c not in batch.columns]
        if missing_batch:
            raise ValueError(
                f"merge_keys: no column {missing_batch[0]!r} in the batch "
                f"({batch.columns})"
            )
        if matched_condition is not None or update_cols is not None:
            return self._merge_keys_conditional(
                batch,
                key_cols,
                matched_condition,
                update_cols,
                message,
                stats_cols,
                max_retries,
            )
        head = self.current_version()
        if head is None:
            return self.commit(
                batch,
                message or f"merge upsert on {key_cols}",
                stats_cols=stats_cols,
            )
        # validate against the table BEFORE landing any bytes (the
        # in-loop check repeats this against whichever head we rebase to)
        parent_names, _ = self._resolve_cols(self._manifest(head))
        missing = [c for c in key_cols if c not in parent_names]
        if missing:
            raise ValueError(
                f"merge_keys: no column {missing[0]!r} "
                f"({sorted(parent_names)})"
            )
        snap_dir = os.path.join(self.path, "data", f"snap-{_token()}")
        batch.write.mode("overwrite").parquet(snap_dir)
        new_files = sorted(
            os.path.join(snap_dir, f)
            for f in os.listdir(snap_dir)
            if f.endswith(".parquet")
        )
        del_dir = os.path.join(self.path, "data", f"deletes-{_token()}")
        batch.select(*key_cols).distinct().write.mode("overwrite").parquet(
            del_dir
        )
        delete_files = sorted(
            os.path.join(del_dir, f)
            for f in os.listdir(del_dir)
            if f.endswith(".parquet")
        )
        bounds = None
        if len(key_cols) == 1:
            b = batch.selectExpr(
                f"min({key_cols[0]}) AS lo", f"max({key_cols[0]}) AS hi"
            ).collect()[0]
            if b["lo"] is not None:
                bounds = (b["lo"], b["hi"])
        conflict: CommitConflict | None = None
        for _ in range(max_retries + 1):
            parent = self.current_version()
            pm = self._manifest(parent)
            parent_names, _ = self._resolve_cols(pm)
            missing = [c for c in key_cols if c not in parent_names]
            if missing:
                raise ValueError(
                    f"merge_keys: no column {missing[0]!r} "
                    f"({sorted(parent_names)})"
                )
            (
                files,
                cols,
                identity,
                stats_t,
                deletes,
            ) = self._assemble_append(pm, batch.schema, new_files, stats_cols)
            # key ids from the UNIFIED columns (a legacy parent gets
            # numeric ids only through the assembly's identity upgrade,
            # and the published manifest resolves deletes by those ids)
            by_name = {c["name"]: str(c["id"]) for c in cols}
            # the delete entry scopes the PARENT's files only — the
            # batch's own files must never anti-join their rows away
            scope = list(pm["files"])
            if bounds is not None:
                stats = pm.get("stats", {})
                kkey = by_name[key_cols[0]]
                scope = [
                    p
                    for p in scope
                    if not _stats_prune(
                        stats.get(p, {}), kkey, "between", bounds
                    )
                ]
            entry = {
                "kind": "keys",
                "key_cols": [
                    {"id": by_name[c], "name": c} for c in key_cols
                ],
                "delete_files": delete_files,
                "files": scope,
            }
            try:
                return self._publish(
                    parent + 1,
                    parent,
                    files,
                    message or f"merge upsert on {key_cols}",
                    _struct_of(cols),
                    identity=identity,
                    stats=stats_t,
                    deletes=deletes + [entry],
                )
            except CommitConflict as exc:
                conflict = exc  # rebase: rescope against the new head
        assert conflict is not None
        raise conflict

    def _merge_keys_conditional(
        self,
        batch: DataFrame,
        key_cols: list[str],
        matched_condition: str | None,
        update_cols: list[str] | None,
        message: str,
        stats_cols: list[str] | None,
        max_retries: int,
    ) -> dict:
        """The conditional MERGE path (see ``merge_keys``): WHEN
        MATCHED AND <cond> THEN UPDATE [SET <update_cols only>], WHEN
        NOT MATCHED THEN INSERT. Unlike the unconditional fast path
        this must READ the matched rows — but only the stats-scoped
        candidate files (single-key batch bounds), never the table —
        to evaluate ``t``-vs-``b`` conditions and compose
        column-subset replacement rows. The delete leg then names
        exactly the keys that matched AND passed, so matched-but-kept
        rows are untouched, and delete + append publish as ONE
        manifest. Everything (scope, matches, replacements) recomputes
        from the head on each conflict rebase; a fully-no-op merge
        returns the parent manifest without committing."""
        from pyspark.sql import functions as F

        if update_cols is not None:
            bad = [c for c in update_cols if c not in batch.columns]
            if bad:
                raise ValueError(
                    f"merge_keys: update column {bad[0]!r} not in the "
                    f"batch ({batch.columns})"
                )
            keyed = [c for c in update_cols if c in key_cols]
            if keyed:
                raise ValueError(
                    f"merge_keys: {keyed[0]!r} is a key column — keys "
                    "identify the row and cannot be updated"
                )
        head = self.current_version()
        if head is None:
            # empty table: nothing matches, everything inserts
            return self.commit(
                batch,
                message or f"merge upsert on {key_cols}",
                stats_cols=stats_cols,
            )
        bounds = None
        if len(key_cols) == 1:
            bb = batch.selectExpr(
                f"min({key_cols[0]}) AS lo", f"max({key_cols[0]}) AS hi"
            ).collect()[0]
            if bb["lo"] is not None:
                bounds = (bb["lo"], bb["hi"])
        cond = (
            F.expr(matched_condition)
            if matched_condition is not None
            else F.lit(True)
        )
        conflict: CommitConflict | None = None
        for _ in range(max_retries + 1):
            parent = self.current_version()
            pm = self._manifest(parent)
            by_name_parent, _ = self._resolve_cols(pm)
            missing = [c for c in key_cols if c not in by_name_parent]
            if missing:
                raise ValueError(
                    f"merge_keys: no column {missing[0]!r} "
                    f"({sorted(by_name_parent)})"
                )
            # candidate files: the batch's key range can only match
            # rows in files whose stats admit it
            stats = pm.get("stats", {})
            scope = list(pm["files"])
            if bounds is not None:
                kkey = str(by_name_parent[key_cols[0]])
                scope = [
                    p
                    for p in scope
                    if not _stats_prune(
                        stats.get(p, {}), kkey, "between", bounds
                    )
                ]
            existing = self._read_subset(pm, scope)
            on = None
            for k in key_cols:
                leg = F.col(f"t.{k}") == F.col(f"b.{k}")
                on = leg if on is None else on & leg
            hits = (
                existing.alias("t").join(batch.alias("b"), on, "inner")
                .filter(cond)
            )
            replace_keys = hits.select(
                *[F.col(f"t.{k}").alias(k) for k in key_cols]
            ).distinct()
            if update_cols is None:
                # whole-row replace by the batch row (condition-only)
                replacements = batch.join(
                    replace_keys, on=key_cols, how="left_semi"
                )
            else:
                # the EXISTING row with only update_cols overwritten;
                # batch-only update columns widen the schema (old
                # files read NULL, the append unification's contract)
                sel = [
                    F.col(
                        f"b.{c}" if c in update_cols else f"t.{c}"
                    ).alias(c)
                    for c in existing.columns
                ]
                sel += [
                    F.col(f"b.{c}").alias(c)
                    for c in update_cols
                    if c not in existing.columns
                ]
                replacements = hits.select(*sel)
            inserts = batch.join(
                existing.select(*key_cols), on=key_cols, how="left_anti"
            )
            append_df = replacements.unionByName(
                inserts, allowMissingColumns=True
            )
            snap_dir = os.path.join(self.path, "data", f"snap-{_token()}")
            append_df.write.mode("overwrite").parquet(snap_dir)
            new_files = sorted(
                os.path.join(snap_dir, f)
                for f in os.listdir(snap_dir)
                if f.endswith(".parquet")
            )
            del_dir = os.path.join(self.path, "data", f"deletes-{_token()}")
            replace_keys.write.mode("overwrite").parquet(del_dir)
            delete_files = sorted(
                os.path.join(del_dir, f)
                for f in os.listdir(del_dir)
                if f.endswith(".parquet")
            )
            n_replace = (
                self.spark.read.parquet(*delete_files).limit(1).count()
                if delete_files
                else 0
            )
            n_append = (
                self.spark.read.parquet(*new_files).limit(1).count()
                if new_files
                else 0
            )
            if n_replace == 0 and n_append == 0:
                # full no-op: nothing matched the condition, nothing
                # inserts — publish no version, leave no garbage
                shutil.rmtree(snap_dir, ignore_errors=True)
                shutil.rmtree(del_dir, ignore_errors=True)
                return pm
            (
                files,
                cols,
                identity,
                stats_t,
                deletes,
            ) = self._assemble_append(
                pm,
                append_df.schema,
                new_files if n_append else [],
                stats_cols,
            )
            if n_replace:
                by_name = {c["name"]: str(c["id"]) for c in cols}
                entry_scope = list(pm["files"])
                if len(key_cols) == 1:
                    rb = self.spark.read.parquet(*delete_files).selectExpr(
                        f"min({key_cols[0]}) AS lo",
                        f"max({key_cols[0]}) AS hi",
                    ).collect()[0]
                    if rb["lo"] is not None:
                        kkey = by_name[key_cols[0]]
                        entry_scope = [
                            p
                            for p in entry_scope
                            if not _stats_prune(
                                stats.get(p, {}),
                                kkey,
                                "between",
                                (rb["lo"], rb["hi"]),
                            )
                        ]
                deletes = deletes + [
                    {
                        "kind": "keys",
                        "key_cols": [
                            {"id": by_name[c], "name": c} for c in key_cols
                        ],
                        "delete_files": delete_files,
                        "files": entry_scope,
                    }
                ]
            try:
                return self._publish(
                    parent + 1,
                    parent,
                    files,
                    message or f"conditional merge upsert on {key_cols}",
                    _struct_of(cols),
                    identity=identity,
                    stats=stats_t,
                    deletes=deletes,
                )
            except CommitConflict as exc:
                # rebase: recompute against the new head; this
                # attempt's staging was never published — reclaim it
                # now instead of leaving grace-aged orphans
                shutil.rmtree(snap_dir, ignore_errors=True)
                shutil.rmtree(del_dir, ignore_errors=True)
                conflict = exc
        assert conflict is not None
        raise conflict

    def _apply_delete(self, df: DataFrame, m: dict, entry: dict) -> DataFrame:
        from pyspark.sql import functions as F

        _, by_key = self._resolve_cols(m)
        if entry["kind"] == "pred":
            conj = [
                (by_key[k], op, tuple(v) if op == "between" else v)
                for k, op, v in entry["conjuncts"]
            ]
            cond = self._where_condition(conj)
            return df.filter(~F.coalesce(cond, F.lit(False)))
        names = [by_key[str(kc["id"])] for kc in entry["key_cols"]]
        kdf = self.spark.read.parquet(*entry["delete_files"])
        kdf = kdf.toDF(*names)  # stored under delete-time names
        return df.join(kdf, names, "left_anti")

    def apply_deletes(self, message: str = "") -> dict:
        """Materialize pending row-level deletes: rewrite ONLY the
        files the entries scope (untouched files are reused as-is, the
        compaction move), publish with the delete list cleared. After
        this, reads pay zero merge-on-read cost and compaction /
        drop_column are unblocked. No-op when nothing is pending."""
        parent = self.current_version()
        if parent is None:
            raise ValueError(f"snapshot table {self.path!r} has no commits")
        pm = self._manifest(parent)
        deletes = pm.get("deletes", [])
        if not deletes:
            return pm
        in_files = set(pm["files"])
        affected = sorted(
            {f for e in deletes for f in e["files"] if f in in_files}
        )
        untouched = [f for f in pm["files"] if f not in set(affected)]
        version = parent + 1
        snap_dir = os.path.join(self.path, "data", f"snap-{_token()}")
        self._read_subset(pm, affected).write.mode("overwrite").parquet(
            snap_dir
        )
        fresh = sorted(
            os.path.join(snap_dir, f)
            for f in os.listdir(snap_dir)
            if f.endswith(".parquet")
        )
        files = untouched + fresh
        schema = None
        identity = None
        stats = None
        if "columns" in pm:
            cols, schemas, pfs, next_id = self._parent_identity(pm)
            file_schema = {p: pfs[p] for p in files if p in pfs}
            sid = self._intern_schema(schemas, cols)
            for p in fresh:
                file_schema[p] = sid
            schema = _struct_of(cols)
            identity = (cols, schemas, file_schema, next_id)
            stats_ids = list(pm.get("stats_ids", []))
            if stats_ids:
                file_stats = dict(pm.get("stats", {}))
                by_id = {c["id"]: c["name"] for c in cols}
                file_stats.update(
                    _footer_minmax(
                        fresh,
                        {by_id[i]: str(i) for i in stats_ids if i in by_id},
                    )
                )
                stats = (file_stats, stats_ids)
        return self._publish(
            version,
            parent,
            files,
            message or f"apply {len(deletes)} pending deletes",
            schema,
            identity=identity,
            stats=stats,
        )

    # -------------------------------------------------------------- read

    def _pruned_files(self, m: dict, where) -> tuple[list[str], list]:
        """Split a pruning spec against a version's manifest stats:
        returns (surviving files, normalized conjuncts). ``where`` is
        one ``(col, op, value)`` tuple or a list of them (ANDed); ops
        ``= < <= > >= between in`` (between takes a (lo, hi) pair;
        in takes an iterable of values).
        Column names resolve to COLUMN IDS through the manifest, so a
        predicate on a renamed column prunes against stats recorded
        under the old name. Files lacking stats for a conjunct's
        column survive it — pruning only ever REMOVES provably
        row-free files; the caller re-applies the real filter."""
        conjuncts = [where] if isinstance(where, tuple) else list(where)
        stats = m.get("stats", {})
        by_name = {c["name"]: c["id"] for c in m.get("columns", [])}
        keys: list[str] = []
        for col, op, _ in conjuncts:
            if col in by_name:
                keys.append(str(by_name[col]))
            elif "columns" in m:
                raise ValueError(
                    f"read(where=...): no column {col!r} in version "
                    f"{m['version']} ({sorted(by_name)})"
                )
            else:  # legacy manifest: stats (if any) are keyed by name
                keys.append(col)
        kept = [
            p
            for p in m["files"]
            if not any(
                _stats_prune(stats.get(p, {}), k, op, val)
                for k, (_, op, val) in zip(keys, conjuncts)
            )
        ]
        # third pruning axis: per-file Bloom filters — '=' / 'in'
        # conjuncts on designated columns drop files whose bloom
        # proves every probed key definitely absent. Probes hash the
        # literal with the JVM-equal pure xxh64 under the same
        # type-family guard as bucket probes (a cross-type literal
        # against a string column is unprovable); 'maybe present'
        # always keeps the file.
        blooms = m.get("blooms")
        if blooms and kept:
            type_of = {
                str(c["id"]): _struct_of([c]).fields[0].dataType.simpleString()
                for c in m.get("columns", [])
            }
            from ..functions.xxh64 import spark_xxhash64

            for k, (_, op, val) in zip(keys, conjuncts):
                if op not in ("=", "in") or k not in type_of:
                    continue
                vals = (
                    [val]
                    if op == "="
                    else [v for v in val if v is not None]
                )
                hashes: list[int] = []
                provable = True
                for v in vals:
                    if not self._probe_safe(v, type_of[k]):
                        provable = False
                        break
                    h = spark_xxhash64(v, type_of[k])
                    if h is None:
                        provable = False
                        break
                    hashes.append(h)
                if not provable:
                    continue
                kept = [
                    p
                    for p in kept
                    if k not in blooms.get(p, {})
                    or not _bloom_excludes(blooms[p][k], hashes)
                ]
        # second pruning axis (VERDICT r11 #7): the partition spec.
        # Identity/truncate values are intervals (reuse the stats
        # logic); bucket values prune equality conjuncts — the case
        # min/max stats cannot express. Files without a recorded value
        # (pre-spec history, plain appends) are never pruned. Under an
        # EVOLVED table (VERDICT r12 #3) each file prunes by the spec
        # it was written with — the manifest's spec list + per-file
        # spec ids — so old files keep their old pruning while new
        # files get the new spec's.
        spec = m.get("partition_spec")
        if spec is not None and kept:
            parts = m.get("partitions", {})
            specs = m.get("partition_specs")
            fspecs = m.get("partition_file_specs", {})

            def _spec_for(p: str) -> dict | None:
                if specs is None:
                    return spec  # single-spec manifest
                sid = fspecs.get(p)
                return specs.get(sid) if sid is not None else None

            def _disproves(sp, pv, k: str, op: str, val) -> bool:
                if sp is None or pv is None:
                    return False
                if "fields" in sp:  # multi-field spec: value VECTOR —
                    # ANY field whose component disproves its own
                    # column's conjunct proves the file row-free
                    if not isinstance(pv, list):
                        return False
                    return any(
                        str(f["id"]) == k
                        and self._part_prune(f, comp, op, val)
                        for f, comp in zip(sp["fields"], pv)
                    )
                return str(sp["id"]) == k and self._part_prune(
                    sp, pv, op, val
                )

            for k, (_, op, val) in zip(keys, conjuncts):
                kept = [
                    p
                    for p in kept
                    if not _disproves(_spec_for(p), parts.get(p), k, op, val)
                ]
        return kept, conjuncts

    def _part_prune(self, spec: dict, pv, op: str, val) -> bool:
        """True when a file's partition VALUE proves no row matches."""
        if pv is None:
            return False
        t = spec["transform"]
        if t == "identity":
            return _stats_prune({"p": [pv, pv, 0]}, "p", op, val)
        if t == "truncate":
            return _stats_prune(
                {"p": [pv, pv + spec["width"] - 1, 0]}, "p", op, val
            )
        if t == "bucket":
            if op == "=":
                want = self._bucket_value(val, spec)
                return want is not None and pv != want
            if op == "in":
                vals = [v for v in val if v is not None]
                if not vals:
                    return True  # IN () / IN (NULL) matches no row
                wants = self._bucket_values(vals, spec)
                return all(w is not None and w != pv for w in wants)
        return False

    def _bucket_value(self, val, spec: dict) -> int | None:
        return self._bucket_values([val], spec)[0]

    @staticmethod
    def _probe_safe(val, source_type: str) -> bool:
        """Is a bucket probe for literal ``val`` against a column of
        ``source_type`` PROVABLY faithful to the filter's semantics?

        The probe hashes ``cast(literal AS source_type)``. That equals
        what matching rows store exactly when Spark's comparison casts
        the LITERAL side — which it does whenever the column is
        non-string (numeric/date/timestamp column vs string literal:
        the string is cast). The unsafe direction is a STRING column
        with a non-string literal: Spark casts the COLUMN to the
        literal's type, so a row ``'05'`` satisfies ``col = 5`` yet
        lives in ``bucket('05')`` — pruning by ``bucket('5')`` would
        drop its file (ADVICE r12 #2). Decimals are conservative both
        ways (cast rounding differs from comparison coercion), and
        bools never probe a non-boolean column (``True`` is an
        ``int`` subclass)."""
        t = source_type.lower()
        if t == "string":
            return isinstance(val, str)
        if t.startswith("decimal"):
            import decimal

            return isinstance(val, decimal.Decimal)
        if t == "boolean":
            return isinstance(val, bool)
        return not isinstance(val, bool)

    def _bucket_values(self, vals: list, spec: dict) -> list[int | None]:
        """The buckets a list of literals hash to. The write and the
        probe must share the exact hash Spark's ``xxhash64`` computes;
        for the verified type families (integral / double / string)
        that hash comes from the pure-Python ``functions.xxh64``
        implementation (JVM-equality property-tested) — zero Spark
        jobs, and it works where no session exists at all (the
        ``scrappy_snapshot`` DataSource planning worker). Types
        outside that scope fall back to a ONE-row driver job through
        Spark's own xxhash64 (conjunct-sized, memoized). An entry is
        ``None`` when the literal does not cast to the partition
        column's type, or when the cast could diverge from the
        filter's own coercion (``_probe_safe`` — ADVICE r12 #2): the
        probe is then unprovable — no file pruned; the real filter
        still applies. The JVM fallback checks the cast result
        explicitly because xxhash64 of NULL is the SEED, not NULL —
        reading the bucket alone would prune to a phantom bucket.
        Probes memoize per (spec, literal)."""
        from pyspark.sql import functions as F

        from ..functions.xxh64 import spark_xxhash64

        skey = (spec["id"], spec.get("n"), spec["source_type"])
        out: list[int | None] = [None] * len(vals)
        todo: list[tuple[int, object]] = []
        for i, v in enumerate(vals):
            ck = (skey, type(v).__name__, repr(v))
            if ck in self._bucket_probe_cache:
                out[i] = self._bucket_probe_cache[ck]
            elif not self._probe_safe(v, spec["source_type"]):
                self._bucket_probe_cache[ck] = None
            else:
                h = spark_xxhash64(v, spec["source_type"])
                if h is not None:
                    got = int(h % spec["n"])  # pmod: non-negative
                    out[i] = got
                    self._bucket_probe_cache[ck] = got
                else:
                    todo.append((i, v))
        if not todo:
            return out
        try:
            cols = []
            for j, (_, v) in enumerate(todo):
                cast = F.lit(v).try_cast(spec["source_type"])
                cols.append(cast.alias(f"c{j}"))
                cols.append(
                    F.pmod(F.xxhash64(cast), F.lit(spec["n"])).alias(f"b{j}")
                )
            row = self.spark.range(1).select(*cols).first()
        except Exception:
            return out  # uncastable literal type: nothing provable
        for j, (i, v) in enumerate(todo):
            got = None if row[f"c{j}"] is None else int(row[f"b{j}"])
            out[i] = got
            self._bucket_probe_cache[(skey, type(v).__name__, repr(v))] = got
        return out

    @staticmethod
    def _where_condition(conjuncts):
        from pyspark.sql import functions as F

        ops = {
            "=": lambda c, v: c == v,
            "<": lambda c, v: c < v,
            "<=": lambda c, v: c <= v,
            ">": lambda c, v: c > v,
            ">=": lambda c, v: c >= v,
            "between": lambda c, v: c.between(v[0], v[1]),
            "in": lambda c, v: c.isin(list(v)) if list(v) else F.lit(False),
        }
        cond = None
        for col, op, val in conjuncts:
            leg = ops[op](F.col(col), val)
            cond = leg if cond is None else cond & leg
        return cond

    def version_as_of(self, ts: float) -> int:
        """Largest committed version whose ``committed_at`` is at or
        before ``ts`` (epoch seconds) — Iceberg's TIMESTAMP AS OF.
        ``committed_at`` is the publishing writer's wall clock, so
        under multi-writer clock skew the mapping is advisory at the
        skew's granularity; version numbers (the link-serialized
        truth) remain the exact ordering. Raises when ``ts`` predates
        the first commit."""
        best = None
        for m in self.versions():
            if m["committed_at"] <= ts and (
                best is None or m["version"] > best
            ):
                best = m["version"]
        if best is None:
            raise ValueError(
                f"snapshot table {self.path!r}: no version committed at "
                f"or before {ts}"
            )
        return best

    def prune_report(self, where, version: int | None = None) -> dict:
        """How selective a ``read(where=...)`` would be, at manifest
        grain: total vs surviving file counts — the number a plan
        review (or a test) pins to prove pruning actually happened."""
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"snapshot table {self.path!r} has no commits")
        m = self._manifest(v)
        kept, _ = self._pruned_files(m, where)
        return {
            "n_files": len(m["files"]),
            "n_read": len(kept),
            "n_pruned": len(m["files"]) - len(kept),
        }

    def read(
        self, version: int | None = None, where=None, as_of: float | None = None
    ) -> DataFrame:
        """The table at ``version`` (default: HEAD). Reads exactly the
        manifest's file list — concurrent commits are invisible.

        ``as_of``: an epoch-seconds timestamp instead of a version
        (``version_as_of`` semantics — TIMESTAMP AS OF); mutually
        exclusive with ``version``.

        ``where``: optional ``(col, op, value)`` conjuncts. Files whose
        manifest [min, max] stats prove them row-free are NOT read at
        all (manifest pruning — see ``commit(stats_cols=...)``), and
        the predicate is then applied to the survivors, so the result
        equals an unpruned read + filter whether or not any file
        carries stats."""
        if as_of is not None:
            if version is not None:
                raise ValueError("read: pass version OR as_of, not both")
            version = self.version_as_of(as_of)
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"snapshot table {self.path!r} has no commits")
        m = self._manifest(v)
        files = m["files"]
        if (
            not files
            and not m.get("deletes")
            and "columns" not in m
            and "schema" not in m
        ):
            # only a LEGACY schema-less manifest is unreadable when
            # empty (no way to type the frame); a delete that stats
            # fully settle across every file legitimately publishes
            # files=[] with no pending entries, and the recorded
            # schema types the empty result (ADVICE r11 #2)
            raise ValueError(f"version {v} references no files")
        if where is not None:
            kept, conjuncts = self._pruned_files(m, where)
            base = self._read_subset(m, kept)
            return base.filter(self._where_condition(conjuncts))
        return self._read_subset(m, files)

    def _raw_read(self, m: dict, files: list[str]) -> DataFrame:
        """``files`` of manifest ``m`` with NO delete application —
        id-mapped for identity manifests, recorded-schema for flat
        ones (files predating a widening append read NULL for the
        added columns; pre-schema manifests fall back to footer
        inference), typed-empty for an empty list."""
        if not files:
            if "columns" in m:
                return self.spark.createDataFrame([], _struct_of(m["columns"]))
            return self.spark.createDataFrame(
                [], StructType.fromJson(json.loads(m["schema"]))
            )
        if "columns" in m:
            return self._read_mapped(m, files)
        reader = self.spark.read
        if "schema" in m:
            reader = reader.schema(
                StructType.fromJson(json.loads(m["schema"]))
            )
        return reader.parquet(*files)

    def _read_subset(self, m: dict, files: list[str]) -> DataFrame:
        """``files`` of manifest ``m`` with the version's row-level
        deletes applied. Each delete entry is SCOPED to the files it
        named at delete time, so files are grouped by the exact set of
        entries covering them (almost always 1-2 groups), each group
        reads once with its own merge-on-read legs, and the groups
        union — a later append (outside every scope) pays nothing."""
        deletes = m.get("deletes", [])
        if not deletes:
            return self._raw_read(m, files)
        scopes = [set(e["files"]) for e in deletes]
        groups: dict[tuple[int, ...], list[str]] = {}
        for p in files:
            sig = tuple(i for i, s in enumerate(scopes) if p in s)
            groups.setdefault(sig, []).append(p)
        out: DataFrame | None = None
        for sig in sorted(groups):
            part = self._raw_read(m, groups[sig])
            for i in sig:
                part = self._apply_delete(part, m, deletes[i])
            out = part if out is None else out.unionByName(part)
        return out if out is not None else self._raw_read(m, [])

    def read_files(
        self, files: list[str], version: int | None = None
    ) -> DataFrame:
        """A SUBSET of a version's files under that version's logical
        schema (id-mapped, current names) — the compaction rewrite
        path, where a bin may mix files written under different
        schemas and a flat recorded-schema read would NULL out renamed
        columns."""
        v = self.current_version() if version is None else version
        m = self._manifest(v)
        extra = [p for p in files if p not in set(m["files"])]
        if extra:
            raise ValueError(
                f"read_files: {extra[0]!r} is not a file of version {v}"
            )
        if "columns" in m:
            return self._read_mapped(m, files)
        reader = self.spark.read
        if "schema" in m:
            reader = reader.schema(StructType.fromJson(json.loads(m["schema"])))
        return reader.parquet(*files)

    def _read_mapped(self, m: dict, files: list[str]) -> DataFrame:
        """Read ``files`` BY COLUMN ID: group by write schema, read
        each group under exactly the names/types its files were
        written with, project every group onto the manifest's logical
        columns (id present → rename to the current name; id absent →
        typed NULL), and union. One parquet scan per distinct write
        schema — manifest-grain metadata, not data work."""
        from pyspark.sql import functions as F

        cols = m["columns"]
        schemas = m["schemas"]
        fs = m["file_schema"]
        unmapped = [p for p in files if p not in fs]
        if unmapped:
            raise ValueError(
                f"version {m['version']} has no write-schema mapping for "
                f"{unmapped[0]!r} — manifest corrupt"
            )
        groups: dict[str, list[str]] = {}
        for p in files:
            groups.setdefault(fs[p], []).append(p)
        out: DataFrame | None = None
        for sid in sorted(groups):
            wcols = schemas[sid]
            by_id = {c["id"]: c for c in wcols}
            part = (
                self.spark.read.schema(_struct_of(wcols))
                .parquet(*groups[sid])
            )
            sel = []
            for c in cols:
                w = by_id.get(c["id"])
                if w is not None:
                    sel.append(F.col(w["name"]).alias(c["name"]))
                else:
                    sel.append(
                        F.lit(None)
                        .cast(_struct_of([c]).fields[0].dataType)
                        .alias(c["name"])
                    )
            part = part.select(*sel)
            out = part if out is None else out.unionByName(part)
        assert out is not None
        return out

    def diff(self, a: int, b: int) -> dict:
        """File-level diff {added, removed} from version a to b."""
        fa = set(self._manifest(a)["files"])
        fb = set(self._manifest(b)["files"])
        return {"added": sorted(fb - fa), "removed": sorted(fa - fb)}

    def row_diff(self, a: int, b: int, key_cols: list[str]) -> DataFrame:
        """Row-level change-data feed from version ``a`` to ``b``:
        key columns plus ``change`` ∈ {'added','removed','changed'};
        unchanged rows are absent. Keys must be unique per version
        (the usual primary-key contract for CDC).

        Scale shape: each side is reduced to (key, 64-bit payload
        hash) AT THE SCAN — wide payload columns never cross the
        shuffle — then one full-outer join on the key classifies every
        row. Two scans + one join, no collect, works at any table
        width.
        """
        from pyspark.sql import functions as F

        da, db = self.read(a), self.read(b)
        if set(da.columns) != set(db.columns):
            raise ValueError(
                f"schema mismatch between versions {a} and {b}: "
                f"{sorted(da.columns)} vs {sorted(db.columns)}"
            )
        payload = [c for c in da.columns if c not in key_cols]

        def keyed(df: DataFrame, tag: str) -> DataFrame:
            # Hash the JSON of the payload struct, NOT the bare columns:
            # Spark's hash functions pass the running seed through NULL
            # children, so xxhash64(a, b) of ('x', NULL) equals (NULL,
            # 'x') — a value MOVING between payload columns would read
            # as "unchanged". to_json omits null fields, so the null
            # PATTERN is encoded in the key names and every shift
            # changes the hash.
            h = (
                F.xxhash64(F.to_json(F.struct(*payload)))
                if payload
                else F.lit(0)
            )
            return df.select(*key_cols, h.alias(f"_h_{tag}"))

        old, new = keyed(da, "a"), keyed(db, "b")
        joined = old.join(new, on=key_cols, how="full_outer")
        change = (
            F.when(F.col("_h_a").isNull(), F.lit("added"))
            .when(F.col("_h_b").isNull(), F.lit("removed"))
            .when(F.col("_h_a") != F.col("_h_b"), F.lit("changed"))
        )
        return (
            joined.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(*key_cols, "change")
        )

    # ------------------------------------------------------------ expire

    def read_incremental(
        self, since_version: int, version: int | None = None
    ) -> DataFrame:
        """Rows ADDED between ``since_version`` (exclusive) and
        ``version`` (inclusive, default head) — the incremental append
        scan (Iceberg's changes-since): the consumer of an ingest
        table reads each new batch exactly once by remembering the
        last version it processed, at FILE grain — no row-level
        compare, no join, just the manifest set difference scanned.

        Only valid over an append-only range: a commit in the range
        that DROPPED or rewrote files (replace, compaction,
        apply_deletes, a full-cover delete) raises loudly — rewritten
        rows would re-surface as phantom "new" rows; use
        :meth:`row_diff` for true row-level CDC across rewrites.
        Row-level deletes pending at ``version`` apply to the new
        files they scope, exactly as in ``read``."""
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"snapshot table {self.path!r} has no commits")
        if since_version > v:
            raise ValueError(
                f"read_incremental: since_version {since_version} is "
                f"ahead of version {v}"
            )
        base = self._manifest(since_version)
        m = self._manifest(v)
        # append-only guard: every file present at a version must
        # still be present at the next (deletes that keep files and
        # metadata-only commits pass; rewrites fail)
        prev = set(base["files"])
        for i in range(since_version + 1, v + 1):
            cur = self._manifest(i)
            missing = prev - set(cur["files"])
            if missing:
                raise ValueError(
                    f"read_incremental: version {i} dropped or rewrote "
                    f"{len(missing)} file(s) ({sorted(missing)[0]!r} "
                    f"...) — not an append-only range; use row_diff "
                    f"for row-level CDC across rewrites"
                )
            prev = set(cur["files"])
        base_files = set(base["files"])
        new_files = [p for p in m["files"] if p not in base_files]
        return self._read_subset(m, new_files)

    def rollback(self, version: int, message: str = "") -> dict:
        """Make ``version``'s state the NEW head — one metadata commit
        republishing its manifest content (Iceberg's rollback): the
        bad commits stay in history (auditable, expirable later),
        readers atomically cut over, and nothing is rewritten. The
        undo story for a botched merge/compaction at any table size."""
        head = self.current_version()
        if head is None:
            raise ValueError(f"snapshot table {self.path!r} has no commits")
        if version == head:
            return self._manifest(head)
        src = self._manifest(version)  # loud if expired/unknown
        m = self._derived_manifest(
            src, head + 1, head, message or f"rollback to v{version}"
        )
        m["rolled_back_to"] = version
        self._link_json(
            os.path.join(self._mdir, f"v{head + 1}.json"),
            m,
            f"snapshot table {self.path!r}: version {head + 1} was "
            f"committed by a concurrent writer — re-read the head and "
            f"retry the rollback",
        )
        # same ref-vs-expire handshake as create_branch/tag: the new
        # head references an OLD version's files, so re-validate that
        # version's manifest after linking — expire drops manifests
        # before sweeping files, so presence here proves the sweep
        # will see this new head (it IS the head) before deleting
        try:
            self._manifest(version)
        except FileNotFoundError:
            try:
                os.remove(os.path.join(self._mdir, f"v{head + 1}.json"))
            except FileNotFoundError:
                pass
            raise CommitConflict(
                f"rollback: version {version} was expired concurrently "
                f"— roll back to a version inside the retention window"
            ) from None
        self._advise_head(head + 1)
        return m

    # ------------------------------------------------ metadata tables

    def files_df(self, version: int | None = None) -> DataFrame:
        """The version's FILE inventory as a DataFrame — Iceberg's
        ``table.files`` metadata table: one row per data file with
        size / row count (parquet FOOTER metadata, read DISTRIBUTED
        via ``mapInPandas`` — no data bytes move, and the driver never
        loops over files), plus the manifest-side facts: schema id,
        partition spec id and value, stats/bloom coverage. The
        operational queries ride on top as plain SQL: small-file
        skew ("how many files under 16 MB" → compaction planning),
        partition balance, pruning-axis coverage."""
        import pandas as pd

        from pyspark.sql.types import (
            BooleanType,
            LongType,
            StringType,
        )

        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"snapshot table {self.path!r} has no commits")
        m = self._manifest(v)
        file_schema = m.get("file_schema", {})
        parts = m.get("partitions", {})
        file_specs = m.get("partition_file_specs", {})
        cur_spec = m.get("partition_spec_id")
        stats = m.get("stats", {})
        blooms = m.get("blooms", {})
        rows = [
            {
                "file": p,
                "schema_id": file_schema.get(p),
                # "-" = the implicit single spec of a never-evolved
                # table (matches --table-describe); a real id once
                # the spec list exists
                "partition_spec_id": (
                    str(file_specs.get(p, cur_spec))
                    if "partition_spec" in m
                    and p in parts
                    and file_specs.get(p, cur_spec) is not None
                    else ("-" if "partition_spec" in m and p in parts else None)
                ),
                "partition": (
                    json.dumps(parts[p]) if p in parts else None
                ),
                "has_stats": p in stats,
                "has_bloom": p in blooms,
            }
            for p in m["files"]
        ]
        schema = StructType(
            [
                StructField("file", StringType()),
                StructField("schema_id", StringType()),
                StructField("partition_spec_id", StringType()),
                StructField("partition", StringType()),
                StructField("has_stats", BooleanType()),
                StructField("has_bloom", BooleanType()),
            ]
        )
        base = self.spark.createDataFrame(rows, schema)
        out_schema = StructType(
            schema.fields
            + [
                StructField("size_bytes", LongType()),
                StructField("row_count", LongType()),
            ]
        )

        def _footer(batches):
            import pyarrow.parquet as _pq

            for pdf in batches:
                sizes, counts = [], []
                for p in pdf["file"]:
                    try:
                        sizes.append(os.path.getsize(p))
                        counts.append(_pq.ParquetFile(p).metadata.num_rows)
                    except OSError:
                        sizes.append(None)
                        counts.append(None)
                pdf = pdf.assign(size_bytes=sizes, row_count=counts)
                yield pd.DataFrame(pdf, columns=[f.name for f in out_schema])

        return base.mapInPandas(_footer, out_schema)

    def history_df(self) -> DataFrame:
        """This branch's commit history as a DataFrame — Iceberg's
        ``table.history``/``table.snapshots``: version, parent,
        commit timestamp, message, file count, pending-delete count,
        and the ref lineage fields (fork / merge provenance)."""
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
        )

        rows = [
            {
                "version": m["version"],
                "parent": m.get("parent"),
                "committed_at": float(m["committed_at"]),
                "message": m.get("message", ""),
                "n_files": len(m["files"]),
                "n_pending_deletes": len(m.get("deletes", [])),
                "forked_from": (
                    json.dumps(m["forked_from"])
                    if "forked_from" in m
                    else None
                ),
                "merged_from": (
                    json.dumps(m["merged_from"])
                    if "merged_from" in m
                    else None
                ),
                "added_files": m.get("summary", {}).get("added_files"),
                "added_rows": m.get("summary", {}).get("added_rows"),
            }
            for m in self.versions()
        ]
        schema = StructType(
            [
                StructField("version", LongType()),
                StructField("parent", LongType()),
                StructField("committed_at", DoubleType()),
                StructField("message", StringType()),
                StructField("n_files", LongType()),
                StructField("n_pending_deletes", LongType()),
                StructField("forked_from", StringType()),
                StructField("merged_from", StringType()),
                StructField("added_files", LongType()),
                StructField("added_rows", LongType()),
            ]
        )
        return self.spark.createDataFrame(rows, schema)

    def refs_df(self) -> DataFrame:
        """Every ref as a DataFrame — Iceberg's ``table.refs``: one
        row per branch (with its head version) and per tag (with its
        pinned branch + version)."""
        from pyspark.sql.types import LongType, StringType

        rows = []
        for b in self.branches():
            rows.append(
                {
                    "kind": "branch",
                    "name": b,
                    "branch": b,
                    "version": self.for_branch(b).current_version(),
                }
            )
        for name, t in self.tags().items():
            rows.append(
                {
                    "kind": "tag",
                    "name": name,
                    "branch": t["branch"],
                    "version": t["version"],
                }
            )
        schema = StructType(
            [
                StructField("kind", StringType()),
                StructField("name", StringType()),
                StructField("branch", StringType()),
                StructField("version", LongType()),
            ]
        )
        return self.spark.createDataFrame(rows, schema)

    def add_blooms(
        self,
        cols: list[str],
        bloom_bits: int = 8192,
        message: str = "",
    ) -> dict:
        """Designate per-file Bloom filters on ``cols`` AFTER the fact:
        one distributed pass over only the files MISSING a designated
        bloom, then a metadata-only commit (same file list, blooms
        merged into the manifest). This is how a table written through
        the ``scrappy_snapshot`` DataSource writer — whose commit hook
        runs session-free and cannot build blooms — gains the
        point-lookup pruning axis later, and how an operator backfills
        blooms over appended files incrementally: files that already
        carry every requested bloom are never rescanned, so repeated
        calls are O(new files), not O(table).

        Files are scanned per WRITE SCHEMA under the name the column
        had when the file was written (ids are rename-proof), so the
        backfill is correct across renames. Publication rides the
        version link gate — a concurrent commit surfaces as
        :class:`CommitConflict`, safe to re-run."""
        head = self.current_version()
        if head is None:
            raise ValueError(f"snapshot table {self.path!r} has no commits")
        m = self._manifest(head)
        if "columns" not in m:
            raise ValueError(
                "add_blooms: legacy schema-less manifest — commit once "
                "through SnapshotTable.commit first"
            )
        by_name = {c["name"]: c["id"] for c in m["columns"]}
        missing = [c for c in cols if c not in by_name]
        if missing:
            raise ValueError(
                f"add_blooms: no column {missing[0]!r} ({sorted(by_name)})"
            )
        want_ids = {c: by_name[c] for c in cols}
        blooms = {p: dict(v) for p, v in m.get("blooms", {}).items()}
        todo = [
            p
            for p in m["files"]
            if any(
                str(i) not in blooms.get(p, {}) for i in want_ids.values()
            )
        ]
        if not todo and set(want_ids.values()) <= set(
            m.get("bloom_ids", [])
        ):
            return m  # fully covered already: no junk version
        schemas = m.get("schemas", {})
        file_schema = m.get("file_schema", {})
        by_sid: dict[str, list[str]] = {}
        for p in todo:
            by_sid.setdefault(file_schema.get(p, ""), []).append(p)
        for sid, group in by_sid.items():
            # the column's WRITE-TIME name in this group's files
            write_name = {
                c["id"]: c["name"] for c in schemas.get(sid, m["columns"])
            }
            names = [
                write_name[i] for i in want_ids.values() if i in write_name
            ]
            got = (
                _collect_blooms(
                    self.spark, group, names, bloom_bits, _BLOOM_K
                )
                if names
                else {}
            )
            id_of = {v: k for k, v in write_name.items()}
            for p, per in got.items():
                slot = blooms.setdefault(p, {})
                for name, bloom in per.items():
                    slot[str(id_of[name])] = bloom
            # files the pass could not bloom — column absent from the
            # write schema or all-NULL (nothing collected) — get a
            # payload-less MARKER so the next backfill call sees them
            # covered and stays a no-op; markers never prune (a probe
            # on an absent/NULL column keeps the file, conservative)
            for p in group:
                slot = blooms.setdefault(p, {})
                for cid in want_ids.values():
                    slot.setdefault(str(cid), {"none": True})
        if (
            all(
                str(i) in blooms.get(p, {})
                for p in m["files"]
                for i in want_ids.values()
            )
            and blooms == m.get("blooms", {})
            and set(want_ids.values()) <= set(m.get("bloom_ids", []))
        ):
            return m  # nothing changed: no junk version
        manifest = self._derived_manifest(
            m, head + 1, head, message or f"add blooms on {cols}"
        )
        manifest["blooms"] = {p: v for p, v in blooms.items() if v}
        manifest["bloom_ids"] = sorted(
            set(m.get("bloom_ids", [])) | set(want_ids.values())
        )
        self._link_json(
            os.path.join(self._mdir, f"v{head + 1}.json"),
            manifest,
            f"snapshot table {self.path!r}: version {head + 1} was "
            f"committed by a concurrent writer — re-run add_blooms "
            f"against the new head",
        )
        self._advise_head(head + 1)
        return manifest

    # ------------------------------------------------- refs: branches/tags

    def _tags_dir(self) -> str:
        return os.path.join(self.path, "_manifests", "tags")

    def _link_json(self, target: str, payload: dict, conflict: str) -> None:
        """Write ``payload`` complete under a writer-unique tmp name in
        ``target``'s directory, then ``os.link`` it into place — the
        same exactly-once publication gate as ``_publish`` (POSIX link
        fails if the name exists), reused for branch forks, tags and
        fast-forwards so every ref mutation is atomic and loses races
        loudly."""
        d = os.path.dirname(target)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{os.path.basename(target)}.{_token()}.tmp")
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1)
        try:
            os.link(tmp, target)
        except FileExistsError:
            os.unlink(tmp)
            raise CommitConflict(conflict) from None
        os.unlink(tmp)

    @staticmethod
    def _derived_manifest(
        src: dict, version: int, parent: int | None, message: str
    ) -> dict:
        """A new manifest with ``src``'s CONTENT (file list, column
        identity, stats, blooms, partition specs, pending deletes) and
        fresh lineage fields — the metadata-only commit behind forks
        and fast-forwards: no byte of data moves."""
        out = {
            "version": version,
            "parent": parent,
            "message": message,
            "committed_at": time.time(),
        }
        for k in (
            "files", "n_files", "schema",
            "columns", "schemas", "file_schema", "next_col_id",
            "stats", "stats_ids", "blooms", "bloom_ids",
            "partition_spec", "partitions", "partition_specs",
            "partition_spec_id", "partition_file_specs", "deletes",
        ):
            if k in src:
                out[k] = src[k]
        return out

    def for_branch(self, name: str) -> "SnapshotTable":
        """A handle on the same table scoped to branch ``name`` —
        every method (commit / read / delete / merge / expire) then
        operates on that branch's manifest line."""
        return SnapshotTable(self.spark, self.path, branch=name)

    def branches(self) -> list[str]:
        """All branch names, ``main`` first (present iff the table has
        any commit)."""
        out = []
        if os.path.isdir(os.path.join(self.path, "_manifests")):
            out.append("main")
        bdir = os.path.join(self.path, "_manifests", "branches")
        if os.path.isdir(bdir):
            out.extend(sorted(os.listdir(bdir)))
        return out

    def create_branch(
        self, name: str, version: int | None = None, message: str = ""
    ) -> "SnapshotTable":
        """Fork branch ``name`` from THIS handle's branch at
        ``version`` (default: its head) — the Iceberg branch model:
        the fork is one metadata commit (the source manifest's content
        republished as the new branch's v0, recording ``forked_from``
        lineage); data files are shared, writers on each branch then
        advance independent heads under independent conflict gates,
        and ``expire`` on any branch protects files any OTHER branch
        still references. Creation is exactly-once (the v0 link):
        two racers get one branch and one loud :class:`CommitConflict`.

        Why this matters at 100 TB: an experiment ("re-clean the
        corpus with different filters, compare, maybe promote") must
        not copy the table or block the ingest writers — a fork is
        O(manifest), both lines append safely, and promotion is
        :meth:`fast_forward` — again metadata-grain."""
        _check_ref_name(name)
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(
                f"snapshot table {self.path!r}: cannot branch an "
                f"empty table"
            )
        src = self._manifest(v)
        m = self._derived_manifest(
            src, 0, None, message or f"fork of {self.branch}@{v}"
        )
        m["forked_from"] = {"branch": self.branch, "version": v}
        self._link_json(
            os.path.join(_branch_mdir(self.path, name), "v0.json"),
            m,
            f"snapshot table {self.path!r}: branch {name!r} already "
            f"exists",
        )
        # ref-vs-expire race detection: expire drops manifests BEFORE
        # sweeping files, so if the source manifest still exists after
        # our link landed, no expire run can delete its files without
        # first enumerating refs — and it would now see this branch.
        # If it is gone, a concurrent expire is processing the source
        # version: roll the fork back and fail loudly instead of
        # publishing a branch whose files are being deleted.
        try:
            self._manifest(v)
        except FileNotFoundError:
            # roll back ONLY the v0 this writer linked — a concurrent
            # writer may have already committed v1+ on the new branch,
            # and destroying another writer's published manifest is
            # never this writer's call (their reads will fail loudly
            # against the expired files regardless)
            bdir = _branch_mdir(self.path, name)
            try:
                os.remove(os.path.join(bdir, "v0.json"))
                os.rmdir(bdir)  # only if nothing else landed
            except OSError:
                pass
            raise CommitConflict(
                f"create_branch: version {v} of branch "
                f"{self.branch!r} was expired concurrently — fork from "
                f"a version inside the retention window"
            ) from None
        return self.for_branch(name)

    def drop_branch(self, name: str) -> None:
        """Delete branch ``name``'s manifest line (``main`` refuses).
        Data files the branch alone referenced become unreferenced and
        are reclaimed by the next aged ``expire`` sweep — dropping a
        ref is metadata-only, GC stays expire's job (the Iceberg
        split). Refuses while a TAG pins a version on the branch: the
        tag is a reproducibility promise, and letting the branch name
        be dropped and recreated would silently retarget it to
        unrelated data — delete the tags first, explicitly."""
        _check_ref_name(name)
        d = _branch_mdir(self.path, name)
        if not os.path.isdir(d):
            raise ValueError(
                f"snapshot table {self.path!r}: no branch {name!r}"
            )
        pinning = sorted(
            t["name"]
            for t in self.tags().values()
            if t.get("branch") == name
        )
        if pinning:
            raise ValueError(
                f"drop_branch: tag(s) {pinning} pin branch {name!r} — "
                f"delete_tag first (a recreated branch would silently "
                f"retarget them)"
            )
        shutil.rmtree(d)

    def tag(self, name: str, version: int | None = None) -> dict:
        """Pin ``(this branch, version)`` under an immutable name —
        Iceberg's tag: ``read(tag=...)`` resolves it from any handle,
        and ``expire`` on the tagged branch keeps the pinned manifest
        (and therefore its files) alive regardless of ``keep_last`` —
        the reproducibility contract for "the exact table train-run
        2026-08 read". Exactly-once via the link gate; retargeting is
        ``delete_tag`` + ``tag`` (loud, never silent)."""
        _check_ref_name(name)
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(
                f"snapshot table {self.path!r}: cannot tag an empty "
                f"table"
            )
        self._manifest(v)  # loud if the version does not exist
        payload = {
            "name": name,
            "branch": self.branch,
            "version": v,
            "created_at": time.time(),
        }
        self._link_json(
            os.path.join(self._tags_dir(), f"{name}.json"),
            payload,
            f"snapshot table {self.path!r}: tag {name!r} already "
            f"exists (delete_tag first to retarget)",
        )
        # same ref-vs-expire detection as create_branch: manifests
        # drop before files sweep, so post-link manifest presence
        # proves a concurrent expire will see this tag before
        # touching the pinned version's files
        try:
            self._manifest(v)
        except FileNotFoundError:
            try:
                os.remove(os.path.join(self._tags_dir(), f"{name}.json"))
            except FileNotFoundError:
                pass
            raise CommitConflict(
                f"tag: version {v} of branch {self.branch!r} was "
                f"expired concurrently — tag a version inside the "
                f"retention window"
            ) from None
        return payload

    def tags(self) -> dict[str, dict]:
        """All tags, name → ``{branch, version, created_at}``."""
        d = self._tags_dir()
        out: dict[str, dict] = {}
        if os.path.isdir(d):
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".json"):
                    with open(os.path.join(d, fn)) as f:
                        t = json.load(f)
                    out[t["name"]] = t
        return out

    def delete_tag(self, name: str) -> None:
        try:
            os.remove(os.path.join(self._tags_dir(), f"{name}.json"))
        except FileNotFoundError:
            raise ValueError(
                f"snapshot table {self.path!r}: no tag {name!r}"
            ) from None

    def read_tag(self, name: str, where=None) -> DataFrame:
        """The table exactly as tagged — resolves the tag's (branch,
        version) and reads there, from any handle."""
        t = self.tags().get(name)
        if t is None:
            raise ValueError(
                f"snapshot table {self.path!r}: no tag {name!r}"
            )
        return self.for_branch(t["branch"]).read(
            version=t["version"], where=where
        )

    def fast_forward(
        self, branch: str, force: bool = False, message: str = ""
    ) -> dict:
        """Advance THIS branch to branch ``branch``'s head state — one
        metadata commit whose content is the source head's manifest
        (files, identity, stats, blooms, specs, pending deletes),
        recording ``merged_from`` lineage. Promotion of an experiment
        branch is therefore O(manifest) at any table size.

        Clean fast-forward requires the source to have been forked
        FROM this branch and this branch not to have advanced since
        the fork point (true ancestry — nothing is discarded). If this
        branch moved, the replace would silently drop its commits, so
        it raises unless ``force=True`` (an explicit snapshot-level
        replace; the overwritten versions stay time-travelable until
        ``expire``). Publication rides the version link gate, so a
        concurrent commit to this branch turns into a loud
        :class:`CommitConflict` — safe to re-run."""
        src = self.for_branch(branch)
        sv = src.current_version()
        if sv is None:
            raise ValueError(
                f"snapshot table {self.path!r}: branch {branch!r} has "
                f"no commits"
            )
        if not force:
            try:
                fork = src._manifest(0).get("forked_from")
            except FileNotFoundError:
                raise ValueError(
                    f"fast_forward: branch {branch!r}'s fork record "
                    f"(its v0) was expired, so clean ancestry cannot "
                    f"be verified — pass force=True for an explicit "
                    f"snapshot-level replace"
                ) from None
            head = self.current_version()
            if (
                fork is None
                or fork.get("branch") != self.branch
                or head != fork.get("version")
            ):
                raise ValueError(
                    f"fast_forward: branch {branch!r} was forked from "
                    f"{fork and fork.get('branch')!r}@"
                    f"{fork and fork.get('version')} but {self.branch!r} "
                    f"is at {head} — not a clean fast-forward; pass "
                    f"force=True for an explicit snapshot-level replace"
                )
        head = self.current_version()
        version = 0 if head is None else head + 1
        m = self._derived_manifest(
            src._manifest(sv),
            version,
            head,
            message or f"fast-forward from {branch}@{sv}",
        )
        m["merged_from"] = {"branch": branch, "version": sv}
        self._link_json(
            os.path.join(self._mdir, f"v{version}.json"),
            m,
            f"snapshot table {self.path!r}: version {version} was "
            f"committed by a concurrent writer — re-read the head and "
            f"retry the fast-forward",
        )
        self._advise_head(version)
        return m

    def expire(
        self,
        keep_last: int = 1,
        orphan_grace_sec: float = 86400.0,
        dry_run: bool = False,
    ) -> dict:
        """Drop manifests older than the last ``keep_last`` and delete
        data files no retained manifest references — in two classes
        (VERDICT r12 #1):

        - files referenced by a DROPPED manifest (and by no retained
          one) are provably garbage — their version is being expired —
          and are deleted immediately, any age;
        - files referenced by NOTHING are deleted only when older than
          ``orphan_grace_sec`` (file mtime). A crash orphan and a LIVE
          concurrent writer's staged-but-unpublished commit (files
          landed in its writer-unique ``snap-{token}`` dir, manifest
          not yet linked — including every rebase-retry in flight) are
          byte-for-byte indistinguishable; an ungated sweep racing the
          writer would delete files its manifest is about to
          reference, publishing an unreadable version. This is
          Iceberg's ``remove_orphan_files(older_than=...)`` rule.
          Stale ``.tmp`` manifests age-gate the same way;
          ``orphan_grace_sec=0`` restores the immediate sweep (tests,
          single-writer offline maintenance).

        Refs narrow the sweep (the Iceberg retention rules): a TAG on
        this branch keeps its pinned manifest alive regardless of
        ``keep_last``, and data files referenced by ANY other branch's
        manifests are live — expire is branch-scoped for retention but
        table-global for reachability, because branches share data
        files.

        Operationally: expire is a WRITER — schedule it like one, and
        keep the grace comfortably above the longest plausible
        stage-to-publish window (the default is 24 h).
        ``dry_run=True`` reports what WOULD be dropped and deleted
        without touching anything — run it before the first scheduled
        expire on a production table. Returns
        ``{dropped_versions, deleted_files}``."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        now = time.time()
        manifests = self.versions()
        # refs protect retention two ways (the Iceberg rules):
        # - a TAG on this branch keeps its pinned manifest (and so its
        #   files) regardless of keep_last — tags are the
        #   reproducibility contract, expire must not age them out;
        # - every OTHER branch's manifests are out of this expire's
        #   scope entirely, but the data files they reference are
        #   still live (data is shared across branches — a fork copies
        #   manifests, not bytes), so they join the live set.
        tagged = {
            t["version"]
            for t in self.tags().values()
            if t.get("branch", "main") == self.branch
        }
        cut = manifests[-keep_last:]
        cut_versions = {m["version"] for m in cut}
        keep = [
            m
            for m in manifests
            if m["version"] in cut_versions or m["version"] in tagged
        ]
        drop = [m for m in manifests if m not in keep]

        # drop manifests BEFORE sweeping files — the ref-vs-expire
        # handshake: create_branch/tag re-validate their SOURCE
        # manifest after linking their ref and abort loudly when it is
        # gone, so a ref that survives its own validation either (a)
        # linked before this drop and is seen by the post-drop re-read
        # below, or (b) pinned a version this expire kept. Files-first
        # ordering would leave a silent window where a fresh ref
        # references already-deleted parquet.
        if not dry_run:
            for m in drop:
                try:
                    os.remove(
                        os.path.join(self._mdir, f"v{m['version']}.json")
                    )
                except FileNotFoundError:
                    pass  # concurrent expire got it first
        # post-drop ref re-read: a tag that linked between our first
        # tags() read and the drop above pins a version we just
        # dropped — RESTORE its manifest (we hold the full dict; the
        # link gate tolerates racers) and keep its files. The tag's
        # own post-link validation may or may not have seen the gap;
        # every interleaving ends kept-or-loud, never silently broken.
        retagged = {
            t["version"]
            for t in self.tags().values()
            if t.get("branch", "main") == self.branch
        } - {m["version"] for m in keep}
        if retagged:
            restored = [m for m in drop if m["version"] in retagged]
            for m in restored:
                if not dry_run:
                    try:
                        self._link_json(
                            os.path.join(
                                self._mdir, f"v{m['version']}.json"
                            ),
                            m,
                            "concurrent restore",
                        )
                    except CommitConflict:
                        pass  # someone re-published it: fine
            keep = keep + restored
            drop = [m for m in drop if m["version"] not in retagged]

        live: set[str] = set()
        for m in keep:
            live.update(m["files"])
            for e in m.get("deletes", []):
                live.update(e.get("delete_files", []))
        # other branches are enumerated AFTER the manifest drops: a
        # fork that linked its v0 before this point joins the live
        # set; one that links later will fail its own post-link
        # source-manifest validation if its source was dropped.
        for other in self.branches():
            if other == self.branch:
                continue
            peer = self.for_branch(other)
            for m in peer.versions():
                live.update(m["files"])
                for e in m.get("deletes", []):
                    live.update(e.get("delete_files", []))
        dropped_refs: set[str] = set()
        for m in drop:
            dropped_refs.update(m["files"])
            for e in m.get("deletes", []):
                dropped_refs.update(e.get("delete_files", []))
        dropped_refs -= live

        def _aged(p: str) -> bool:
            try:
                return now - os.path.getmtime(p) >= orphan_grace_sec
            except OSError:
                return False  # vanished under us (concurrent expire)

        deleted: list[str] = []
        # dirs we removed dropped-version parquet from (plus their
        # ancestors): their residue (_SUCCESS, .crc) belonged to the
        # expired version and may go even when young. Dirs we removed
        # AGED orphans from get a weaker pass — the removal itself
        # refreshed their mtime, so the dir's own age is excused, but
        # any remaining young FILE still protects the dir.
        dropped_dirs: set[str] = set()
        orphan_dirs: set[str] = set()
        data_dir = os.path.join(self.path, "data")
        if os.path.isdir(data_dir):
            # recursive walk: partitioned commits nest files under
            # __p=<value> subdirs — a one-level listing would read a
            # partitioned snap dir as "no parquet here" and rmtree
            # LIVE nested files
            for dirpath, _dirs, files in os.walk(data_dir, topdown=False):
                for f in sorted(files):
                    p = os.path.join(dirpath, f)
                    if not f.endswith(".parquet") or p in live:
                        continue
                    if p not in dropped_refs and not _aged(p):
                        continue  # young true orphan: may be a live
                        # writer's staged-but-unpublished commit
                    if not dry_run:
                        try:
                            os.remove(p)
                        except FileNotFoundError:
                            pass  # concurrent expire got it first
                    deleted.append(p)
                    marks = (
                        dropped_dirs if p in dropped_refs else orphan_dirs
                    )
                    d = dirpath
                    while d != data_dir:
                        marks.add(d)
                        d = os.path.dirname(d)
                if dry_run:
                    continue
                if dirpath != data_dir and os.path.isdir(dirpath):
                    empty_of_parquet = not any(
                        fn.endswith(".parquet")
                        for _, _, fns in os.walk(dirpath)
                        for fn in fns
                    )
                    if not empty_of_parquet:
                        continue
                    # a parquet-free dir is only removable when it
                    # cannot be a live writer's staging area: it held
                    # a dropped version's files, or everything left
                    # under it has aged out (a freshly-created dir
                    # whose writer has not landed parquet yet — or
                    # holds young non-parquet task files — survives)
                    files_aged = all(
                        _aged(os.path.join(dp, fn))
                        for dp, _dns, fns in os.walk(dirpath)
                        for fn in fns
                    )
                    if dirpath in dropped_dirs or (
                        files_aged
                        and (_aged(dirpath) or dirpath in orphan_dirs)
                    ):
                        shutil.rmtree(dirpath, ignore_errors=True)
        if not dry_run:
            for d in (self._mdir, self._tags_dir()):
                if not os.path.isdir(d):
                    continue
                for name in os.listdir(d):
                    p = os.path.join(d, name)
                    # a young tmp manifest/ref may be a publishing
                    # writer's complete payload between write and link
                    if name.endswith(".tmp") and _aged(p):
                        try:
                            os.remove(p)
                        except FileNotFoundError:
                            pass
        return {
            "dropped_versions": [m["version"] for m in drop],
            "deleted_files": deleted,
        }
