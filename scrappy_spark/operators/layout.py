"""Data-layout operators: Z-order (Morton) clustering keys.

Parquet prunes row groups / files by min-max column stats, but a sort
on one column destroys locality on every other. Interleaving the bits
of two keys into one Morton code and sorting by THAT gives both
columns bounded per-file ranges, so selective filters on either (or
both) dimensions skip most files — the same layout trick Delta's
OPTIMIZE ZORDER BY applies, expressed here as a plain column
expression plus an ordinary sorted write (no table format needed).

Pure bit arithmetic (shifts/masks) → whole-stage codegen, zero
shuffle beyond the final range partition of the sorted write, and the
identical expression runs in DuckDB so the declared query is
oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints: bit b of ``x`` lands at
    position 2b, bit b of ``y`` at 2b+1. ``bits`` per input (≤31);
    callers bucket wider domains down first (e.g. ``col % (1<<16)``
    or a quantile rank)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    z = F.lit(0).cast("long")
    for b in range(bits):
        xbit = F.shiftright(x.cast("long"), b).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y.cast("long"), b).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(xbit, 2 * b)).bitwiseOR(
            F.shiftleft(ybit, 2 * b + 1)
        )
    return z


def z_value_sql(x_sql: str, y_sql: str, bits: int = 16) -> str:
    """The identical Morton expression as engine-portable SQL (used by
    the DuckDB oracle; any engine with shift/and/or works)."""
    terms = []
    for b in range(bits):
        terms.append(f"(((CAST({x_sql} AS BIGINT) >> {b}) & 1) << {2 * b})")
        terms.append(f"(((CAST({y_sql} AS BIGINT) >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Morton code of two
    columns: repartitionByRange on the z-value (one range shuffle)
    then sort within partitions — every output file covers a compact
    z-range, i.e. a bounded rectangle in (colA, colB) space, so
    min-max stats prune on BOTH dimensions."""
    zx, zy = (F.col(c) for c in cols)
    (
        df.withColumn("__z", z_value(zx, zy, bits))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def range_partition_write(
    df: DataFrame,
    path: str,
    col: str,
    num_files: int = 8,
    secondary_sort: tuple[str, ...] = (),
) -> None:
    """Write ``df`` as parquet range-clustered on ONE key: a single
    range shuffle (sampled split points) gives files with disjoint
    ``col`` ranges, so min-max footer stats prune any point or range
    filter on ``col`` to the few files that overlap it — the
    single-dimension complement of ``zorder_write`` (use that when TWO
    filter columns matter). ``secondary_sort`` orders rows inside each
    file after ``col`` for record-locality (e.g. time within id) —
    it does not affect file-level pruning on ``col``."""
    (
        df.repartitionByRange(num_files, F.col(col))
        .sortWithinPartitions(col, *secondary_sort)
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Hilbert curve
# ---------------------------------------------------------------------------


def hilbert_attach(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 8,
    out_col: str = "h",
) -> DataFrame:
    """Attach the Hilbert-curve index of ``(x, y)`` on a 2^bits-square
    grid. Strictly better clustering than the Morton code for layout:
    consecutive Hilbert indices are ALWAYS grid-adjacent (Manhattan
    distance 1), so a sorted write never places a file boundary across
    a locality jump — Z-order takes jumps of up to 2^bits at quadrant
    seams (`test_layout.py` measures both).

    The standard xy→d walk (per-level quadrant digit + rotate/reflect)
    carries (x, y) state across levels, so it cannot be ONE column
    expression — each level references the previous level's x twice
    and y twice, and inlining would grow the tree ~4^bits. Instead
    each level is a separate projection (``withColumns``): Catalyst
    keeps the per-level aliases (CollapseProject refuses to inline
    multiply-referenced non-trivial aliases), the whole ladder stays
    inside one whole-stage-codegen span, and the cost is ``bits``
    cheap integer ops per row — same as the Morton key, zero shuffle.
    ``hilbert_sql`` mirrors the ladder as chained CTEs bit-for-bit.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    n = 1 << bits
    out = df.withColumns(
        {
            "__hx": x.cast("long"),
            "__hy": y.cast("long"),
            "__hd": F.lit(0).cast("long"),
        }
    )
    for level in range(bits):
        k = bits - 1 - level
        s = 1 << k
        rx = F.shiftright(F.col("__hx"), k).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("__hy"), k).bitwiseAND(F.lit(1))
        out = out.withColumns(
            {
                "__hd": F.col("__hd")
                + F.lit(s * s) * (F.lit(3) * rx).bitwiseXOR(ry),
                "__hx": F.when(ry == 1, F.col("__hx"))
                .when(rx == 1, F.lit(n - 1) - F.col("__hy"))
                .otherwise(F.col("__hy")),
                "__hy": F.when(ry == 1, F.col("__hy"))
                .when(rx == 1, F.lit(n - 1) - F.col("__hx"))
                .otherwise(F.col("__hx")),
            }
        )
    return out.withColumnRenamed("__hd", out_col).drop("__hx", "__hy")


def hilbert_sql(
    source_sql: str,
    key_cols: str,
    x_sql: str,
    y_sql: str,
    bits: int = 8,
    out_col: str = "h",
) -> str:
    """Engine-portable SQL mirror of :func:`hilbert_attach`: the same
    per-level ladder as chained CTEs with level-numbered column names
    (no lateral-alias ambiguity on any engine). Returns a full SELECT
    over ``source_sql``."""
    n = 1 << bits
    ctes = [
        f"__h0 AS (SELECT {key_cols}, CAST({x_sql} AS BIGINT) AS hx0, "
        f"CAST({y_sql} AS BIGINT) AS hy0, CAST(0 AS BIGINT) AS hd0 FROM {source_sql})"
    ]
    for level in range(bits):
        k = bits - 1 - level
        s = 1 << k
        i, j = level, level + 1
        rx = f"((hx{i} >> {k}) & 1)"
        ry = f"((hy{i} >> {k}) & 1)"
        ctes.append(
            f"__h{j} AS (SELECT {key_cols}, "
            f"hd{i} + {s * s} * xor(3 * {rx}, {ry}) AS hd{j}, "
            f"CASE WHEN {ry} = 1 THEN hx{i} WHEN {rx} = 1 THEN {n - 1} - hy{i} "
            f"ELSE hy{i} END AS hx{j}, "
            f"CASE WHEN {ry} = 1 THEN hy{i} WHEN {rx} = 1 THEN {n - 1} - hx{i} "
            f"ELSE hx{i} END AS hy{j} "
            f"FROM __h{i})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {key_cols}, hd{bits} AS {out_col} FROM __h{bits}"
    )


def compaction_plan(
    manifest: DataFrame,
    bytes_col: str,
    partition_cols: list[str],
    order_cols: list[str],
    target_bytes: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Small-file compaction plan: assign each manifest entry (a file,
    or any byte-sized unit) to a target output file of roughly
    ``target_bytes``, greedily in a deterministic order — the metadata
    op behind "this table has 400k tiny files, rewrite it into
    128 MB ones" that every long-lived 100 TB table eventually needs
    (small files = per-file open/seek overhead + planner pressure).

    Packing rule: within each table partition, entries are taken in
    ``order_cols`` order and the running byte total BEFORE each entry,
    integer-divided by ``target_bytes``, is its target file id —
    one window pass, no driver loop. A boundary entry may overflow its
    target by less than its own size; exact bin packing is NP-hard and
    buys nothing for file sizing. Keys are per ``partition_cols``
    (compaction never merges across table partitions), which also
    keeps the window sort partition-local — no single-task global
    sort on the manifest.

    Output: the manifest's key columns + ``bytes_col`` + ``file_seq``
    (1-based position in packing order) + ``target_file`` (0-based
    within the partition).

    Determinism contract: the packing window's ordering keys —
    ``order_cols`` plus the optional ``tiebreak_col`` (use the file
    path) — must uniquely key rows within each partition; otherwise
    ``row_number``/running-sum tie order would vary run to run and the
    "same manifest → same plan" contract silently breaks. The plan
    ASSERTS this in-pass (an ordering-key tie raises, fail-loud house
    style) rather than documenting it away: the check is a ``lag``
    equality in the window sort the plan already pays for — no extra
    shuffle.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be > 0, got {target_bytes}")
    if not partition_cols:
        raise ValueError(
            "compaction_plan needs >= 1 partition column (a global "
            "manifest sort would single-task; partition by table "
            "partition, which is also the real compaction boundary)"
        )
    ordering = list(order_cols) + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(*partition_cols).orderBy(
        *[F.col(c).asc() for c in ordering]
    )
    before = F.coalesce(
        F.sum(F.col(bytes_col).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    # tie detector in the SAME window sort: a row whose full ordering
    # tuple equals its predecessor's proves the keys don't uniquely
    # order the partition → nondeterministic packing → raise.
    key = F.struct(*[F.col(c) for c in ordering])
    tied = F.lag(key).over(w).eqNullSafe(key)
    out_keys = list(order_cols) + (
        [tiebreak_col] if tiebreak_col else []
    )
    return manifest.select(
        *partition_cols,
        *out_keys,
        F.col(bytes_col).cast("long").alias(bytes_col),
        F.when(
            tied,
            F.raise_error(
                F.lit(
                    "compaction_plan: ordering keys "
                    f"{ordering} do not uniquely key rows within a "
                    "partition; pass tiebreak_col (e.g. the file path) "
                    "so the packing order is deterministic"
                )
            ).cast("long"),
        )
        .otherwise(F.row_number().over(w).cast("long"))
        .alias("file_seq"),
        before.alias("__before"),
    ).select(
        *partition_cols,
        *out_keys,
        bytes_col,
        "file_seq",
        F.expr(f"__before div {int(target_bytes)}")
        .cast("long")
        .alias("target_file"),
    )


def snapshot_file_stats(table, version: int | None = None) -> DataFrame:
    """Per-file stats of a SnapshotTable manifest (HEAD unless
    ``version`` pins one), in MANIFEST
    ORDER (= append order — the deterministic packing order compaction
    uses): ``(idx, path, bytes, rows)``. Row counts come from ONE
    grouped scan over the manifest's files (``input_file_name`` per
    row, no per-file driver jobs); byte sizes from file metadata.
    ``idx`` is zero-padded so its string sort equals the numeric
    manifest order.

    ``input_file_name`` returns a PERCENT-ENCODED ``file:`` URI, so
    the per-file counts are matched to the manifest driver-side (the
    group is manifest-sized metadata, same grain as the ``getsize``
    loop) after exact RFC percent-decoding — ``urllib.parse.unquote``,
    not Spark's ``url_decode``, which is form-decoding and would turn
    a literal ``+`` in a path into a space. A counted file that maps
    to no manifest path raises instead of silently skewing the
    ``unit='rows'`` bin packing to 0 (ADVICE r9 #2)."""
    import os
    from urllib.parse import unquote, urlparse

    spark = table.spark
    v = table.current_version() if version is None else version
    files = table._manifest(v)["files"]
    counts = (
        spark.read.parquet(*files)
        .groupBy(F.input_file_name().alias("uri"))
        .agg(F.count("*").cast("long").alias("rows"))
        .collect()  # bounded: one row per manifest file
    )
    by_path: dict[str, int] = {}
    manifest_paths = {os.path.realpath(p) for p in files}
    for r in counts:
        uri = r["uri"]
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            # ADVICE r10 #3: this engine resolves manifest paths on the
            # LOCAL filesystem (os.path.getsize below); a remote-store
            # URI can never match, so fail with the real reason instead
            # of the misleading unmatched-path error.
            raise ValueError(
                f"snapshot_file_stats: unsupported URI scheme "
                f"{parsed.scheme!r} from input_file_name ({uri!r}) — "
                f"file stats require a locally-resolvable store "
                f"(file: or bare paths)"
            )
        p = unquote(parsed.path) if parsed.scheme == "file" else uri
        p = os.path.realpath(p)
        if p not in manifest_paths:
            raise ValueError(
                f"snapshot_file_stats: counted file {uri!r} (decoded "
                f"{p!r}) matches no manifest path of version {v}"
            )
        by_path[p] = by_path.get(p, 0) + int(r["rows"])
    from ..functions.localrel import local_relation

    return local_relation(
        spark,
        [
            (
                f"{i:09d}",
                p,
                int(os.path.getsize(p)),
                by_path.get(os.path.realpath(p), 0),
            )
            for i, p in enumerate(files)
        ],
        "idx string, path string, bytes long, rows long",
    )


def compact_snapshot(
    table,
    target_units: int,
    unit: str = "bytes",
    message: str = "compact",
) -> tuple[DataFrame, dict]:
    """EXECUTE a compaction plan against a SnapshotTable's HEAD — the
    companion of :func:`compaction_plan`, which only emits the table.
    Files are packed in manifest (append) order by the same greedy
    running-sum rule (``unit`` = 'bytes' from file metadata, or 'rows'
    from one grouped scan); then each multi-file bin is REWRITTEN as
    one fresh file under a writer-unique ``data/snap-compact-*/`` dir while
    each single-file bin is REUSED — its original file is referenced
    unchanged, so untouched regions of the table are never rewritten
    (the ``store.compact`` proof pattern at snapshot grain). The new
    file list publishes as ONE atomic commit (``commit_files``), so
    readers see either the old layout or the new one, never a mix, and
    time travel across the compaction stays byte-exact (old manifests
    keep referencing the old files).

    Returns ``(plan, manifest)`` — the per-file plan DataFrame
    (path, file_seq, target_file) and the new version's manifest.

    Scale shape: planning is metadata-sized (the manifest, not the
    data) — the plan collect is bounded by the file count, the same
    grain every table format's compactor works at; rewriting reads
    ONLY the multi-file bins' bytes. Rewritten bins coalesce to one
    output file each — target_units IS the file-size knob, so a bin
    is one right-sized file by construction.
    """
    import os
    import shutil

    if unit not in ("bytes", "rows"):
        raise ValueError(f"unit must be 'bytes' or 'rows', got {unit!r}")
    spark = table.spark
    stats = snapshot_file_stats(table)
    # single constant "partition": a snapshot manifest is one logical
    # table, and the plan window runs over metadata (file count), not
    # data — the compaction_plan partition-locality rule is about data-
    # sized manifests.
    plan = compaction_plan(
        stats.select(
            F.lit("t").alias("__tbl"), "idx", "path", F.col(unit).alias("__u")
        ),
        bytes_col="__u",
        partition_cols=["__tbl"],
        order_cols=["idx"],
        target_bytes=target_units,
        tiebreak_col="path",
    )
    # rewrites must read with the RECORDED table schema: a bin mixing
    # files from before and after a widening append would otherwise
    # take one footer's schema and silently drop the evolved column
    import json as _json

    m = table._manifest(table.current_version())
    def _read_bin(paths: list[str]):
        if "columns" in m:
            # id-mapped read: a bin mixing files from before and after
            # a RENAME would otherwise NULL out the renamed column
            # under a flat recorded-schema read
            return table.read_files(paths)
        reader = spark.read
        if "schema" in m:
            from pyspark.sql.types import StructType

            reader = reader.schema(
                StructType.fromJson(_json.loads(m["schema"]))
            )
        return reader.parquet(*paths)

    rows = plan.collect()  # bounded: manifest-sized metadata
    bins: dict[int, list[tuple[str, str]]] = {}
    for r in rows:
        bins.setdefault(int(r["target_file"]), []).append(
            (r["idx"], r["path"])
        )
    # writer-unique staging dirs: a concurrent writer's landed-but-
    # unpublished files must never be clobbered by this compaction's
    # cleanup (the commit itself is serialized by commit_files — a
    # raced compaction gets a CommitConflict and its bins become
    # expire-swept orphans)
    from ..sources.snapshots import _token

    tok = _token()
    snap_dir = os.path.join(table.path, "data", f"snap-compact-{tok}")
    tmp_dir = os.path.join(table.path, "data", f".compact-tmp-{tok}")
    os.makedirs(snap_dir)
    new_files: list[str] = []
    for t in sorted(bins):
        paths = [p for _, p in sorted(bins[t])]
        if len(paths) == 1:
            new_files.append(paths[0])  # untouched bin: reuse in place
            continue
        out = os.path.join(tmp_dir, f"bin-{t}")
        _read_bin(paths).coalesce(1).write.mode("overwrite").parquet(out)
        [part] = [f for f in os.listdir(out) if f.endswith(".parquet")]
        dest = os.path.join(snap_dir, f"bin-{t}.parquet")
        os.replace(os.path.join(out, part), dest)
        new_files.append(dest)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    if not any(f.startswith(snap_dir) for f in new_files):
        shutil.rmtree(snap_dir, ignore_errors=True)  # nothing rewritten
    manifest = table.commit_files(
        new_files,
        message=f"{message}: {len(rows)} files -> {len(new_files)} "
        f"({unit} target {int(target_units)})",
    )
    return plan, manifest
