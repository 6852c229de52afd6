"""Z-order layout: prove the pruning property with parquet footer
stats, not just compute the Morton code — a point filter on the
SECOND dimension must be able to skip files in the z-ordered layout
while a single-column sort layout can skip none."""

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from scrappy_spark.operators.layout import z_value, zorder_write

N_FILES = 8


def _files_overlapping(path_glob: str, col: str, point: int) -> int:
    """Count files whose [min, max] stats for ``col`` contain ``point``
    — the files a stats-pruning reader must open."""
    n = 0
    for p in sorted(glob.glob(path_glob)):
        meta = pq.ParquetFile(p).metadata
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None and lo <= point <= hi:
            n += 1
    return n


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    # 64×64 grid: x-sort gives tight x ranges but full y ranges.
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
    )
    xsort = str(tmp_path / "xsort")
    (
        grid.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xsort)
    )
    zdir = str(tmp_path / "zorder")
    zorder_write(grid, zdir, cols=("x", "y"), bits=6, num_files=N_FILES)

    # Point filter on y: the x-sorted layout cannot skip anything;
    # the z-ordered layout must skip at least half the files.
    assert _files_overlapping(xsort + "/*.parquet", "y", 17) == N_FILES
    z_hits = _files_overlapping(zdir + "/*.parquet", "y", 17)
    assert z_hits <= N_FILES // 2, f"z-layout read {z_hits}/{N_FILES} files"
    # and x stays pruned too: a point filter on x skips files as well
    assert _files_overlapping(zdir + "/*.parquet", "x", 5) <= N_FILES // 2

    # layout preserved the data
    assert sorted(map(tuple, spark.read.parquet(zdir).collect())) == sorted(
        map(tuple, grid.collect())
    )


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], ["x", "y"])
    z = df.select(z_value(F.col("x"), F.col("y"), 3).alias("z")).first().z
    # even positions carry x bits (1,0,1), odd carry y bits (1,1,0):
    # z = x0 + 2·y0 + 4·x1 + 8·y1 + 16·x2 + 32·y2 = 1+2+0+8+16+0
    assert z == 0b011011


def test_range_partition_write_prunes_to_single_file(spark, tmp_path):
    """Range clustering on one key: a point filter overlaps exactly
    one file, a 10% range filter at most two — while the same data
    written unclustered overlaps every file. Round-trip preserved."""
    from scrappy_spark.operators.layout import range_partition_write

    df = spark.range(4096).select(
        (F.col("id") * 2654435761 % 4096).cast("int").alias("k"),  # scrambled
        F.col("id").alias("payload"),
    )
    plain = str(tmp_path / "plain")
    df.repartition(N_FILES).write.mode("overwrite").parquet(plain)
    ranged = str(tmp_path / "ranged")
    range_partition_write(df, ranged, col="k", num_files=N_FILES)

    assert _files_overlapping(plain + "/*.parquet", "k", 2000) == N_FILES
    assert _files_overlapping(ranged + "/*.parquet", "k", 2000) == 1
    # a 10% range overlaps at most 2 of the 8 range-files
    hits = sum(
        1
        for p in sorted(glob.glob(ranged + "/*.parquet"))
        if _files_overlapping(p, "k", 2000) or _files_overlapping(p, "k", 2400)
    )
    assert hits <= 2

    back = spark.read.parquet(ranged)
    assert back.count() == 4096
    assert back.agg(F.sum("payload")).first()[0] == 4096 * 4095 // 2


def test_hilbert_bijection_and_locality_beats_zorder(spark):
    """Hilbert index on a 16x16 grid: a bijection whose consecutive
    indices are ALWAYS grid-adjacent (Manhattan distance 1), vs
    Z-order's quadrant-seam jumps (up to 2^bits). This adjacency gap
    is exactly why a Hilbert-sorted write has tighter per-file
    min-max ranges than a Morton-sorted one."""
    from scrappy_spark.operators.layout import hilbert_attach, z_value

    n = 16
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    rows = hilbert_attach(grid, F.col("x"), F.col("y"), bits=4).withColumn(
        "z", z_value(F.col("x"), F.col("y"), bits=4)
    ).collect()
    by_h = {r["h"]: (r["x"], r["y"]) for r in rows}
    by_z = {r["z"]: (r["x"], r["y"]) for r in rows}
    assert len(by_h) == n * n  # bijection
    h_steps = [
        abs(by_h[d][0] - by_h[d + 1][0]) + abs(by_h[d][1] - by_h[d + 1][1])
        for d in range(n * n - 1)
    ]
    z_steps = [
        abs(by_z[d][0] - by_z[d + 1][0]) + abs(by_z[d][1] - by_z[d + 1][1])
        for d in range(n * n - 1)
    ]
    assert max(h_steps) == 1
    assert max(z_steps) > 1  # Z-order jumps at quadrant seams


def test_hilbert_rejects_bad_bits(spark):
    import pytest as _pytest

    from scrappy_spark.operators.layout import hilbert_attach

    df = spark.range(1).select(F.col("id").alias("x"), F.col("id").alias("y"))
    with _pytest.raises(ValueError, match="bits"):
        hilbert_attach(df, F.col("x"), F.col("y"), bits=0)
