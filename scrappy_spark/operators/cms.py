"""Count-min sketch: fixed-size frequency estimation with partial-agg
build and broadcast probe — the heavy-hitter / frequency-cap primitive
at corpus scale.

Where the Bloom filter (``operators/bloom.py``) answers "is this key
in the set", the CMS answers "about how often does this key occur"
in a d×w integer grid (d hash rows, w counters each) that never grows
with the corpus. Guarantees: the estimate NEVER undercounts
(min-of-d-counters ≥ true count), and overcounts by more than
ε·N = (e/w)·N with probability < e^(−d). Frequency capping, repeated-
content throttling, and hot-key detection all tolerate overcounts but
not undercounts — the safe direction, like Bloom's no-false-negatives.

Build: explode d (row, position) cells per occurrence → ONE
groupBy(row, pos) sum — map-side combined, mergeable (cell-wise sum
of two sketches IS the sketch of the union; tested), ≤ d·w output
rows regardless of input size. Probe: broadcast the grid, take the
min over d cells per key. Everything is md5-derived integer
arithmetic, so the grid — and every estimate — reproduces
bit-for-bit in the DuckDB oracle: a DETERMINISTIC approximation,
checkable by value hash where HLL/KLL estimates are engine-specific.

Reference parity: the reference counts term frequencies exactly in
driver memory (scrappy.py:300-318, Counter over all articles); this
is the fixed-memory corpus-scale answer to the same question.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: default geometry: 4 rows × 1024 counters. ε = e/1024 ≈ 0.27% of the
#: total stream count per estimate, error probability e⁻⁴ ≈ 1.8%.
CMS_DEPTH = 4
CMS_WIDTH = 1 << 10


def cms_positions(key: Column, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> Column:
    """``array<long>`` of the per-row counter positions for ``key`` —
    same Kirsch–Mitzenmacher double hashing as the Bloom filter (one
    md5, h2 forced odd ⇒ coprime with the power-of-two width)."""
    if width & (width - 1):
        raise ValueError(f"width must be a power of two, got {width}")
    digest = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long").bitwiseOR(F.lit(1))
    return F.array(*[((h1 + F.lit(r) * h2) % F.lit(width)) for r in range(depth)])


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Aggregate key occurrences (or ``weight_col`` sums) into the CMS
    grid: ``(row, pos, cnt)``, ≤ depth·width rows, all non-zero."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = df.select(
        w.alias("__w"),
        F.posexplode(cms_positions(F.col(key_col), depth, width)).alias("row", "pos"),
    )
    return cells.groupBy("row", "pos").agg(F.sum("__w").alias("cnt"))


def cms_estimate(
    keys: DataFrame,
    grid: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    out_col: str = "cms_est",
) -> DataFrame:
    """Estimate each distinct key's frequency: min over its d cells.

    The grid broadcasts (≤ d·w rows by construction); a missing cell
    means zero occurrences hashed there, so the estimate — and the
    never-undercount guarantee — is preserved via coalesce(cnt, 0).
    """
    probes = keys.select(F.col(key_col)).distinct().select(
        key_col,
        F.posexplode(cms_positions(F.col(key_col), depth, width)).alias("row", "pos"),
    )
    return (
        probes.join(F.broadcast(grid), ["row", "pos"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )
