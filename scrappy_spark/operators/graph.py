"""Iterative graph algorithms beyond connected components.

``pagerank`` ranks nodes of a weighted directed graph by power
iteration — the standard importance measure for link graphs (domain
authority for crawl prioritization, page importance in clickstreams).
The reference's only graph structure is its keyword tree
(`/root/reference/scrappy.py:528-560`, a BFS frontier this repo covers
in ``tree.py``); PageRank extends the family to cyclic graphs.

INTEGER-EXACT formulation: ranks are bigint "rank units" (initially
``unit`` per node) and every update is integer arithmetic —

    rank' = (15 * unit) div 100
          + (85 * sum_incoming(rank_src * w div out_w_src)) div 100

Integer sums are associative, so the result is bit-identical across
shuffle orders AND across engines: a DuckDB oracle unrolling the same
iterations hash-matches exactly, which no floating-point PageRank can
guarantee. The cost is truncation: each division drops < 1 unit, so
with the default 1e12 units the relative error after k iterations is
~k·deg/1e12 — negligible, and deterministic.

Per iteration: one join (edges ⋈ ranks, shuffle on src — co-partition
edges by src once, reuse every round) + one groupBy dst. Lineage is cut
every round with localCheckpoint (or a reliable ``checkpoint_dir`` on
a cluster, same contract as operators/components.py).

Overflow guard: rank_src * w must stay under 2^63 — with unit=1e12 and
total mass N·unit, safe while max_weight · N · 1e12 < 9.2e18; pass a
smaller ``unit`` for graphs with billions of nodes or huge weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    unit: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weighted PageRank over (src, dst[, weight]) edges.

    Returns (node, rank_units, rank) — ``rank_units`` the exact bigint
    mass, ``rank`` the human-readable double (one division at the end).
    Dangling nodes keep the teleport base; their mass is dropped, not
    redistributed (the standard simplification — documented, exact,
    and identical in the oracle).
    """
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # Co-partition the (edge, out-degree) join once; every iteration
    # reuses this frame so only the rank side moves per round.
    weighted = e.join(out_w, "src").localCheckpoint(eager=True)

    base = (15 * unit) // 100
    ranks = nodes.select("node", F.lit(unit).cast("long").alias("rank_units"))
    for _ in range(n_iter):
        contribs = (
            weighted.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_units * w div out_w").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"{damping_pct} * coalesce(in_mass, 0L) div 100")
            ).alias("rank_units"),
        )
        # EAGER on purpose: this loop has no per-round action, and
        # RDD.doCheckpoint only honors the FIRST marked ancestor it
        # meets (checkpointAllMarkedAncestors defaults to false) — with
        # lazy marks only the last round would ever checkpoint, leaving
        # intermediate lineage uncut and reliable checkpoints unwritten.
        # The loops in components.py can be lazy precisely because each
        # round's convergence action materializes its own checkpoint.
        ranks = (
            ranks.checkpoint(eager=True)
            if checkpoint_dir is not None
            else ranks.localCheckpoint(eager=True)
        )
    return ranks.select(
        "node",
        "rank_units",
        (F.col("rank_units").cast("double") / unit).alias("rank"),
    )
