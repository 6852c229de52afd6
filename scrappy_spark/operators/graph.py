"""Graph algorithms beyond connected components: PageRank (iterative)
and motif counting (triangles, bipartite butterflies — single-pass
compositions with no iteration).

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
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # Co-partition the (edge, out-degree) join once; every iteration
    # reuses this frame so only the rank side moves per round.
    weighted = e.join(out_w, "src").localCheckpoint(eager=True)
    # Derive the node set from the MATERIALIZED edge frame, not from
    # ``e``: nodes is consumed every round (the dangling left join) plus
    # the init, and building it on ``e`` re-ran the whole upstream edge
    # pipeline (link extraction + URL normalization in the web capstone)
    # once per round. The inner join keeps every edge, so the node set
    # is identical; its own checkpoint makes each round read a tiny
    # cached table instead of re-shuffling the union+distinct.
    nodes = (
        weighted.select(F.col("src").alias("node"))
        .union(weighted.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )

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


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient.

    Degree-ordered triangle enumeration (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW 2011):
    orient every undirected edge from its lower-(degree, id) endpoint
    to its higher one, generate wedges only at each edge's LOWER
    endpoint, and close them against the oriented edge set. The
    orientation bounds every node's out-degree by O(sqrt(m)), so wedge
    generation is O(m^1.5) total and — the 100 TB point — a celebrity
    node with 10^8 neighbors generates NO wedges at its own key: its
    edges all point toward it, and the quadratic work lands on the
    low-degree endpoints instead of one hot reducer. Three shuffles
    total (degree agg, wedge self-join on apex, closing join on the
    wedge pair); no broadcast assumptions, so it scales to edge sets
    far beyond driver memory.

    Returns (node, tri_count, degree, clustering_bp) for every node of
    the undirected graph: ``tri_count`` triangles through the node,
    ``clustering_bp`` the local clustering coefficient in integer basis
    points — ``(20000 * tri) div (deg * (deg - 1))`` — which is
    integer-exact and therefore bit-identical cross-engine. NULL for
    degree-1 nodes, where the coefficient is undefined; the zero
    divisor is guarded with an explicit ``when`` so the result is the
    same under ANSI and non-ANSI sessions.

    Parallel edges, self-loops, and direction are normalized away:
    input edges are canonicalized to distinct undirected (a < b) pairs
    first, so any (src, dst) multiset is a valid input.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    # Orient by the total order (degree, node id); carry the HEAD's
    # order key so wedge pairs can be oriented by the same total order
    # without re-joining degrees.
    ed = (
        e.join(
            deg.select(F.col("node").alias("a"), F.col("degree").alias("deg_a")), "a"
        )
        .join(deg.select(F.col("node").alias("b"), F.col("degree").alias("deg_b")), "b")
    )
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("v_deg"),
    )
    # Wedges at the apex u: every head pair, oriented by (v_deg, v) so
    # the closing edge is looked up in its oriented direction only.
    # The self-join's right side is renamed up front — distinct
    # attribute names, never the trivially-true same-attribute
    # predicate that dataset-id disambiguation would have to rescue.
    o2 = oriented.select(
        F.col("u").alias("u2"),
        F.col("v").alias("v2"),
        F.col("v_deg").alias("v_deg2"),
    )
    wedges = oriented.join(o2, F.col("u") == F.col("u2")).where(
        (F.col("v_deg") < F.col("v_deg2"))
        | ((F.col("v_deg") == F.col("v_deg2")) & (F.col("v") < F.col("v2")))
    ).select(
        F.col("u").alias("apex"),
        F.col("v").alias("x"),
        F.col("v2").alias("y"),
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closing, ["x", "y"])
    per_node = (
        tri.select(F.explode(F.array("apex", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("tri_count"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("tri_count"), F.lit(0)).cast("long").alias("tri_count"),
            F.col("degree").cast("long").alias("degree"),
            # NULL for degree-1 nodes (coefficient undefined). Guarded
            # with `when` rather than div-by-zero-is-NULL semantics so
            # the result is identical under ANSI and non-ANSI sessions.
            F.when(
                F.col("degree") > 1,
                F.expr(
                    "20000 * coalesce(tri_count, 0L) div (degree * (degree - 1))"
                ),
            ).alias("clustering_bp"),
        )
    )


def butterfly_counts(
    edges: DataFrame, left_col: str = "l", right_col: str = "r"
) -> DataFrame:
    """Per-RIGHT-vertex butterfly (2x2 biclique) counts in a bipartite
    graph — the bipartite analog of triangle counting (Sanei-Mehri,
    Sariyuce & Tirthapura, "Butterfly Counting in Bipartite Networks",
    KDD 2018). A butterfly is two left vertices sharing two right
    vertices: the smallest unit of bipartite clustering, counted
    WITHOUT materializing the quadratic one-mode projection graph.

    Shape: explode each LEFT vertex's right-neighbor pairs (wedges),
    count wedges per right pair w(r1, r2), then butterflies per pair
    are C(w, 2). Wedge generation is quadratic in LEFT degree, so at
    scale the caller orients wedge generation from the SPARSER side
    (swap the columns) and caps pathological hubs upstream — the same
    bounded-basket argument as the co-purchase pair explode. One
    wedge-pair groupBy plus one explode-groupBy; no joins at all.

    Returns (node, butterflies) for right-side vertices with at least
    ONE butterfly (butterflies >= 1). Absent vertices have zero — that
    includes vertices whose every shared pair has w = 1 (wedge
    participants with no closing second left vertex); left-join the
    result against the vertex set and coalesce to 0 for a dense count.
    """
    e = edges.select(
        F.col(left_col).alias("l"), F.col(right_col).alias("r")
    ).distinct()
    # wedges at each left vertex: ordered right-neighbor pairs
    e2 = e.select(F.col("l").alias("l2"), F.col("r").alias("r2"))
    wedges = (
        e.join(e2, F.col("l") == F.col("l2"))
        .filter(F.col("r") < F.col("r2"))
        .groupBy("r", "r2")
        .agg(F.count("*").alias("w"))
    )
    pair_bf = wedges.select(
        "r", "r2", F.expr("w * (w - 1) div 2").alias("bf")
    ).filter(F.col("bf") > 0)
    return (
        pair_bf.select(F.explode(F.array("r", "r2")).alias("node"), "bf")
        .groupBy("node")
        .agg(F.sum("bf").cast("long").alias("butterflies"))
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
    max_iter: int = 100,
    assert_depth_le: int | None = None,
) -> DataFrame:
    """k-core decomposition membership: the maximal subgraph in which
    every node has degree ≥ ``k``, found by iterative peeling (remove
    all nodes with degree < k, recompute, repeat to fixpoint — Matula &
    Beck's algorithm, the standard bulk-synchronous formulation).

    Returns ``(node, core_degree)`` for the surviving nodes —
    ``core_degree`` is the degree WITHIN the core (≥ k by definition).

    Scale shape: edges are canonicalized to distinct undirected pairs
    once; each round is one degree aggregation (partial-agg, node-key
    shuffle of ≤ |V| rows) + two broadcast-anti joins against the
    (small, shrinking) removal set, with lineage cut per round — the
    same checkpointed-loop contract as :func:`pagerank` and
    components. Convergence needs one driver-side count of the removal
    set per round (bounded metadata, never edge data); rounds are
    O(peeling depth), typically ≤ 10 on real graphs — degenerate
    chains can need more, hence ``max_iter`` as a guard that raises
    rather than silently returning a non-core.

    ``assert_depth_le``: optional declared peel-depth bound (e.g. an
    unrolled SQL oracle's round count). If actual peeling needs more
    rounds, raise an explicit error instead of letting the oracle
    silently stop pre-fixpoint and surface as a bare hash mismatch.
    """
    a, b = F.least(F.col(src_col), F.col(dst_col)), F.greatest(
        F.col(src_col), F.col(dst_col)
    )
    e = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if checkpoint_dir is not None:
        e.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        e = e.checkpoint(eager=True)
    else:
        e = e.localCheckpoint(eager=True)

    def deg(frame: DataFrame) -> DataFrame:
        return (
            frame.select(F.col("a").alias("node"))
            .unionAll(frame.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").cast("long").alias("core_degree"))
        )

    for rounds_done in range(max_iter):
        # Materialize the round's degree frame ONCE: isEmpty(), both
        # left_anti joins, and the successful-exit return all read the
        # same ≤|V|-row checkpoint instead of re-running the aggregation
        # (it would otherwise be recomputed up to 4× per round).
        d = (
            deg(e).checkpoint(eager=True)
            if checkpoint_dir is not None
            else deg(e).localCheckpoint(eager=True)
        )
        bad = d.filter(F.col("core_degree") < k).select("node")
        if bad.isEmpty():
            return d
        if assert_depth_le is not None and rounds_done + 1 > assert_depth_le:
            raise RuntimeError(
                f"kcore peel depth exceeded the declared bound "
                f"{assert_depth_le} (an unrolled oracle with that many "
                f"rounds would silently stop pre-fixpoint) — raise the "
                f"oracle's round count"
            )
        e = (
            e.join(bad.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(bad.withColumnRenamed("node", "b"), "b", "left_anti")
        )
        e = (
            e.checkpoint(eager=True)
            if checkpoint_dir is not None
            else e.localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"kcore did not converge within {max_iter} peeling rounds"
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Minimum-hop distance from a seed set over an undirected graph,
    bounded by ``max_hops`` — frontier-expansion BFS, the relational
    form of the reference's recursive keyword tree (scrappy.py:528-560)
    generalized to arbitrary graphs.

    Returns ``(node, hops)`` for every node within ``max_hops`` of any
    seed (seeds themselves at 0). Frontier-delta formulation: each
    round joins only the NEWLY discovered nodes against the edge list
    (not the whole visited set), anti-joins out already-visited nodes,
    and cuts lineage — per-round shuffle is O(frontier ∂ edges), the
    textbook BSP shape that survives a 100 TB edge list because the
    visited set is touched only by the (node-keyed, broadcast-able
    when small) anti-join. The loop runs a FIXED ``max_hops`` rounds
    (early-exit when a frontier empties), so an unrolled SQL oracle is
    exact: post-exhaustion rounds are no-ops.
    """
    fwd = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    e = (
        fwd.unionAll(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if checkpoint_dir is not None:
        e.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        e = e.checkpoint(eager=True)
    else:
        e = e.localCheckpoint(eager=True)
    seeds = sources.select(F.col(node_col).alias("node")).distinct()
    dist = seeds.select("node", F.lit(0).cast("long").alias("hops"))
    frontier = seeds
    for i in range(1, max_hops + 1):
        cand = (
            frontier.join(e, frontier["node"] == e["a"])
            .select(F.col("b").alias("node"))
            .distinct()
        )
        new = cand.join(dist.select("node"), "node", "left_anti").select(
            "node", F.lit(i).cast("long").alias("hops")
        )
        if new.isEmpty():
            break
        dist = dist.unionAll(new)
        dist = (
            dist.checkpoint(eager=True)
            if checkpoint_dir is not None
            else dist.localCheckpoint(eager=True)
        )
        frontier = new.select("node")
    return dist
