"""Non-iterative graph analytics: triangle counting / clustering.

Triangles are the canonical "curse of the last reducer" workload: a
naive wedge generation keyed on every node does quadratic work at the
hottest node, so one reducer runs for hours while the rest idle. The
operator behind this module (``operators/graph.py::triangle_counts``)
uses degree-ordered orientation (Suri & Vassilvitskii, WWW 2011) to
bound per-node wedge work by O(sqrt(m)) — the difference between a
plan that finishes on a 100 TB edge set and one that never does.

The declared query builds a part co-purchase graph from ``lineitem``
(parts that ship together in the same order — the classic
market-basket projection) and reports per-node triangle participation
plus the local clustering coefficient in integer basis points, so the
whole result is integer-exact and takes the full value-hash gate
against a DuckDB oracle that enumerates the same triangles with plain
3-way self-joins. The co-purchase pair explode is bounded by TPC-H
order size (<= 7 items per order, so <= 21 pairs); a real basket
pipeline with pathological baskets would cap or sample basket size
upstream, same as the LSH bucket cap in dedup_approx.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .registry import register


_COPURCHASE_TRI_SQL = """
    WITH op AS (SELECT DISTINCT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS pk
                FROM lineitem),
    e AS (SELECT DISTINCT x.pk AS a, y.pk AS b
          FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
            FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
            GROUP BY node),
    tri AS (SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    tn AS (SELECT node, CAST(count(*) AS BIGINT) AS tri_count
           FROM (SELECT n1 AS node FROM tri
                 UNION ALL SELECT n2 FROM tri
                 UNION ALL SELECT n3 FROM tri)
           GROUP BY node)
    SELECT d.node,
           CAST(COALESCE(t.tri_count, 0) AS BIGINT) AS tri_count,
           d.degree,
           CAST(CASE WHEN d.degree > 1
                     THEN (20000 * COALESCE(t.tri_count, 0))
                          // (d.degree * (d.degree - 1))
                END AS BIGINT) AS clustering_bp
    FROM deg d LEFT JOIN tn t ON t.node = d.node
"""


@register(
    "q_copurchase_triangles",
    sql=_COPURCHASE_TRI_SQL,
    doc="Triangle counts + local clustering coefficient over the part "
    "co-purchase graph (parts sharing an order in lineitem). Spark "
    "side runs the degree-ordered enumeration — wedges generated only "
    "at each edge's lower-(degree, id) endpoint, so no hot node does "
    "quadratic work — while the oracle enumerates the same triangle "
    "set with ordered 3-way self-joins (the triangle SET is "
    "orientation-invariant, so the perf strategy is hash-checked "
    "against the straightforward formulation). Clustering coefficient "
    "is integer basis points, 20000*tri div deg*(deg-1), NULL for "
    "degree-1 nodes in both engines (explicitly guarded CASE/when).",
    tags=("graph", "agg"),
)
def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").cast("long").alias("pk")
    ).distinct()
    pairs = op.select("ok", F.col("pk").alias("pk1")).join(
        op.select(F.col("ok").alias("ok2"), F.col("pk").alias("pk2")),
        F.col("ok") == F.col("ok2"),
    ).filter(F.col("pk1") < F.col("pk2"))
    return triangle_counts(pairs, src_col="pk1", dst_col="pk2")


_COPURCHASE_BF_SQL = """
    WITH op AS (SELECT DISTINCT l_orderkey AS l, CAST(l_partkey AS BIGINT) AS r
                FROM lineitem),
    w AS (SELECT a.r AS r, b.r AS r2, CAST(count(*) AS BIGINT) AS w
          FROM op a JOIN op b ON a.l = b.l AND a.r < b.r
          GROUP BY 1, 2),
    pb AS (SELECT r, r2, CAST((w * (w - 1)) // 2 AS BIGINT) AS bf
           FROM w WHERE w >= 2)
    SELECT node, CAST(sum(bf) AS BIGINT) AS butterflies
    FROM (SELECT r AS node, bf FROM pb
          UNION ALL SELECT r2 AS node, bf FROM pb)
    GROUP BY node
"""


@register(
    "q_copurchase_butterflies",
    sql=_COPURCHASE_BF_SQL,
    doc="Butterfly (2x2 biclique) counts per part over the BIPARTITE "
    "order-part graph — bipartite clustering measured directly on the "
    "two-mode edges, without materializing the one-mode co-purchase "
    "projection (whose edge set is what the triangle query pays for). "
    "A butterfly = two orders sharing two parts; per-pair counts w "
    "collapse to C(w,2) in pure integer arithmetic, so the whole "
    "result takes the value-hash gate. Wedge generation is the only "
    "quadratic step and is bounded by basket size (<= 7 in TPC-H); at "
    "scale wedges are generated from the sparser side and pathological "
    "hubs capped upstream (Sanei-Mehri et al., KDD 2018).",
    tags=("graph", "agg"),
)
def q_copurchase_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import butterfly_counts

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_orderkey").alias("l"), F.col("l_partkey").cast("long").alias("r")
    )
    return butterfly_counts(edges)


# ---------------------------------------------------------------------------
# BFS hop distance (frontier expansion)
# ---------------------------------------------------------------------------

_BFS_SEED_MAX = 3  # parts with pk < 3 seed the traversal
_BFS_HOPS = 3


def _bfs_sql(seed_max: int, hops: int) -> str:
    """Unrolled frontier-BFS oracle: candidates of the previous
    frontier, minus already-visited, at hops i. Post-exhaustion rounds
    are no-ops, so ``hops`` bounds both engines identically (the Spark
    loop runs the same fixed round count). MATERIALIZED throughout —
    the round chain references predecessors repeatedly and default CTE
    inlining is exponential (same fix as the BPE/k-core oracles).
    """
    ctes = [
        f"""op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,
                        CAST(l_partkey AS BIGINT) AS pk
                 FROM lineitem),
    e AS MATERIALIZED (SELECT DISTINCT x.pk AS a, y.pk AS b
         FROM op x JOIN op y ON x.ok = y.ok AND x.pk <> y.pk),
    d0 AS MATERIALIZED (SELECT DISTINCT pk AS node, CAST(0 AS BIGINT) AS hops
          FROM op WHERE pk < {seed_max}),
    f0 AS MATERIALIZED (SELECT node FROM d0)"""
    ]
    for i in range(1, hops + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
        SELECT DISTINCT e.b AS node FROM f{i - 1} f JOIN e ON e.a = f.node),
    n{i} AS MATERIALIZED (
        SELECT c.node, CAST({i} AS BIGINT) AS hops FROM c{i} c
        WHERE c.node NOT IN (SELECT node FROM d{i - 1})),
    d{i} AS MATERIALIZED (
        SELECT node, hops FROM d{i - 1} UNION ALL SELECT node, hops FROM n{i}),
    f{i} AS MATERIALIZED (SELECT node FROM n{i})"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, hops FROM d{hops}\n    "
    )


@register(
    "q_bfs_hops",
    sql=_bfs_sql(_BFS_SEED_MAX, _BFS_HOPS),
    doc=f"Frontier-expansion BFS: minimum hop distance (≤ {_BFS_HOPS}) "
    f"from the seed parts (pk < {_BFS_SEED_MAX}) over the co-purchase "
    "graph — the relational generalization of the reference's "
    "recursive keyword tree (scrappy.py:528-560) to arbitrary graphs. "
    "Each round joins only the NEW frontier against the edge list and "
    "anti-joins the visited set (operators/graph.py::bfs_hops, "
    "checkpointed-loop contract); the oracle unrolls the same fixed "
    "rounds with materialized CTEs.",
    tags=("graph", "iterative"),
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bfs_hops

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").cast("long").alias("pk"),
    ).distinct()
    edges = (
        op.select("ok", F.col("pk").alias("src"))
        .join(
            op.select(F.col("ok").alias("ok2"), F.col("pk").alias("dst")),
            F.col("ok") == F.col("ok2"),
        )
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    seeds = op.select(F.col("pk").alias("node")).filter(
        F.col("node") < _BFS_SEED_MAX
    ).distinct()
    return bfs_hops(edges, seeds, max_hops=_BFS_HOPS)
