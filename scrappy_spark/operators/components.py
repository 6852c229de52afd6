"""Connected components over candidate-pair edges — the dedup endgame.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (pairs
are transitive in practice: A≈B, B≈C ⇒ one keep among {A,B,C}). The
operator is iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors(label(u)))

repeated to fixpoint. Each round is one join + one aggregation — the
standard Spark shape for iterative graph algorithms (GraphFrames-free);
rounds = graph diameter, which for near-dup clusters is tiny (they are
dense cliques, typically 1–2 rounds). ``localCheckpoint`` truncates the
growing lineage each round; convergence is a driver-side count of
changed labels (one small action per round).

At 100 TB: edges are the output of LSH banding (already shuffle-
partitioned by key); each round shuffles |V|+|E| rows. For pathological
long chains switch to alternating small-star/large-star, which bounds
rounds by O(log d) — near-dup graphs never need it.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F


def checkpointed(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Truncate lineage for an iterative loop.

    ``checkpoint_dir=None`` → ``localCheckpoint`` (executor-local
    blocks: fast, right for local[*] and short-lived jobs, NOT fault-
    tolerant — losing an executor loses the data). With a dir →
    reliable ``checkpoint()`` to that path (HDFS/object store on a
    cluster), which survives executor loss; set it for long cluster
    runs."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    on_exhaust: str = "raise",
) -> DataFrame:
    """(id, component) — component = min node id reachable from id.

    ``nodes``: one column ``id_col`` (isolated nodes keep their own id).
    ``edges``: undirected pairs (each stored once; symmetrized here).

    Rounds = graph diameter. If ``max_iter`` is exhausted before the
    fixpoint, labels are PARTIAL (split clusters); that's a silent-
    corruption hazard for dedup, so the default is to raise — pass
    ``on_exhaust="warn"`` to accept partial labels (e.g. exploratory
    runs). Pathological long chains want the small-star/large-star
    variant (O(log d) rounds) rather than a bigger ``max_iter``.
    """
    if on_exhaust not in ("raise", "warn"):
        raise ValueError(f"on_exhaust must be 'raise' or 'warn', got {on_exhaust!r}")
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionAll(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    sym = checkpointed(sym.distinct(), checkpoint_dir)

    labels = nodes.select(F.col(id_col).alias("a"), F.col(id_col).alias("component"))
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("a", "b2"), sym.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
        )
        # The changed flag rides the same pass as the label update (old
        # label is already in hand), so convergence detection costs one
        # filter-count over the checkpointed result — not a second join
        # against the previous labels.
        new_labels = checkpointed(
            labels.join(neighbor_min, on="a", how="left").select(
                "a",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nmin"), F.col("component")) < F.col("component")).alias(
                    "_changed"
                ),
            ),
            checkpoint_dir,
        )
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — labels are partial and "
            "dedup clusters would be split; raise max_iter or use "
            "small-star/large-star for long-chain graphs"
        )
        if on_exhaust == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg)
    return labels.select(F.col("a").alias(id_col), "component")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, component, is_canonical): group docs by near-dup
    cluster; the minimum id per cluster is the canonical keeper —
    deterministic, matching the engine's keep-first convention."""
    nodes = docs.select(F.col(id_col).alias("id"))
    cc = connected_components(
        nodes, pairs, id_col="id", src_col=pair_a, dst_col=pair_b,
        checkpoint_dir=checkpoint_dir,
    )
    return cc.select(
        F.col("id").alias(id_col),
        "component",
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
