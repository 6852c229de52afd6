"""Connected components over candidate-pair edges — the dedup endgame.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (pairs
are transitive in practice: A≈B, B≈C ⇒ one keep among {A,B,C}). The
operator is iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors(label(u)))

with path compression each round (component ← label(component), one
extra self-join), so rounds are bounded by O(log diameter) rather than
diameter — shingle-chained near-dup graphs are NOT all dense cliques;
sf0.1 already produces chains that take ~9 plain-propagation rounds vs
~4 compressed. ``localCheckpoint`` truncates the growing lineage each
round; convergence is a driver-side count of changed labels (one small
action per round).

At 100 TB: edges are the output of LSH banding (already shuffle-
partitioned by key); the label loop runs over edge-PARTICIPATING nodes
only (isolated docs — the vast majority of a corpus — never enter a
round), so each round shuffles O(|E|) rows, not the corpus.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F


def checkpointed(df: DataFrame, checkpoint_dir: str | None, eager: bool = True) -> DataFrame:
    """Truncate lineage for an iterative loop.

    ``checkpoint_dir=None`` → ``localCheckpoint`` (executor-local
    blocks: fast, right for local[*] and short-lived jobs, NOT fault-
    tolerant — losing an executor loses the data). With a dir →
    reliable ``checkpoint()`` to that path (HDFS/object store on a
    cluster), which survives executor loss; set it for long cluster
    runs.

    ``eager=False`` defers materialization to the caller's next action
    on the returned frame — an iterative loop that follows each
    checkpoint with a convergence-check action should use this so each
    round runs ONE Spark job, not two (materialize + check).

    Caveat for the reliable path: ``checkpoint(eager=False)`` only
    materializes when an action's lineage traversal REACHES the marked
    frame, and traversal stops at the first marked ancestor — so a lazy
    reliable checkpoint shadowed by a nearer checkpointed descendant is
    never written and its frame is recomputed from source every reuse.
    Frames checkpointed OUTSIDE the per-round action must therefore
    pass ``eager=(checkpoint_dir is not None)``; ``localCheckpoint`` is
    immune because it persists as a side effect of whichever job first
    computes the frame, marked-ancestor hierarchy or not."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    current = sc._jsc.sc().getCheckpointDir()
    if current.isEmpty():
        sc.setCheckpointDir(checkpoint_dir)
    elif checkpoint_dir.rstrip("/") not in current.get():
        # getCheckpointDir returns the configured path plus a random
        # UUID subdir, so membership (not equality) is the right test.
        # The context's checkpoint dir is global and already set to a
        # DIFFERENT path — Spark offers no per-frame override, so the
        # requested dir would be silently ignored. Fault-tolerance
        # expectations differ between paths; make that visible.
        warnings.warn(
            f"checkpoint_dir={checkpoint_dir!r} requested but the SparkContext "
            f"checkpoint dir is already {current.get()!r}; checkpoints will use "
            "the existing dir (set it before the first checkpointed operator)"
        )
    return df.checkpoint(eager=eager)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    on_exhaust: str = "raise",
    method: str = "label",
    steps_per_round: int = 2,
) -> DataFrame:
    """(id, component) — component = min node id reachable from id.

    ``nodes``: one column ``id_col`` (isolated nodes keep their own id).
    ``edges``: undirected pairs (each stored once; symmetrized here).

    ``method="label"`` (default): min-label propagation with path
    compression — rounds ≈ O(log diameter) in practice; each round
    fuses ``steps_per_round`` propagate+compress steps into one
    checkpointed job (so ``max_iter`` rounds cover
    steps_per_round·max_iter steps). ``steps_per_round`` trades the
    fixed per-round machinery (checkpoint materialization, the
    convergence-count action, driver scheduling) against plan blowup:
    each step's pointer-jump self-join references its input TWICE, so
    an unmaterialized fused round evaluates the label subtree
    ~2^steps_per_round times. Measured at sf0.1 (identical bit_xor
    label checksums): 2 steps/round beat both 1 (8 checkpoint rounds)
    and 4 (the 16× subtree blowup costs more than the 2 saved rounds
    — 22-25 s vs 6.8-11.7 s warm) — hence the default 2.
    The right default for the clique-ish graphs LSH banding produces.
    ``method="star"``: alternating small-star /
    large-star (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — contracts the EDGE set itself toward stars centered on
    component minima, provably converging in O(log² n) rounds worst
    case and ~log₂(diameter) in practice on paths; prefer it for
    adversarial long-chain graphs (shingle chains, citation chains)
    where label propagation's per-round win is only a constant factor.

    If ``max_iter`` is exhausted before the fixpoint, labels are
    PARTIAL (split clusters); that's a silent-corruption hazard for
    dedup, so the default is to raise — pass ``on_exhaust="warn"`` to
    accept partial labels (e.g. exploratory runs).
    """
    if on_exhaust not in ("raise", "warn"):
        raise ValueError(f"on_exhaust must be 'raise' or 'warn', got {on_exhaust!r}")
    if method not in ("label", "star"):
        raise ValueError(f"method must be 'label' or 'star', got {method!r}")
    if steps_per_round < 1:
        raise ValueError(f"steps_per_round must be >= 1, got {steps_per_round}")
    if method == "star":
        return _connected_components_star(
            nodes, edges, id_col, src_col, dst_col, max_iter, checkpoint_dir, on_exhaust
        )
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionAll(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    # sym is reused by every round's join but is NOT the target of the
    # per-round action — each round checkpoints new_labels, and reliable
    # doCheckpoint stops there, never reaching sym. Materialize eagerly
    # on the reliable path; localCheckpoint persists lazily at first
    # compute regardless, so stay lazy there (one job in round 0).
    sym = checkpointed(sym.distinct(), checkpoint_dir, eager=checkpoint_dir is not None)

    # Only nodes touched by an edge can ever change label; everything
    # else keeps its own id with no iteration. Restricting the loop to
    # edge participants keeps each round's shuffle proportional to the
    # candidate-pair graph (tiny vs the corpus at web scale) instead of
    # re-shuffling every document's label per round.
    all_nodes = nodes.select(F.col(id_col).alias("a"))
    participants = sym.select("a").distinct()
    labels = all_nodes.join(participants, "a", "left_semi").select(
        "a", F.col("a").alias("component")
    )
    def _prop_compress(lbl: DataFrame) -> DataFrame:
        """One propagate+compress step: component ← min over {self,
        neighbors}, then one pointer jump (component ← label(component)
        — plain neighbor-min propagation needs diameter rounds; the
        extra self-join halves the remaining distance every step,
        bounding steps by O(log d)). Returns (a, component, _old) with
        _old = the INPUT label, so the caller can detect a no-op step.

        Propagation is ONE union+aggregate — min over the self rows
        unioned with the neighbor-label stream — instead of the
        groupBy-neighbor-min + left-join-back form: same value per
        node by definition (every participant has exactly one self
        row, so the min covers {self} ∪ neighbors and the left join's
        null-neighbor coalesce is subsumed), one fewer join per step
        and one fewer evaluation of the label subtree. ``_old`` rides
        the same aggregate (max over the tagged self rows = the
        single input label). A/B at sf0.1 (r14): identical bit_xor
        label checksums, loop wall 5.1-8.5 → 4.2-5.2 s."""
        contrib = (
            sym.join(lbl.withColumnRenamed("a", "b2"), sym.b == F.col("b2"))
            .select("a", "component")
            .withColumn("__self", F.lit(False))
        )
        cand = (
            lbl.withColumn("__self", F.lit(True))
            .unionByName(contrib)
            .groupBy("a")
            .agg(
                F.min("component").alias("component"),
                F.max(F.when(F.col("__self"), F.col("component"))).alias("_old"),
            )
        )
        parent = cand.select(
            F.col("a").alias("_p"), F.col("component").alias("_pc")
        )
        return cand.join(parent, cand.component == parent._p, "left").select(
            "a",
            F.least(
                F.col("component"), F.coalesce(F.col("_pc"), F.col("component"))
            ).alias("component"),
            "_old",
        )

    changed = 0
    for _ in range(max_iter):
        # ``steps_per_round`` propagate+compress steps per checkpointed
        # round: the round's wall cost at corpus scale is dominated by
        # the fixed per-round machinery (checkpoint materialization +
        # the convergence-count job + driver scheduling), not the
        # per-step shuffles, so fusing steps into ONE lazily-evaluated
        # job divides that overhead while leaving shuffle volume per
        # step unchanged. Convergence is judged on the LAST step alone
        # (component < its input label): a full propagate+compress step
        # that changes nothing IS the fixpoint, regardless of what the
        # earlier steps did — measured at sf0.1: 8 → 4 rounds at two
        # steps/round, 4 → 2 at four, identical labels (bit_xor
        # checksum A/B each time).
        step = _prop_compress(labels)
        for _extra in range(steps_per_round - 1):
            step = _prop_compress(step.select("a", "component"))
        step2 = step
        # The changed flag rides the same pass as the label update (the
        # step-2 input label is already in hand), so convergence
        # detection costs one filter-count over the checkpointed result
        # — not a second join against the previous labels. The
        # checkpoint is LAZY: the convergence count is the
        # materializing action, so each round runs one Spark job.
        new_labels = checkpointed(
            step2.select(
                "a",
                "component",
                (F.col("component") < F.col("_old")).alias("_changed"),
            ),
            checkpoint_dir,
            eager=False,
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
    isolated = all_nodes.join(participants, "a", "left_anti").select(
        "a", F.col("a").alias("component")
    )
    return labels.unionAll(isolated).select(F.col("a").alias(id_col), "component")


def _connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    src_col: str,
    dst_col: str,
    max_iter: int,
    checkpoint_dir: str | None,
    on_exhaust: str,
) -> DataFrame:
    """Alternating small-star/large-star (Kiveris et al. 2014).

    Each round rewrites the edge set:

    - large-star(u): every neighbor v > u is re-linked to
      m = min(Γ(u) ∪ {u});
    - small-star(u): u and every smaller neighbor are re-linked to
      m = min(Γ⁻(u) ∪ {u}).

    At the fixpoint the edge set is a union of stars whose centers are
    the component minima, so labels fall out of one groupBy. Per round:
    two self-groupBys + a distinct — edge-set-proportional shuffles,
    same O(|E|) bound as label propagation, but the edge set SHRINKS
    toward 1 edge per non-root node, so late rounds are cheaper.
    Convergence is detected by an (edge-count, order-insensitive
    checksum) pair going stable — one small agg action per round, no
    exceptAll self-join.
    """
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionAll(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    # canonical undirected form (a < b), no self-loops; lazy — the
    # initial fingerprint is the materializing action
    e = checkpointed(
        sym.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct(),
        checkpoint_dir,
        eager=False,
    )
    all_nodes = nodes.select(F.col(id_col).alias("a"))
    participants = checkpointed(
        sym.filter(F.col("a") != F.col("b")).select("a").distinct(),
        checkpoint_dir,
        eager=False,
    )

    def _fingerprint(frame: DataFrame):
        row = frame.agg(
            F.count("*").alias("n"),
            # bit_xor: order-insensitive and overflow-free under ANSI
            # (a summed hash overflows long); the edge set is distinct
            # so no pair self-cancels.
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).first()
        return (row["n"], row["h"])

    def _large_star(frame: DataFrame) -> DataFrame:
        s = frame.unionAll(frame.select(F.col("b").alias("a"), F.col("a").alias("b")))
        m = s.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        # (v, m(u)) for every neighbor v > u; v > u ≥ m so no self-loops
        return (
            s.filter(F.col("b") > F.col("a"))
            .join(m, "a")
            .select(F.col("m").alias("a"), F.col("b").alias("b"))
            .distinct()
        )

    def _small_star(frame: DataFrame) -> DataFrame:
        s = frame.unionAll(frame.select(F.col("b").alias("a"), F.col("a").alias("b")))
        smaller = s.filter(F.col("b") < F.col("a"))  # node a, smaller neighbor b
        m = smaller.groupBy("a").agg(F.min("b").alias("m"))
        relink = (  # (v, m(u)) for smaller neighbors v ≠ m
            smaller.join(m, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("m").alias("a"), F.col("b"))
        )
        self_link = m.select(F.col("m").alias("a"), F.col("a").alias("b"))  # (u, m(u))
        return relink.unionAll(self_link).distinct()

    fp = _fingerprint(e)
    converged = False
    for _ in range(max_iter):
        # lazy checkpoint: the fingerprint agg is the materializing
        # action → one job per round
        e = checkpointed(_small_star(_large_star(e)), checkpoint_dir, eager=False)
        nfp = _fingerprint(e)
        if nfp == fp:
            converged = True
            break
        fp = nfp
    if not converged:
        msg = (
            f"small-star/large-star did not converge in {max_iter} rounds — "
            "labels would be partial and dedup clusters split; raise max_iter"
        )
        if on_exhaust == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg)
    # Stars: every edge is (root, child) with root = component min, so
    # label(child) = its (unique) smaller endpoint, label(root) = root.
    s = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        participants.join(s, "a", "left")
        .groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("component"))
    )
    isolated = all_nodes.join(participants, "a", "left_anti").select(
        "a", F.col("a").alias("component")
    )
    return labels.unionAll(isolated).select(F.col("a").alias(id_col), "component")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    checkpoint_dir: str | None = None,
    method: str = "label",
) -> DataFrame:
    """(doc_id, component, is_canonical): group docs by near-dup
    cluster; the minimum id per cluster is the canonical keeper —
    deterministic, matching the engine's keep-first convention.
    ``method`` passes through to ``connected_components`` ("label"
    default; "star" for adversarial long-chain pair graphs)."""
    nodes = docs.select(F.col(id_col).alias("id"))
    cc = connected_components(
        nodes, pairs, id_col="id", src_col=pair_a, dst_col=pair_b,
        checkpoint_dir=checkpoint_dir, method=method,
    )
    return cc.select(
        F.col("id").alias(id_col),
        "component",
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
