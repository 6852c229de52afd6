"""Banded-flag audits that put approximate-similarity operators under
the full value-hash gate.

The promotion pattern (proven on ``q_approx_count_distinct``,
``q_kll_quantiles`` and the round-6 ``taxonomy_audit``): an operator
whose raw output is approximate or model-derived — and therefore not
SQL-expressible — is declared through an AUDIT query that emits

1. **exact anchor columns** a DuckDB oracle recomputes independently
   (query ids, truth-pair counts, input counts), and
2. **integer flags** stating invariants of the approximate path
   (self-retrieval, no-false-positives, recall ≥ a pinned band) that
   the oracle fixes to literal ``1``.

If the approximate operator regresses — misses its own query vector,
emits a pair below threshold, or loses recall — a flag flips to 0 and
the driver's hash gate fails. The raw top-k / pair outputs stay
available as operators and stay pinned in pytest (recall curves,
subset relations); the audit is what the driver hashes.

Bands are set from measured recall at sf0.01 AND sf0.001 with ≥ 2×
margin (measured values recorded per call site). All comparison work
is bounded: the exact sides reuse the same brute-force operators the
test suite uses, sized for the driver fixture (500 vectors); at
production scale the audits run on a sampled slice, never the full
corpus.

Reference parity: the reference has no ANN at all (its similarity
surface is pandas substring filters, scrappy.py:214-260); this family
is part of the LLM-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import cosine


def topk_recall_audit(
    ann: DataFrame,
    exact: DataFrame,
    k: int,
    min_hits: int,
    scores_from: tuple[DataFrame, DataFrame] | None = None,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    score_col: str = "cos_sim",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query audit of an approximate top-k against the brute-force
    exact top-k (same ``(query_id, vec_id)`` shape on both inputs).

    Emits, per query:

    - ``query_id``     — exact: the oracle re-derives the query set
    - ``n_results``    1 iff the ANN returned exactly ``k`` rows
    - ``self_found``   1 iff the query's own vector is in its result
                       (every bucketed/probed scheme must find the
                       identical vector)
    - ``recall_ok``    1 iff ``|ann ∩ exact_topk| ≥ min_hits``
    - ``scores_ok``    (only when ``scores_from=(corpus, queries)`` is
                       given) 1 iff every returned score equals the
                       exact cosine recomputed from the raw vectors —
                       proves the bucket join paired the right vectors

    All flags are oracle-pinned to 1. The joins are query-count-sized:
    ann/exact are ≤ n_queries·k rows and broadcast.
    """
    hits = (
        ann.join(
            exact.select(query_id_col, id_col),
            [query_id_col, id_col],
            "left_semi",
        )
        .groupBy(query_id_col)
        .agg(F.count("*").alias("__hits"))
    )
    per_q = ann.groupBy(query_id_col).agg(
        F.count("*").alias("__n"),
        F.max((F.col(id_col) == F.col(query_id_col)).cast("long")).alias(
            "__self"
        ),
    )
    out = (
        per_q.join(hits, query_id_col, "left")
        .select(
            query_id_col,
            (F.col("__n") == k).cast("long").alias("n_results"),
            F.col("__self").alias("self_found"),
            (F.coalesce(F.col("__hits"), F.lit(0)) >= min_hits)
            .cast("long")
            .alias("recall_ok"),
        )
    )
    if scores_from is None:
        return out
    corpus, queries = scores_from
    recomputed = (
        ann.join(
            corpus.select(F.col(id_col), F.col(vec_col).alias("__cv")),
            id_col,
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(query_id_col), F.col(vec_col).alias("__qv")
                )
            ),
            query_id_col,
        )
        .withColumn(
            "__ok",
            (
                F.col(score_col)
                == F.round(cosine(F.col("__cv"), F.col("__qv")), 4)
            ).cast("long"),
        )
        .groupBy(query_id_col)
        .agg(F.min("__ok").alias("scores_ok"))
    )
    return out.join(recomputed, query_id_col).select(
        query_id_col, "n_results", "self_found", "recall_ok", "scores_ok"
    )


def pair_recall_audit(
    found: DataFrame,
    truth: DataFrame,
    min_recall_bp: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Single-row audit of an approximate pair set against the exact
    (brute-force) pair set on the same threshold.

    - ``n_truth_pairs``      exact — the oracle recomputes it from the
                             raw table (the anchor that proves both
                             engines scored the same ground truth)
    - ``no_false_positives`` 1 iff found ⊆ truth (candidate
                             verification means blocked schemes can
                             never over-report)
    - ``recall_ok``          1 iff ``|found ∩ truth|·10⁴ ≥
                             min_recall_bp · |truth|``
    """
    f = found.select(id_a, id_b)
    t = truth.select(id_a, id_b)
    n_truth = t.agg(F.count("*").cast("long").alias("n_truth_pairs"))
    n_hits = f.join(t, [id_a, id_b], "left_semi").agg(
        F.count("*").cast("long").alias("__hits")
    )
    n_fp = f.join(t, [id_a, id_b], "left_anti").agg(
        F.count("*").cast("long").alias("__fp")
    )
    return (
        n_truth.crossJoin(F.broadcast(n_hits))
        .crossJoin(F.broadcast(n_fp))
        .select(
            "n_truth_pairs",
            (F.col("__fp") == 0).cast("long").alias("no_false_positives"),
            (
                F.col("__hits") * 10000
                >= F.lit(min_recall_bp) * F.col("n_truth_pairs")
            )
            .cast("long")
            .alias("recall_ok"),
        )
    )


def decontaminate_recall_audit(
    exact: DataFrame,
    ann: DataFrame,
    min_recall_bp: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Single-row audit of bucket-joined semantic decontamination
    against the exact broadcast operator (both outputs carry
    ``(vec_id, contaminated)``).

    - ``n_train``          exact — every train vector surfaces in both
    - ``n_flagged_exact``  exact — the oracle recomputes the full
                           cross-score argmax count
    - ``subset_ok``        1 iff ann-flagged ⊆ exact-flagged (bucket
                           candidates are a subset, so the bucketed
                           max-cos can never exceed the exact one)
    - ``recall_ok``        1 iff ``|ann_flagged|·10⁴ ≥ min_recall_bp ·
                           |exact_flagged|``
    """
    ef = exact.filter(F.col("contaminated") == 1).select(id_col)
    af = ann.filter(F.col("contaminated") == 1).select(id_col)
    base = exact.agg(
        F.count("*").cast("long").alias("n_train"),
    )
    n_ef = ef.agg(F.count("*").cast("long").alias("n_flagged_exact"))
    n_af = af.agg(F.count("*").cast("long").alias("__n_ann"))
    n_out = af.join(ef, id_col, "left_anti").agg(
        F.count("*").cast("long").alias("__outside")
    )
    return (
        base.crossJoin(F.broadcast(n_ef))
        .crossJoin(F.broadcast(n_af))
        .crossJoin(F.broadcast(n_out))
        .select(
            "n_train",
            "n_flagged_exact",
            (F.col("__outside") == 0).cast("long").alias("subset_ok"),
            (
                F.col("__n_ann") * 10000
                >= F.lit(min_recall_bp) * F.col("n_flagged_exact")
            )
            .cast("long")
            .alias("recall_ok"),
        )
    )


def semdedup_audit(
    df: DataFrame,
    k: int = 16,
    threshold: float = 0.35,
    min_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> DataFrame:
    """Single-row audit of SemDeDup (``similarity.semdedup``) — the
    ``taxonomy_audit`` pattern applied to the KMeans-blocked semantic
    dedup.

    - ``n_vecs``              exact input count
    - ``n_global_dup_vecs``   exact: vectors with a lower-id cosine ≥
                              ``threshold`` partner ANYWHERE (the
                              cluster-free truth the oracle recomputes
                              with an all-pairs join — fixture-sized;
                              at scale this audit runs on a sample)
    - ``clusters_ok``         1 iff ``min_clusters ≤ #clusters ≤ k``
    - ``totality_ok``         1 iff every input id appears exactly once
                              with kept ∈ {0, 1}
    - ``keeper_rule_ok``      1 iff each cluster's lowest id is kept
    - ``drop_witness_ok``     1 iff every dropped id has a lower-id
                              same-cluster witness at ≥ threshold AND
                              every kept id has none (the definition,
                              re-verified from the cluster assignment)
    - ``dropped_subset_global`` 1 iff dropped ⊆ global-dup set
                              (cluster blocking can only *miss* drops)
    """
    from .similarity import semdedup

    sd = semdedup(df, id_col=id_col, vec_col=vec_col, k=k,
                  threshold=threshold, seed=seed).localCheckpoint()
    src = df.select(F.col(id_col), F.col(vec_col))

    n_vecs = src.agg(F.count("*").cast("long").alias("n_vecs"))

    a = src.select(F.col(id_col).alias("__ia"), F.col(vec_col).alias("__va"))
    b = src.select(F.col(id_col).alias("__ib"), F.col(vec_col).alias("__vb"))
    # audit corpus is fixture-sized (sampled at scale) → broadcast NLJ
    global_dups = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("__ib") < F.col("__ia"))
        .filter(
            F.round(cosine(F.col("__va"), F.col("__vb")), 6)
            >= F.lit(threshold)
        )
        .select(F.col("__ia").alias(id_col))
        .distinct()
    )
    n_global = global_dups.agg(
        F.count("*").cast("long").alias("n_global_dup_vecs")
    )

    clusters_ok = sd.agg(
        (
            F.count_distinct("cluster").between(min_clusters, k)
        ).cast("long").alias("clusters_ok")
    )
    # NULL-proof on purpose: a source id MISSING from sd joins with
    # kept=NULL, and min() ignores NULLs — without the coalesces the
    # flag could never flip to 0 for exactly the regression (lost or
    # invented rows) it exists to catch. Coalesce the per-id verdict
    # flag to 0 and carry an explicit src-presence marker so sd-only
    # ids fail too.
    totality_ok = (
        sd.join(
            src.select(id_col, F.lit(1).alias("__in_src")),
            id_col,
            "full_outer",
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("__c"),
            F.min(
                F.coalesce(F.col("kept").isin(0, 1).cast("long"), F.lit(0))
            ).alias("__k01"),
            F.min(F.coalesce(F.col("__in_src"), F.lit(0))).alias("__src"),
        )
        .agg(
            F.min(
                (
                    (F.col("__c") == 1)
                    & (F.col("__k01") == 1)
                    & (F.col("__src") == 1)
                ).cast("long")
            ).alias("totality_ok")
        )
    )
    keeper_ok = (
        sd.groupBy("cluster")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("kept"))).alias("__lo")
        )
        .agg(
            F.min(F.col("__lo.kept")).cast("long").alias("keeper_rule_ok")
        )
    )
    # re-derive witnesses from the audited assignment itself
    sa = sd.join(src, id_col).select(
        F.col(id_col).alias("__ia"),
        F.col("cluster").alias("__ca"),
        F.col("kept").alias("__kept"),
        F.col(vec_col).alias("__va"),
    )
    sb = sd.join(src, id_col).select(
        F.col(id_col).alias("__ib"),
        F.col("cluster").alias("__cb"),
        F.col(vec_col).alias("__vb"),
    )
    witnessed = (
        sa.join(sb, (F.col("__ca") == F.col("__cb")) & (F.col("__ib") < F.col("__ia")))
        .filter(
            F.round(cosine(F.col("__va"), F.col("__vb")), 6)
            >= F.lit(threshold)
        )
        .select(F.col("__ia"))
        .distinct()
    )
    drop_witness_ok = (
        sa.select(F.col("__ia"), F.col("__kept"))
        .join(witnessed.withColumn("__w", F.lit(1)), "__ia", "left")
        .agg(
            F.min(
                (
                    (F.col("__kept") == 0) == F.col("__w").isNotNull()
                ).cast("long")
            ).alias("drop_witness_ok")
        )
    )
    dropped_subset_global = (
        sd.filter(F.col("kept") == 0)
        .select(id_col)
        .join(global_dups, id_col, "left_anti")
        .agg((F.count("*") == 0).cast("long").alias("dropped_subset_global"))
    )
    return (
        n_vecs.crossJoin(F.broadcast(n_global))
        .crossJoin(F.broadcast(clusters_ok))
        .crossJoin(F.broadcast(totality_ok))
        .crossJoin(F.broadcast(keeper_ok))
        .crossJoin(F.broadcast(drop_witness_ok))
        .crossJoin(F.broadcast(dropped_subset_global))
    )
