"""DoReMi-style domain reweighting from per-document loss signals.

Training-data mixtures are usually tuned by hand; DoReMi (Xie et al.,
2023, public arXiv 2305.10429) instead upweights domains whose excess
loss over a reference is high — "hard but learnable" data. The full
method trains proxy models; this operator is the closed-form one-step
variant over any per-document loss column the engine already produces
(unigram surprisal, bigram perplexity, a quality score):

    w_g  ∝  share_g · exp(max(0, L_g − L_ref) / tau)

where L_g is the domain's token-weighted mean loss, L_ref the global
mean, and share_g the domain's token share (the baseline mixture).
Weights are normalized and turned into integer per-domain document
budgets for a target sample size.

Scale shape: ONE aggregation from per-doc rows to ≤ n_domains rows;
everything after (softmax, normalization, budgets) happens on the
domain-count frame, which is broadcast-sized by definition. Loss
inputs arrive as integer micro-nats (textstats convention), so the
heavy aggregation is an exact integer sum — cross-engine stable; the
only floats live on the tiny frame.

Reference parity: none — the reference has no notion of sampling or
mixtures; engine extension for training-data curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def domain_reweight(
    doc_loss: DataFrame,
    group_col: str,
    loss_micro_col: str,
    token_col: str,
    tau: float = 0.5,
    budget: int = 10_000,
) -> DataFrame:
    """Per-domain reweighting from per-doc integer micro-nat losses.

    ``doc_loss``: one row per document with its domain, token count,
    and total loss in micro-nats. Returns one row per domain:
    (group, n_docs, n_tokens, mean_loss, excess, weight, doc_budget).
    """
    g = doc_loss.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_col).cast("long").alias("n_tokens"),
        F.sum(loss_micro_col).cast("long").alias("loss_micro"),
    )
    tot = g.agg(
        F.sum("n_tokens").cast("long").alias("tot_tokens"),
        F.sum("loss_micro").cast("long").alias("tot_loss"),
    )
    scored = g.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        "n_tokens",
        (F.col("loss_micro") / F.col("n_tokens") / 1e6).alias("mean_loss"),
        F.greatest(
            F.lit(0.0),
            F.col("loss_micro") / F.col("n_tokens") / 1e6
            - F.col("tot_loss") / F.col("tot_tokens") / 1e6,
        ).alias("excess"),
        (F.col("n_tokens") / F.col("tot_tokens")).alias("share"),
    )
    unnorm = scored.withColumn(
        "u", F.col("share") * F.exp(F.col("excess") / F.lit(tau))
    )
    z = unnorm.agg(F.sum("u").alias("z"))
    return (
        unnorm.crossJoin(F.broadcast(z))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            "mean_loss",
            "excess",
            (F.col("u") / F.col("z")).alias("weight"),
            F.floor(F.col("u") / F.col("z") * F.lit(budget))
            .cast("long")
            .alias("doc_budget"),
        )
    )
