"""Deterministic negative sampling for contrastive training pairs.

Contrastive/embedding training (SimCLR/CLIP-style InfoNCE, public
recipes) needs k negatives per anchor drawn "randomly" from the
corpus — but at 100 TB, per-anchor random sampling is a join problem,
and naive spellings are either a cartesian product (anchor × corpus)
or nondeterministic (``rand()`` breaks retry/replay semantics).

Engine spelling:

- candidates get a stable md5 bucket (``% n_buckets``); each anchor
  probes ``n_probe`` md5-derived buckets — a plain equi-join on the
  bucket column, so each anchor sees ~``n_probe/n_buckets`` of the
  corpus, never all of it, and the corpus shuffles at most once.
- within the pooled candidates, ranking is md5(anchor‖candidate) —
  a deterministic per-anchor permutation; top-k via the shared
  windowed top-k.
- the false-negative guard drops self-pairs and exact text
  duplicates; swap in the near-dup cluster id (pipelines.dedup_corpus)
  as the exclusion key when paraphrase-level safety is needed — the
  join shape is identical.

Everything is md5 arithmetic, so the sample is reproducible
bit-for-bit across engines and retries (the declared-query oracle
re-derives it in DuckDB).

Reference parity: none — engine extension for training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: candidate-bucket count; production sizes this so a probe's pool
#: (~n_probe·N/n_buckets rows) fits comfortably in one task's memory.
CONTRAST_BUCKETS = 64


def _mod_hash(prefix: str, col: F.Column, mod: int) -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % F.lit(mod)
    )


def contrastive_negatives(
    docs: DataFrame,
    anchors: DataFrame,
    k: int = 4,
    n_probe: int = 2,
    n_buckets: int = CONTRAST_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(anchor_id, cand_id, rank 1..k) — k deterministic negatives per
    anchor. ``anchors`` needs (id, text); it is broadcast (anchor
    batches are small relative to the corpus; co-partition on bucket
    instead when they are not)."""
    cand = docs.select(
        F.col(id_col).alias("cand_id"),
        F.col(text_col).alias("__ctext"),
        _mod_hash("cb:", F.col(id_col), n_buckets).alias("bucket"),
    )
    probes = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(text_col).alias("__atext"),
        F.explode(
            F.array(
                *[
                    _mod_hash(f"ab{i}:", F.col(id_col), n_buckets)
                    for i in range(n_probe)
                ]
            )
        ).alias("bucket"),
    )
    pool = (
        cand.join(F.broadcast(probes), "bucket")
        .filter(
            (F.col("cand_id") != F.col("anchor_id"))
            & (F.col("__ctext") != F.col("__atext"))  # exact-dup guard
        )
        .select("anchor_id", "cand_id")
        .distinct()  # probe buckets may coincide
    )
    key = F.md5(
        F.concat(
            F.lit("nr:"),
            F.col("anchor_id").cast("string"),
            F.lit("|"),
            F.col("cand_id").cast("string"),
        )
    )
    from pyspark.sql import Window

    ranked = pool.withColumn("__k", key)
    w = Window.partitionBy("anchor_id").orderBy("__k", "cand_id")
    return (
        ranked.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "cand_id", "rank")
    )
