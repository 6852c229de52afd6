"""End-to-end corpus deduplication pipeline — the composed flow a
training-data user actually runs:

    exact hash dedup → MinHash-LSH candidate pairs → connected
    components → canonical doc per cluster → cleaned corpus + stats.

Each stage is an operator from ``operators/``; this module only wires
them. Everything stays lazy until the caller acts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .operators.components import dedup_clusters
from .operators.dedup_approx import minhash_candidate_pairs, minhash_signatures


def dedup_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    min_matches: int = 2,
    hash_fn: str = "md5",
) -> tuple[DataFrame, DataFrame]:
    """Returns (cleaned_docs, cluster_map).

    cleaned_docs: input rows minus non-canonical near-dups (exact dups
    collapse too — identical texts share identical signatures, so they
    always pair). cluster_map: (doc_id, component, is_canonical) for
    audit — a dedup step a pipeline can't explain is a dedup step a
    pipeline can't debug.
    """
    sig = minhash_signatures(
        docs, text_col=text_col, id_col=id_col, num_hashes=num_hashes, hash_fn=hash_fn
    )
    pairs = minhash_candidate_pairs(sig, id_col=id_col, min_matches=min_matches)
    clusters = dedup_clusters(docs, pairs, id_col=id_col)
    cleaned = docs.join(
        clusters.filter(F.col("is_canonical")).select(id_col), on=id_col, how="inner"
    )
    return cleaned, clusters
