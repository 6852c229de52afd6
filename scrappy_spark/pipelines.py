"""End-to-end corpus deduplication pipeline — the composed flow a
training-data user actually runs:

    exact content-hash collapse → MinHash-LSH candidate pairs over
    UNIQUE texts → connected components → fan cluster labels back out
    to every copy → cleaned corpus + audit map.

Each stage is an operator from ``operators/``; this module only wires
them. Everything stays lazy until the caller acts.

Why collapse first (not just "identical texts pair anyway"): at web
scale exact duplicates dominate — a text repeated d× puts d rows in the
same (seed, minhash) bucket, and the LSH pair join emits d² rows per
seed. Collapsing to one representative per distinct text keeps the pair
join O(unique texts); the cluster labels are unchanged because the
representative is the min id of its exact group (see
``collapse_exact_dups``). A ``max_bucket_size`` cap guards the residual
skew (e.g. boilerplate-heavy shingles shared by thousands of otherwise-
distinct pages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .operators.components import checkpointed, dedup_clusters
from .operators.dedup_approx import (
    incremental_minhash_pairs,
    minhash_candidate_pairs,
    minhash_signatures,
    with_exact_rep,
)


def dedup_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    min_matches: int = 2,
    hash_fn: str = "md5",
    max_bucket_size: int | None = 1000,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (cleaned_docs, cluster_map).

    cleaned_docs: input rows minus non-canonical near-dups (exact dups
    collapse in stage 1; near-dups via LSH over unique texts).
    cluster_map: (doc_id, component, is_canonical) for every input doc —
    a dedup step a pipeline can't explain is a dedup step a pipeline
    can't debug. component = min doc_id of the cluster; the single
    canonical doc per cluster is the one whose id equals the label.
    """
    # One window-min shuffle attaches each row's exact-group rep; the
    # frame feeds FOUR consumers (signatures, component label init,
    # cluster fan-out, cleaned output), so materialize it ONCE and
    # derive reps / doc→rep as free projections. localCheckpoint by
    # default; pass checkpoint_dir for fault-tolerant cluster runs.
    # Eager on the reliable path: neither frame is the direct target of
    # the first action (the component loop checkpoints its own rounds,
    # and reliable doCheckpoint stops at the first marked ancestor, so a
    # lazy mark here would never be written and the window/explode work
    # would rerun per consumer). localCheckpoint persists at first
    # compute, so it stays lazy.
    eager = checkpoint_dir is not None
    with_rep = checkpointed(
        with_exact_rep(docs, text_col=text_col, id_col=id_col), checkpoint_dir,
        eager=eager,
    )
    reps = with_rep.filter(F.col(id_col) == F.col("__rep")).drop("__rep")
    doc_to_rep = with_rep.select(id_col, "__rep")
    # The signature frame is tiny (n_docs × num_hashes rows) but feeds
    # four sub-plans of the pair join (bucket-size agg, its semi join,
    # both self-join sides); materialize it so the shingle explode +
    # hash aggregation runs once, not per consumer.
    sig = checkpointed(
        minhash_signatures(
            reps, text_col=text_col, id_col=id_col, num_hashes=num_hashes, hash_fn=hash_fn
        ),
        checkpoint_dir,
        eager=eager,
    )
    pairs = minhash_candidate_pairs(
        sig, id_col=id_col, min_matches=min_matches, max_bucket_size=max_bucket_size
    )
    rep_clusters = dedup_clusters(reps, pairs, id_col=id_col, checkpoint_dir=checkpoint_dir)
    # Fan the rep-level labels back out to every exact copy. A doc is
    # canonical iff it IS the cluster label (min id — each rep is the
    # min of its exact group, so the overall min is itself a rep).
    clusters = (
        doc_to_rep.join(
            rep_clusters.select(F.col(id_col).alias("__rep"), "component"), "__rep"
        )
        .select(
            id_col,
            "component",
            (F.col(id_col) == F.col("component")).alias("is_canonical"),
        )
    )
    # Canonical docs are exactly the reps whose cluster label is their
    # own id — derivable from the (small) rep-level labels without
    # re-scanning the raw corpus.
    cleaned = reps.join(
        rep_clusters.filter(F.col(id_col) == F.col("component")).select(id_col),
        on=id_col,
        how="left_semi",
    )
    return cleaned, clusters


def dedup_corpus_incremental(
    new_docs: DataFrame,
    base_sig: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    min_matches: int = 2,
    hash_fn: str = "md5",
    max_bucket_size: int = 1000,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Daily-ingest dedup: clean a NEW batch against an already-indexed
    corpus using only the base's stored SIGNATURE table — base text is
    never re-read, never re-shingled, and base-base pairs never exist.

    Returns ``(cleaned_new, verdict_map, sig_out)``:

    - ``cleaned_new``: new rows that survive — not an exact dup within
      the batch, not near-dup-connected to the base corpus, and the
      canonical (min-id) member of their within-batch near-dup cluster.
    - ``verdict_map``: (doc_id, component, verdict) for EVERY new doc —
      'exact_dup_in_batch' | 'dup_of_base' | 'near_dup_in_batch' |
      'kept'. A whole within-batch cluster is 'dup_of_base' when ANY
      member pairs with the base (the cluster is the same content
      neighborhood the base already covers).
    - ``sig_out``: signatures of the kept reps — union into the stored
      index so tomorrow's batch dedups against today's acceptances.

    New and base id spaces MUST be disjoint: the pair stage tags rows
    through a union, and its ``id_a < id_b`` convention cannot pair a
    doc with an indexed twin sharing its id (callers ingesting
    possibly-redelivered data should anti-join batch ids against the
    index first — ``stream_dedup_into_corpus`` does).

    Stage shape mirrors ``dedup_corpus`` (collapse → LSH → components
    → fan-out) with ``incremental_minhash_pairs`` as the pair stage;
    all shuffles price by batch size and bucket co-occupancy, not base
    size. ``n_new_sides`` from the pair stage splits the graph: ==2
    edges drive the within-batch components, ==1 edges mark
    base-connected reps.
    """
    eager = checkpoint_dir is not None
    with_rep = checkpointed(
        with_exact_rep(new_docs, text_col=text_col, id_col=id_col),
        checkpoint_dir,
        eager=eager,
    )
    reps = with_rep.filter(F.col(id_col) == F.col("__rep")).drop("__rep")
    doc_to_rep = with_rep.select(id_col, "__rep")
    sig_new = checkpointed(
        minhash_signatures(
            reps, text_col=text_col, id_col=id_col, num_hashes=num_hashes, hash_fn=hash_fn
        ),
        checkpoint_dir,
        eager=eager,
    )
    pairs = incremental_minhash_pairs(
        sig_new,
        base_sig,
        id_col=id_col,
        min_matches=min_matches,
        max_bucket_size=max_bucket_size,
    )
    nn = pairs.filter(F.col("n_new_sides") == 2).select("id_a", "id_b")
    nb = pairs.filter(F.col("n_new_sides") == 1)
    rep_ids = reps.select(id_col)
    base_connected = (
        nb.join(rep_ids.withColumnRenamed(id_col, "id_a"), "id_a", "left_semi")
        .select(F.col("id_a").alias(id_col))
        .unionAll(
            nb.join(rep_ids.withColumnRenamed(id_col, "id_b"), "id_b", "left_semi")
            .select(F.col("id_b").alias(id_col))
        )
        .distinct()
    )
    comp = dedup_clusters(reps, nn, id_col=id_col, checkpoint_dir=checkpoint_dir)
    bad_comps = (
        comp.join(base_connected, id_col, "left_semi").select("component").distinct()
    )
    rep_v = (
        comp.join(bad_comps.withColumn("__bad", F.lit(1)), "component", "left")
        .select(
            id_col,
            "component",
            F.when(F.col("__bad").isNotNull(), F.lit("dup_of_base"))
            .when(F.col(id_col) != F.col("component"), F.lit("near_dup_in_batch"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
        )
    )
    verdict_map = (
        doc_to_rep.join(
            rep_v.select(
                F.col(id_col).alias("__rep"),
                "component",
                F.col("verdict").alias("__rep_verdict"),
            ),
            "__rep",
        )
        .select(
            id_col,
            "component",
            F.when(F.col(id_col) != F.col("__rep"), F.lit("exact_dup_in_batch"))
            .otherwise(F.col("__rep_verdict"))
            .alias("verdict"),
        )
    )
    kept = rep_v.filter(F.col("verdict") == "kept").select(id_col)
    cleaned = reps.join(kept, id_col, "left_semi")
    sig_out = sig_new.join(kept, id_col, "left_semi")
    return cleaned, verdict_map, sig_out


def rag_retrieve(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    chunk_len: int = 200,
    chunk_stride: int = 150,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    encoder_factory=None,
    dim: int = 64,
) -> DataFrame:
    """RAG retrieval, end to end: overlapping chunking (codegen
    sequence+substr, zero shuffle) → chunk embeddings (Arrow-batched
    pandas UDF, encoder built once per worker) → query embeddings →
    brute-force cosine top-k (query side broadcast, corpus scanned
    once) → chunks with provenance (doc id, chunk index, text, score,
    rank).

    The retrieval stage is swappable: at index scale where one scan
    per query batch stops being acceptable, `ann_lsh_topk`/`ivf_topk`
    take the same (corpus, queries) shape. Chunk ids are
    deterministic (doc_id·10⁶ + chunk_idx), so retrieved provenance is
    stable across runs — no monotonically_increasing_id.
    """
    from .ml.embeddings import embed_texts

    starts = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.lit(1), F.length(F.col(text_col))),
                F.lit(chunk_stride),
            )
        ).alias("__start"),
    )
    chunks = starts.select(
        id_col,
        ((F.col("__start") - 1) / chunk_stride).cast("long").alias("chunk_idx"),
        F.substring(F.col(text_col), F.col("__start"), chunk_len).alias("chunk_text"),
    ).withColumn(
        "chunk_id", F.col(id_col) * 1_000_000 + F.col("chunk_idx")
    )
    emb_chunks = embed_texts(
        chunks, text_col="chunk_text", encoder_factory=encoder_factory, dim=dim
    )
    emb_q = embed_texts(
        queries.select(F.col(query_id_col), F.col(query_text_col)),
        text_col=query_text_col,
        encoder_factory=encoder_factory,
        dim=dim,
    )
    from .operators.similarity import cosine_topk

    top = cosine_topk(
        emb_chunks.select(F.col("chunk_id"), F.col("embedding")),
        emb_q.select(query_id_col, "embedding"),
        k=k,
        id_col="chunk_id",
        query_id_col=query_id_col,
    )
    return (
        top.join(chunks, "chunk_id")
        .select(
            query_id_col,
            F.col(id_col),
            "chunk_idx",
            "chunk_text",
            "cos_sim",
        )
    )


def curate_corpus(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    floor_frac: float = 0.2,
    split_salt: str = "split",
    max_bucket_size: int | None = 1000,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The full pretraining-curation flow in one call:

        near-dup dedup (exact collapse → LSH → components)
        → benchmark decontamination (3-gram overlap vs ``bench``)
        → per-group quality floor (drop each group's bottom frac)
        → leakage-safe splits (hash of the near-dup CLUSTER id)

    Returns (curated, report): ``curated`` is the surviving corpus with
    ``component`` and ``split`` attached; ``report`` has one row per
    input doc with its stage verdict — 'dup' / 'contaminated' /
    'low_quality' / 'kept' — because a pipeline that can't say WHY a
    document vanished can't be debugged. Every stage is an existing
    operator; this function only wires them, so each keeps its own
    scale contract (collapse-before-LSH, broadcast bench grams,
    integer floor rule, scan-side split hash).
    """
    from .operators.curation import assign_splits, decontaminate, quality_floor
    from .operators.textstats import quality_score

    cleaned, clusters = dedup_corpus(
        docs,
        id_col=id_col,
        text_col=text_col,
        max_bucket_size=max_bucket_size,
        checkpoint_dir=checkpoint_dir,
    )
    flagged = decontaminate(cleaned, bench, id_col=id_col, text_col=text_col)
    decon = flagged.filter(~F.col("contaminated")).drop("contaminated")
    scored = decon.join(
        quality_score(decon, text_col=text_col, id_col=id_col).select(
            id_col, "quality_score"
        ),
        id_col,
    )
    survivors = quality_floor(
        scored, frac=floor_frac, group_col=group_col, id_col=id_col
    )
    comp = clusters.select(id_col, "component")
    curated = assign_splits(
        survivors.join(comp, id_col), id_col="component", salt=split_salt
    )
    report = (
        clusters.join(flagged.select(id_col, "contaminated"), id_col, "left")
        .join(
            survivors.select(id_col).withColumn("__q", F.lit(True)), id_col, "left"
        )
        .join(curated.select(id_col, "split"), id_col, "left")
        .select(
            id_col,
            "component",
            F.when(~F.col("is_canonical"), F.lit("dup"))
            .when(F.col("contaminated"), F.lit("contaminated"))
            .when(F.col("__q").isNull(), F.lit("low_quality"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
            "split",
        )
    )
    return curated, report
