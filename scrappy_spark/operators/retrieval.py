"""Hybrid retrieval: character-n-gram fuzzy matching + reciprocal-rank
fusion over any set of rankers.

Production search stacks rarely run ONE retriever: a token-exact
scorer (BM25, ``operators/bm25.py``) misses misspellings and
morphology, an embedding ANN misses rare literals, and a character-
n-gram matcher bridges both.  The standard way to combine them without
comparable score scales is Reciprocal Rank Fusion (Cormack, Clarke &
Büttcher, SIGIR 2009): ``score(d) = Σ_r 1/(k + rank_r(d))`` over the
rankers r that returned d.  RRF only consumes RANKS, so it fuses
integer BM25 micro-scores with float cosine similarities without any
calibration — and in integer micro-units (``1_000_000 div (k+rank)``)
the fusion itself is exact and shuffle-order-immune.

Scale shape:

- ``char_ngram_topk`` builds a trigram inverted index in one explode +
  partial-agg pass (the BM25 postings shape); the query side is tiny
  and broadcasts; candidate generation is index ⋈ query-grams, so no
  all-pairs anything.  Hot grams (``'the'``) are the skew hazard: the
  ``max_df_frac`` knob drops grams present in more than that fraction
  of documents from the INDEX side (classic stop-gram pruning —
  changes candidate recall, documented, default off for oracle
  parity).
- ``rrf_fuse`` unions the per-ranker top-k lists (each ≤ n_queries·k
  rows — broadcast-sized by construction) and reduces per
  (query, doc); the heavy corpus work already happened inside each
  ranker.

The reference has no retrieval surface (its closest feature is pandas
substring filtering, article_querry.py:19-20); this family is part of
the LLM-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

RRF_K = 60  # the SIGIR-2009 default damping constant
_MICRO = 1_000_000


def char_ngrams_col(text, n: int = 3, already_lower: bool = False):
    """Distinct lowercase character n-grams of ``text`` (empty array
    when the text is shorter than ``n``).

    Pass ``already_lower=True`` when ``text`` is a pre-lowered COLUMN
    REFERENCE: the lambda below evaluates its input expression per
    array element, so an inline ``lower(...)`` would re-lowercase the
    whole text once per position — hoist it into a projection first
    (``char_ngram_topk`` does).
    """
    lower = text if already_lower else F.lower(text)
    length = F.length(lower)
    return F.when(
        length >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), length - (n - 1)),
                lambda i: lower.substr(i, F.lit(n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngram_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    max_df_frac: float | None = None,
) -> DataFrame:
    """Top-``k`` docs per query by Jaccard similarity of distinct
    character ``n``-gram sets, in exact parts-per-million integer
    units: ``score_ppm = (|Q∩D| · 10⁶) div |Q∪D|``.

    Output: (query_id, rank, doc_id, n_shared, score_ppm) — rank
    1-based by (score_ppm DESC, doc_id ASC); only docs sharing ≥1 gram
    with the query are candidates.
    """
    from .mining import ensure_parallelism

    # one gram computation per doc (the n-gram transform is the CPU
    # hot spot — size and explode both read the same projected array),
    # parallelized explicitly: a single-row-group scan would otherwise
    # serialize the whole stage on one core (see ensure_parallelism)
    doc_grams = (
        ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.lower(F.col(text_col)).alias("__lt"))
        .select(
            F.col(id_col),
            char_ngrams_col(F.col("__lt"), n, already_lower=True).alias(
                "__g"
            ),
        )
    )
    # explode_OUTER on purpose: plain explode makes the optimizer infer
    # a `size(__g) > 0 AND isnotnull(__g)` filter and push it BELOW the
    # repartition exchange, re-evaluating the whole gram transform
    # (twice) inside the serial scan task — exactly the stage the
    # repartition exists to parallelize. explode_outer infers no
    # filter; the empty-array docs surface as one null-gram row each
    # and drop in the equi-join below (null keys never match).
    index = doc_grams.select(
        F.col(id_col),
        F.size("__g").cast("long").alias("__dn"),
        F.explode_outer("__g").alias("gram"),
    )
    if max_df_frac is not None:
        # materialize the CPU-hot gram explode ONCE (lazily, at first
        # use) — it feeds both the document-frequency aggregation and
        # the intersection join below; without the checkpoint the
        # whole gram subtree would recompute per consumer (ADVICE r7).
        index = index.localCheckpoint(eager=False)
        # n_docs derived INSIDE the plan (one-row broadcast side), not
        # via an eager docs.count() action at plan-construction time:
        # declared queries must stay lazy until the driver executes
        # them, and the count would otherwise scan the corpus twice.
        n_docs_df = docs.agg(F.count("*").alias("__nd"))
        hot = (
            index.groupBy("gram")
            .agg(F.count("*").alias("__df"))
            .join(F.broadcast(n_docs_df))
            .filter(
                F.col("__df").cast("double")
                > F.lit(float(max_df_frac)) * F.col("__nd").cast("double")
            )
            .select("gram")
        )
        index = index.join(F.broadcast(hot), "gram", "left_anti")
    q_grams = queries.select(
        F.col(query_id_col),
        char_ngrams_col(F.col(query_text_col), n).alias("__g"),
    )
    q_side = q_grams.select(
        query_id_col,
        F.size("__g").cast("long").alias("__qn"),
        F.explode("__g").alias("gram"),
    )
    # __dn rides the exploded rows, so no second scan / size join —
    # the groupBy's map-side combine collapses to (query, doc) pairs
    inter = (
        index.join(F.broadcast(q_side), "gram")
        .groupBy(query_id_col, id_col, "__qn", "__dn")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    scored = inter.select(
        query_id_col,
        id_col,
        "n_shared",
        F.expr(
            f"(n_shared * {_MICRO}) div (__qn + __dn - n_shared)"
        ).alias("score_ppm"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score_ppm"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            F.col("rank").cast("long").alias("rank"),
            id_col,
            "n_shared",
            "score_ppm",
        )
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    k: int = 5,
    k_rrf: int = RRF_K,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of named per-query rankings.

    Each input frame carries (query_id, doc_id, rank) with rank
    1-based.  Output, top-``k`` per query by fused score:
    ``(query_id, rank, doc_id, rrf_micro, n_lists, <name>_rank...)``
    where ``rrf_micro = Σ_lists 10⁶ div (k_rrf + rank_list)`` (exact
    integers — fusion order cannot change the sum) and ``<name>_rank``
    is the doc's rank in that ranker (NULL if unranked there).  Final
    rank is 1-based by (rrf_micro DESC, doc_id ASC).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs >= 1 ranking")
    tagged = []
    for name, r in rankings.items():
        tagged.append(
            r.select(
                F.col(query_id_col),
                F.col(id_col),
                F.lit(name).alias("__src"),
                F.col(rank_col).cast("long").alias("__r"),
            )
        )
    allr = tagged[0]
    for t in tagged[1:]:
        allr = allr.unionByName(t)
    per_src = [
        F.max(F.when(F.col("__src") == name, F.col("__r"))).alias(
            f"{name}_rank"
        )
        for name in rankings
    ]
    fused = allr.groupBy(query_id_col, id_col).agg(
        F.sum(F.expr(f"{_MICRO} div ({k_rrf} + __r)"))
        .cast("long")
        .alias("rrf_micro"),
        F.count("*").cast("long").alias("n_lists"),
        *per_src,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("rrf_micro"), F.asc(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            F.col("rank").cast("long").alias("rank"),
            id_col,
            "rrf_micro",
            "n_lists",
            *[f"{name}_rank" for name in rankings],
        )
    )


def retrieval_eval(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval-quality metrics in exact integer units —
    the evaluation half of the retrieval family (recall@k /
    precision@k / reciprocal rank, the TREC trio whose means are
    what a retriever A/B at corpus scale actually compares).

    ``ranking`` carries (query_id, doc_id, rank) with rank 1-based
    (any of this module's or bm25's outputs); ``qrels`` carries the
    relevant (query_id, doc_id) pairs (deduplicated here).  The
    evaluation universe is the queries present in ``qrels`` — a
    query the ranker skipped entirely scores zero, a standard TREC
    convention.

    Output, one row per query:
    ``(query_id, n_rel, n_retrieved, n_hits, recall_ppm,
    precision_ppm, rr_micro)`` where ``recall_ppm = n_hits·10⁶ div
    n_rel``, ``precision_ppm = n_hits·10⁶ div n_retrieved`` (0 when
    nothing was retrieved), and ``rr_micro = 10⁶ div rank_of_first_
    relevant`` (0 when no relevant doc was retrieved).  All integer,
    so a driver hash covers the arithmetic exactly.

    Scale shape: top-k lists are n_queries·k rows and qrels is
    pair-sized — the joins here are tiny next to the retrieval that
    produced them; everything is partial-agg groupBys on query_id.
    """
    rel = qrels.select(query_id_col, id_col).distinct()
    topk = ranking.filter(F.col(rank_col) <= k).select(
        query_id_col, id_col, F.col(rank_col).cast("long").alias("__r")
    )
    n_rel = rel.groupBy(query_id_col).agg(
        F.count("*").cast("long").alias("n_rel")
    )
    n_ret = topk.groupBy(query_id_col).agg(
        F.count("*").cast("long").alias("n_retrieved")
    )
    hits = (
        topk.join(rel, [query_id_col, id_col])
        .groupBy(query_id_col)
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.min("__r").alias("__first"),
        )
    )
    out = (
        n_rel.join(n_ret, query_id_col, "left")
        .join(hits, query_id_col, "left")
        .select(
            query_id_col,
            "n_rel",
            F.coalesce("n_retrieved", F.lit(0)).cast("long").alias(
                "n_retrieved"
            ),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.col("__first"),
        )
    )
    return out.select(
        query_id_col,
        "n_rel",
        "n_retrieved",
        "n_hits",
        F.expr(f"(n_hits * {_MICRO}) div n_rel")
        .cast("long")
        .alias("recall_ppm"),
        F.when(
            F.col("n_retrieved") > 0,
            F.expr(f"(n_hits * {_MICRO}) div n_retrieved"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("precision_ppm"),
        F.when(
            F.col("__first").isNotNull(),
            F.expr(f"{_MICRO} div __first"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rr_micro"),
    )
