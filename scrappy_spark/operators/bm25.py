"""BM25 lexical retrieval — the inverted-index counterpart to the
embedding-based ``pipelines.rag_retrieve``.

The 100 TB shape: retrieval needs exactly three corpus-derived tables —
postings ``(term, doc, tf)`` (one explode + partial-agg groupBy),
document lengths (a projection of the same pass), and document
frequencies ``(term, df)`` (a second partial-agg over postings, vocab-
sized by Heaps' law). The query side is tiny and BROADCASTS; scoring
is a postings⋈query-terms broadcast join + one (query, doc) groupBy —
the corpus text is read once and never shuffles on anything wider than
a term key. Top-k per query is a bounded window over candidates that
matched at least one query term.

Scoring is Robertson/Spärck-Jones BM25 (k1=1.2, b=0.75):

    score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    idf(t)      = ln((N − df + 0.5)/(df + 0.5) + 1)

For engine parity the per-(term, doc) contribution is snapped to
integer micro-units: with k1 = 6/5 and b = 3/4 the normalization is
exactly rational, so

    contrib_micro = (idf_micro · 22 · tf · L) div (10·tf·L + 3·L + 9·|d|·N)

where ``L`` = total corpus token count and ``idf_micro =
round(ln(...)·10⁶)`` (the same micro-nat snap ``doc_perplexity``
proved cross-engine) — the per-document reduction is then an exact
integer sum, immune to shuffle order. A float ``score`` column rides
along for human use; the declared oracle hashes the integer column.

Reference parity: the reference has no retrieval at all (scrappy.py's
closest surface is substring filtering, article_querry.py:19-20); this
extends the engine's RAG family with the classic lexical baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .mining import tokens_col

BM25_K1_NUM, BM25_K1_DEN = 6, 5  # k1 = 1.2
BM25_B_NUM, BM25_B_DEN = 3, 4  # b = 0.75


def bm25_retrieve(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Top-``k`` documents per query under BM25.

    Output: (query_id, rank, doc_id, n_matched, score_micro, score) —
    rank 1-based by (score_micro DESC, doc_id ASC); only docs matching
    ≥1 query term are candidates. ``score_micro`` is the exact integer
    scoring documented in the module docstring; ``score`` is the float
    convenience view (micro ÷ 10⁶).
    """
    from .mining import ensure_parallelism

    # explode_OUTER + explicit null filter: plain explode would infer a
    # size/isnotnull filter on the token array and push it below the
    # repartition exchange, re-tokenizing every doc inside the serial
    # scan task (see retrieval.py::char_ngram_topk for the full note).
    # The isnotnull(term) filter references the GENERATED column, so it
    # cannot be pushed below the Generate.
    toks = (
        ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col),
            F.explode_outer(tokens_col(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term").isNotNull())
    )
    postings = toks.groupBy(id_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    # document length = Σ tf, derived from POSTINGS (not a second
    # groupBy over the raw token stream): the tokenize+explode pass
    # feeds exactly one exchange, and the per-doc shuffle carries
    # distinct (doc, term) counts instead of every occurrence
    # (guide §2.3). Docs with zero tokens drop out of postings and
    # dlen identically, preserving the oracle's convention.
    dlen = postings.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    df_t = postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    # one pass for N and L (total corpus tokens); docs with zero
    # tokens drop out of dlen AND out of every score denominator,
    # which is the convention the oracle mirrors (a token-free doc can
    # never match a term anyway).
    stats = dlen.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(tokens_col(F.col(query_text_col)))).alias(
            "term"
        ),
    )
    idf = (
        df_t.crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_micro",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * 1000000
            ).cast("long"),
        )
        .select("term", "idf_micro", "n_docs", "total_len")
    )
    # dl attached with a window over the postings stream instead of a
    # dlen self-join: the join sorted/shuffled BOTH sides by doc id,
    # while the window is one exchange + per-group sum on the same
    # stream (guide §2.4 — one exchange, one sort; A/B at sf0.1
    # min-of-4: 1.09–1.21 s vs 1.35–1.44 s join, Generate 5→4).
    # The window must sit BELOW the query-term filter — dl sums ALL of
    # a doc's terms, not just the matched ones.
    pw = postings.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy(id_col))
    )
    matched = pw.join(
        F.broadcast(qterms.join(idf, "term")), "term"
    ).withColumn(
        "contrib_micro",
        F.expr(
            "(idf_micro * 22 * tf * total_len) div "
            "(10 * tf * total_len + 3 * total_len + 9 * dl * n_docs)"
        ),
    )
    scored = matched.groupBy(query_id_col, id_col).agg(
        F.count("*").cast("long").alias("n_matched"),
        F.sum("contrib_micro").cast("long").alias("score_micro"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score_micro"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            F.col("rank").cast("long").alias("rank"),
            id_col,
            "n_matched",
            "score_micro",
            (F.col("score_micro") / 1000000.0).alias("score"),
        )
    )
