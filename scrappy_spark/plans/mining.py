"""Term-mining declared queries (reference A1–A6, J2, J3).

All run over the ``documents`` fixture. The tokenize→ngram→explode→
count→top-k pipeline replaces the reference's driver-side
``CountVectorizer`` matrix (``scrappy.py:368-373``); the oracle SQL
reproduces the same token stream with DuckDB list functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.localrel import local_relation
from ..io import load_table
from ..operators import joins as J
from ..operators.mining import STOPWORDS, TOKEN_SPLIT_RE, drop_subset_terms, top_terms
from .registry import register

_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

#: shared DuckDB token pipeline: lower → regex split → drop empties/stopwords
_TOKS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
    f"t -> t <> '' AND t NOT IN ({_SW_SQL}))"
)


@register(
    "q_ngram_topk",
    sql=f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS toks FROM documents),
    grams AS (
        SELECT unnest(toks) AS term FROM toks
        UNION ALL
        SELECT unnest([toks[i] || ' ' || toks[i + 1]
                       FOR i IN generate_series(1, len(toks) - 1)]) AS term
        FROM toks
    )
    SELECT term, count(*) AS freq
    FROM grams GROUP BY term
    ORDER BY freq DESC, term LIMIT 100
    """,
    doc="A1–A3: corpus 1-2-gram frequencies, top-100 with deterministic "
    "(freq desc, term) tiebreak. Explode + partial-agg count; top-k is "
    "TakeOrderedAndProject, never a full sort.",
    tags=("mining",),
)
def q_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return top_terms(docs, text_col="text", ngram_range=(1, 2), k=100)


@register(
    "q_anti_terms",
    sql=f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS toks FROM documents),
    freq AS (
        SELECT unnest(toks) AS term FROM toks
    ),
    top20 AS (
        SELECT term, count(*) AS freq FROM freq GROUP BY term
        ORDER BY freq DESC, term LIMIT 20
    )
    SELECT term, freq FROM top20
    WHERE lower(term) NOT IN ('spark', 'table', 'data')
    """,
    doc="J2: drop suggested terms already saved (reference "
    "scrappy.py:361-373) — anti-join of mined top-k vs saved list.",
    tags=("mining", "join"),
)
def q_anti_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cands = top_terms(docs, text_col="text", ngram_range=(1, 1), k=20)
    saved = local_relation(
        spark, [("spark",), ("table",), ("data",)], "term string"
    )
    # mined terms are already lowercased by tokenization; lower() the saved
    # side to mirror the reference's case-insensitive membership check
    return cands.join(
        F.broadcast(saved.select(F.lower("term").alias("term"))), on="term", how="left_anti"
    )


@register(
    "q_context_examples",
    sql="""
    SELECT term, doc_id FROM (
        SELECT t.term, d.doc_id,
               row_number() OVER (PARTITION BY t.term ORDER BY d.doc_id) AS rn
        FROM (VALUES ('join'), ('window'), ('vector')) AS t(term)
        JOIN documents d ON contains(lower(d.text), lower(t.term)))
    WHERE rn <= 2
    """,
    doc="J3: up to 2 example texts per term via broadcast theta-join + "
    "per-term window (reference's O(terms×docs) loop, scrappy.py:376-379).",
    tags=("mining", "join"),
)
def q_context_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    terms = local_relation(
        spark, [("join",), ("window",), ("vector",)], "term string"
    )
    out = J.context_examples(
        terms, docs, term_col="term", text_col="text", n_examples=2, example_order=["doc_id"]
    )
    return out.select("term", "doc_id")


@register(
    "q_token_subset",
    sql=f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS toks FROM documents),
    bigrams AS (
        SELECT DISTINCT unnest([toks[i] || ' ' || toks[i + 1]
                                FOR i IN generate_series(1, len(toks) - 1)]) AS term
        FROM toks
    )
    SELECT term FROM bigrams
    WHERE len(list_filter(string_split(term, ' '),
                          t -> t NOT IN ('spark', 'table'))) > 0
    """,
    doc="A6: DFS pruning — drop candidate terms whose token set is a "
    "subset of the base term's tokens (reference scrappy.py:473-485).",
    tags=("mining",),
)
def q_token_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.mining import ngrams_expr, tokens_col

    sw_arr = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    toks = docs.select(tokens_col(F.col("text")).alias("toks")).withColumn(
        "toks", F.expr(f"filter(toks, t -> NOT array_contains({sw_arr}, t))")
    )
    bigrams = toks.select(
        F.explode(F.expr(ngrams_expr("toks", 2))).alias("term")
    ).distinct()
    return drop_subset_terms(bigrams, base_term="spark table")


@register(
    "q_word_weights",
    sql=f"""
    WITH docs AS (
        SELECT n_chars % 5 AS topic, {_TOKS_SQL} AS toks FROM documents
    ),
    words AS (
        SELECT topic, unnest(toks) AS word, 1.0 / len(toks) AS weight
        FROM docs WHERE len(toks) > 0
    )
    SELECT word, round(sum(weight), 6) AS total_weight
    FROM words WHERE topic <> -1
    GROUP BY word
    """,
    doc="A5: word-cloud weighted aggregation (reference scrappy.py:508-517) "
    "— per-doc-normalized token weights summed per word, outlier topic "
    "excluded.",
    tags=("mining", "agg"),
)
def q_word_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mining import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    sw_arr = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    toks = (
        docs.select((F.col("n_chars") % 5).alias("topic"), tokens_col(F.col("text")).alias("toks"))
        .withColumn("toks", F.expr(f"filter(toks, t -> NOT array_contains({sw_arr}, t))"))
        .filter(F.size("toks") > 0)
    )
    words = toks.select(
        "topic",
        F.explode("toks").alias("word"),
        (F.lit(1.0) / F.size("toks")).alias("weight"),
    )
    return (
        words.filter(F.col("topic") != -1)
        .groupBy("word")
        .agg(F.round(F.sum("weight"), 6).alias("total_weight"))
    )


@register(
    "q_tfidf_topk",
    sql="""
    WITH toks AS (SELECT doc_id,
        unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> t <> '')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    df_t AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df_t.df), 6) AS score
      FROM tf, n JOIN df_t ON tf.term = df_t.term),
    ranked AS (
      SELECT doc_id, term, tf, score,
             CAST(row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, term) AS BIGINT) AS rnk
      FROM scored)
    SELECT doc_id, term, tf, score, rnk FROM ranked WHERE rnk <= 3
    """,
    doc="Per-document TF-IDF top-3 terms in pure relational algebra: "
    "tf via one (doc,term) partial-agg, df from the tf table (one more "
    "partial agg), corpus size as a broadcast scalar, rank by rounded "
    "score with a deterministic term tie-break. The pattern behind "
    "keyword extraction without an ML fit — one explode, two linear "
    "shuffles, one per-doc window.",
    tags=("mining", "agg", "window"),
)
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.mining import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    n = docs.select(F.count("*").alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    # n is a scalar → broadcast. df_t is |vocab|-sized: small here, but
    # unbounded on web corpora — no forced hint, AQE picks broadcast vs
    # shuffle from the measured size.
    scored = (
        tf.crossJoin(F.broadcast(n))
        .join(df_t, "term")
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "score", "rnk")
    )
