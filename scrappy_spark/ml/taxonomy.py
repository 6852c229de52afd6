"""Topic taxonomy (reference ML5/ML6 + EP3, ``scrappy.py:496-526``):
embed → cluster → per-topic keywords → word-cloud weights.

The reference runs BERTopic (UMAP+HDBSCAN+c-TF-IDF) on the driver.
Capability parity at scale (SURVEY.md §2.7): MLlib KMeans over the
embedding column assigns topic ids, and topic keywords are re-derived
relationally with c-TF-IDF-style scoring — per-cluster term frequency ×
inverse document frequency — via aggregations + a window top-k. Exact
BERTopic parity is a non-goal (non-deterministic, driver-bound).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window, functions as F

from ..operators.mining import STOPWORDS, tokens_col
from .embeddings import EncoderFactory, embed_texts


def assign_topics(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    seed: int = 42,
    encoder_factory: EncoderFactory | None = None,
    dim: int = 64,
) -> DataFrame:
    """Add ``embedding`` and integer ``Topic`` columns (KMeans cluster
    ids; deterministic for a fixed seed + input)."""
    with_vecs = embed_texts(df, text_col=text_col, encoder_factory=encoder_factory, dim=dim)
    with_vecs = with_vecs.withColumn("__vec", array_to_vector("embedding"))
    km = KMeans(k=k, seed=seed, featuresCol="__vec", predictionCol="Topic")
    model = km.fit(with_vecs)
    return model.transform(with_vecs).drop("__vec")


def topic_keywords(
    clustered: DataFrame,
    text_col: str = "text",
    topic_col: str = "Topic",
    top_n: int = 5,
) -> DataFrame:
    """c-TF-IDF-style top-``top_n`` keywords per topic.

    score(term, topic) = tf_{term,topic} × ln(1 + N_topics / df_term)
    where df_term = number of topics containing the term. All relational:
    explode → two aggregations → window top-k → collect_list.
    """
    sw = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    terms = (
        clustered.select(topic_col, F.explode(tokens_col(F.col(text_col))).alias("term"))
        .filter(~F.expr(f"array_contains({sw}, term)"))
    )
    tf = terms.groupBy(topic_col, "term").agg(F.count("*").alias("tf"))
    n_topics = clustered.select(topic_col).distinct().count()
    df_term = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df_term, "term").withColumn(
        "score", F.col("tf") * F.log(1 + n_topics / F.col("df"))
    )
    w = Window.partitionBy(topic_col).orderBy(F.desc("score"), F.asc("term"))
    top = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= top_n)
    return top.groupBy(topic_col).agg(
        F.collect_list(F.struct("rn", "term", "score")).alias("__kw")
    ).select(
        topic_col,
        F.transform(F.array_sort("__kw"), lambda s: s.term).alias("topic_keywords"),
    )


def build_taxonomy(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    seed: int = 42,
    encoder_factory: EncoderFactory | None = None,
    top_n: int = 5,
) -> DataFrame:
    """EP3 end-to-end: rows + Topic + topic_keywords (array), with the
    reference's 'No topic' fallback becoming an empty keyword array."""
    clustered = assign_topics(df, text_col, k=k, seed=seed, encoder_factory=encoder_factory)
    kw = topic_keywords(clustered, text_col=text_col, top_n=top_n)
    return clustered.join(F.broadcast(kw), on="Topic", how="left").withColumn(
        "topic_keywords",
        F.coalesce(F.col("topic_keywords"), F.array().cast("array<string>")),
    )


def taxonomy_audit(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    seed: int = 42,
    encoder_factory: EncoderFactory | None = None,
    dim: int = 64,
    top_n: int = 5,
    min_size_bp: int = 200,
    max_size_bp: int = 6000,
    wss_tss_max_bp: int = 9900,
) -> DataFrame:
    """Banded-flag audit of the seeded-KMeans taxonomy (ML5/ML6): one
    row of exact facts + integer flags a SQL oracle pins to 1, so the
    clustering surface takes the value-hash gate instead of hiding
    behind a rows-only check (the ``q_kll_quantiles``/
    ``q_approx_count_distinct`` promotion pattern; reference behavior
    ``scrappy.py:496-505``).

    Emitted columns:

    - ``n_docs``        exact input count (anchors the audit to the table)
    - ``n_topics``      distinct assigned cluster ids — the oracle pins
                        the literal ``k``, so an empty/collapsed cluster
                        fails the hash
    - ``n_unassigned``  docs without a topic (must be 0: assignment
                        totality)
    - ``sizes_in_band`` 1 iff every cluster holds ≥ ``min_size_bp`` and
                        ≤ ``max_size_bp`` basis points of the corpus —
                        the size-distribution invariant
    - ``cohesion_ok``   1 iff within-cluster sum of squares <
                        ``wss_tss_max_bp``·TSS/10⁴ — KMeans must beat
                        the single-cluster baseline by a real margin
    - ``kw_ok``         1 iff every topic has exactly ``top_n`` distinct
                        non-empty c-TF-IDF keywords

    Plan shape: the clustered frame (one KMeans transform over the
    embedding UDF) is localCheckpointed and feeds five tiny aggregates
    (centroids are rebuilt relationally as per-dimension means — k×dim
    numbers — so no model state crosses the audit); everything after
    the transform is one scan-side pass plus broadcast joins of k-row /
    1-row frames. No collect, no explode — the dim loop is ``dim``
    column expressions inside whole-stage codegen.
    """
    from ..operators.components import checkpointed

    cl = checkpointed(
        assign_topics(df, text_col, k=k, seed=seed, encoder_factory=encoder_factory, dim=dim),
        None,
        eager=False,
    )
    emb = F.col("embedding")
    cent = cl.groupBy("Topic").agg(
        *[F.avg(emb[i]).alias(f"_c{i}") for i in range(dim)],
        F.count("*").alias("_size"),
    )
    cstat = cent.agg(
        F.count("*").cast("bigint").alias("n_topics"),
        F.min("_size").alias("_min_size"),
        F.max("_size").alias("_max_size"),
    )
    wss_term = sum(
        (emb[i] - F.col(f"_c{i}")) * (emb[i] - F.col(f"_c{i}")) for i in range(dim)
    )
    wss = (
        cl.join(F.broadcast(cent.drop("_size")), "Topic")
        .agg(F.sum(wss_term).alias("_wss"))
    )
    gmean = cl.agg(*[F.avg(emb[i]).alias(f"_g{i}") for i in range(dim)])
    tss_term = sum(
        (emb[i] - F.col(f"_g{i}")) * (emb[i] - F.col(f"_g{i}")) for i in range(dim)
    )
    tss = cl.crossJoin(F.broadcast(gmean)).agg(F.sum(tss_term).alias("_tss"))
    base = cl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("Topic").isNull().cast("long")).cast("bigint").alias("n_unassigned"),
    )
    kw = topic_keywords(cl, text_col=text_col, top_n=top_n)
    arr = F.col("topic_keywords")
    kw_row_ok = (
        (F.size(arr) == top_n)
        & (F.size(F.array_distinct(arr)) == top_n)
        & ~F.array_contains(arr, "")
    ).cast("long")
    kw_stat = kw.agg(
        F.count("*").alias("_n_kw_topics"),
        F.min(kw_row_ok).alias("_kw_all_ok"),
    )
    return (
        base.crossJoin(cstat)
        .crossJoin(wss)
        .crossJoin(tss)
        .crossJoin(kw_stat)
        .select(
            "n_docs",
            "n_topics",
            "n_unassigned",
            (
                (F.col("_min_size") * 10000 >= F.lit(min_size_bp) * F.col("n_docs"))
                & (F.col("_max_size") * 10000 <= F.lit(max_size_bp) * F.col("n_docs"))
            )
            .cast("bigint")
            .alias("sizes_in_band"),
            (F.col("_wss") * 10000 < F.lit(wss_tss_max_bp) * F.col("_tss"))
            .cast("bigint")
            .alias("cohesion_ok"),
            (
                (F.col("_n_kw_topics") == F.col("n_topics"))
                & (F.col("_kw_all_ok") == 1)
            )
            .cast("bigint")
            .alias("kw_ok"),
        )
    )


def wordcloud_weights(
    clustered: DataFrame,
    text_col: str = "text",
    topic_col: str = "Topic",
    outlier_topic: int = -1,
) -> DataFrame:
    """A5 word-cloud aggregation over clustered docs: c-TF-IDF scores
    summed per term across topics, outlier topic skipped (reference
    scrappy.py:508-517)."""
    kw_scores = (
        clustered.filter(F.col(topic_col) != outlier_topic)
        .select(topic_col, F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("weight"))
    )
    sw = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    return kw_scores.filter(~F.expr(f"array_contains({sw}, word)"))
