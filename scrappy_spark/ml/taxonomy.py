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
