"""N-gram term mining (reference A1–A6, ``scrappy.py:368-373,467-471``).

The reference mines corpus term frequencies with sklearn's
``CountVectorizer(ngram_range=(1,3), max_features=1000)`` — a dense
driver-side doc-term matrix summed column-wise. The Spark shape is a
tokenize → n-gram → explode → groupBy(count) pipeline: partial (map-
side) aggregation does the heavy lifting and the "vocab cap" becomes a
plain top-k, so nothing is ever materialized per-document.

Scale notes: token frequencies are Zipf-skewed, but the explode feeds a
partial-agg hash aggregate, so the hot keys are combined map-side long
before the single shuffle; AQE handles any residual skew. The top-k is
``TakeOrderedAndProject`` (no full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: sklearn's ENGLISH_STOP_WORDS is 318 entries; the engine keeps a small
#: deterministic core list (enough for parity tests; swap in a fuller
#: list at deployment). Kept sorted for reproducibility.
STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "in", "is", "it", "its", "of", "on", "that", "the", "to",
    "was", "were", "will", "with",
)

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens_col(text: Column) -> Column:
    """Lowercase, split on non-alphanumerics, drop empties."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def ngrams_expr(tokens_sql: str, n: int) -> str:
    """SQL expression string producing the n-gram array for ``tokens_sql``.

    Uses ``sequence``+``transform`` so it stays inside codegen. Returns
    an empty array when the doc has fewer than ``n`` tokens.
    """
    if n == 1:
        return tokens_sql
    joined = ", ".join(f"{tokens_sql}[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN size({tokens_sql}) >= {n} THEN "
        f"transform(sequence(0, size({tokens_sql}) - {n}), i -> concat_ws(' ', {joined})) "
        f"ELSE array() END"
    )


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition when the upstream scan cannot parallelize.

    Fixture parquet files are single-row-group, so the scan is one task
    no matter what ``maxPartitionBytes`` says; for CPU-heavy per-row
    work (hashing, n-gram explode) a round-robin repartition of the raw
    rows is far cheaper than leaving 31 cores idle.

    The probe is ``df.inputFiles()`` (driver-side scan metadata) — NOT
    ``df.rdd.getNumPartitions()``, which forces a plan→RDD conversion
    on every call. A scan backed by ≥ target files is already parallel
    → no-op; frames not backed by a file scan are left alone (their
    partitioning came from a shuffle we shouldn't second-guess). Set
    ``spark.scrappy.ensureParallelism=off`` on clusters where the scan
    layout is known-good to skip even the metadata probe.
    """
    spark = df.sparkSession
    try:
        if spark.conf.get("spark.scrappy.ensureParallelism", "auto") == "off":
            return df
    except Exception:
        pass
    target = min_parts or spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def term_frequencies(
    df: DataFrame,
    text_col: str = "text",
    ngram_range: tuple[int, int] = (1, 3),
    stopwords: tuple[str, ...] = STOPWORDS,
) -> DataFrame:
    """Corpus-wide term frequency over 1..n-grams → (term, freq).

    Stopword policy matches sklearn's: a unigram that IS a stopword is
    dropped; n-grams are built over the stopword-filtered token stream
    (sklearn removes stopwords before n-gram generation).

    Plan shape: ONE scan → per-row concat of all n-gram arrays → one
    explode → partial-agg count (map-side combine absorbs the Zipf head
    before the single shuffle).
    """
    lo, hi = ngram_range
    sw_arr = "array(" + ", ".join(f"'{w}'" for w in stopwords) + ")"
    toks = (
        ensure_parallelism(df.select(F.col(text_col).alias("__text")))
        .select(tokens_col(F.col("__text")).alias("toks"))
        .withColumn(
            "toks", F.expr(f"filter(toks, t -> NOT array_contains({sw_arr}, t))")
        )
    )
    gram_exprs = ", ".join(ngrams_expr("toks", n) for n in range(lo, hi + 1))
    all_grams = f"concat({gram_exprs})" if hi > lo else gram_exprs
    # explode_OUTER + null filter: plain explode infers a guard on the
    # gram concat and pushes it below the ensure_parallelism exchange,
    # re-tokenizing in the serial scan task (ARCHITECTURE.md,
    # "Generate-filter pushdown vs ensure_parallelism").
    return (
        toks.select(F.explode_outer(F.expr(all_grams)).alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )


def top_terms(
    df: DataFrame,
    text_col: str = "text",
    ngram_range: tuple[int, int] = (1, 3),
    k: int = 100,
    stopwords: tuple[str, ...] = STOPWORDS,
) -> DataFrame:
    """A1+A2+A3: frequency-ranked top-k terms with a deterministic
    (freq desc, term asc) tiebreak — the reference's top-100 slice
    (``scrappy.py:372-373``) without its arbitrary tie order."""
    return (
        term_frequencies(df, text_col, ngram_range, stopwords)
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(k)
    )


def drop_subset_terms(candidates: DataFrame, base_term: str, term_col: str = "term") -> DataFrame:
    """A6: drop candidates whose token set ⊆ base term's token set
    (reference DFS pruning, ``scrappy.py:473-485``)."""
    base_arr = "array(" + ", ".join(f"'{t}'" for t in base_term.lower().split()) + ")"
    return candidates.filter(
        F.size(F.array_except(F.split(F.lower(F.col(term_col)), " "), F.expr(base_arr))) > 0
    )


def word_weights(
    topic_words: DataFrame,
    word_col: str = "word",
    weight_col: str = "weight",
    topic_col: str = "topic",
    outlier_topic: int = -1,
    stopwords: tuple[str, ...] = STOPWORDS,
) -> DataFrame:
    """A5: word-cloud weighted aggregation (reference ``scrappy.py:508-517``):
    sum weights across topics, skipping the outlier topic and any word
    containing a stopword token."""
    sw_arr = "array(" + ", ".join(f"'{w}'" for w in stopwords) + ")"
    return (
        topic_words.filter(F.col(topic_col) != outlier_topic)
        .filter(
            F.size(
                F.array_intersect(F.split(F.lower(F.col(word_col)), " "), F.expr(sw_arr))
            )
            == 0
        )
        .groupBy(word_col)
        .agg(F.round(F.sum(weight_col), 6).alias("total_weight"))
    )
