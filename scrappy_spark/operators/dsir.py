"""DSIR-style data selection: hashed n-gram importance weights plus a
deterministic resampling rule.

Data Selection via Importance Resampling (Xie et al., 2023, public
arXiv 2302.03169) scores every raw-corpus document by how much more
likely its hashed n-gram features are under a small target-domain
bag-of-ngrams model than under the raw-corpus model, then resamples
with Gumbel-perturbed weights. This module is the Spark-native
spelling of that recipe:

- features: unigrams + bigrams (multiset — counts matter), hashed into
  ``n_buckets`` via md5, so the feature space is fixed-width no matter
  the vocabulary;
- the two bucket histograms are partial-aggregated (``groupBy(bucket)``
  outputs ≤ n_buckets rows each — bytes, not data-scale) and the
  add-one-smoothed log-likelihood-ratio vector joins back as a
  BROADCAST, so scoring is one explode + one shuffle keyed by doc_id;
- selection is a scan-side threshold on the Gumbel-perturbed weight
  (``w + g_doc > tau``), zero extra shuffles; g_doc is derived from
  md5(doc_id), so the "random" draw is reproducible bit-for-bit in any
  engine with the same md5/ln (the declared-query oracle re-derives it
  in DuckDB).

At 100 TB: nothing here materializes more than n_buckets rows outside
the corpus scan itself; the only wide exchange is the per-doc score
aggregation, proportional to corpus size with tiny rows.

Reference parity: none — the reference (scrappy.py) selects data only
by exact predicate filters (article_querry.py:13-28); importance-based
selection is an engine extension for training-data curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .mining import ensure_parallelism, ngrams_expr, tokens_col

#: feature-hash buckets; 2^8 keeps the fixture histograms dense enough
#: to exercise smoothing while the production default would be ~10k.
DSIR_BUCKETS = 256

#: salt for the per-document Gumbel draw, so it is independent of any
#: other md5(doc_id) use in the engine.
DSIR_GUMBEL_SALT = "dsir-g1:"

_TWO32 = float(1 << 32)


def feature_bucket(feature: Column, n_buckets: int = DSIR_BUCKETS) -> Column:
    """Hash a feature string to a stable bucket in [0, n_buckets)."""
    return F.conv(F.substring(F.md5(feature), 1, 8), 16, 10).cast("long") % F.lit(
        n_buckets
    )


def doc_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, bucket) rows — one per unigram/bigram OCCURRENCE (multiset:
    repeated features count, unlike the dedup shingle path)."""
    toks = tokens_col(F.col(text_col))
    return (
        ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), toks.alias("toks"))
        # explode_OUTER + null filter on the GENERATED column: plain
        # explode infers a size/isnotnull guard on the feature array
        # and pushes it below the repartition exchange, re-running the
        # n-gram build in the serial scan task (ARCHITECTURE.md,
        # "Generate-filter pushdown vs ensure_parallelism").
        .select(
            id_col,
            F.explode_outer(
                F.concat(F.expr(ngrams_expr("toks", 1)), F.expr(ngrams_expr("toks", 2)))
            ).alias("feature"),
        )
        .filter(F.col("feature").isNotNull())
        .select(id_col, feature_bucket(F.col("feature")).alias("bucket"))
    )


def log_ratio_table(
    feats: DataFrame,
    is_target: Column,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-bucket log((t_b+1)/(T+B)) - log((r_b+1)/(R+B)).

    ``feats`` is the (id, bucket) occurrence frame; ``is_target`` marks
    the target-domain rows. Both histograms and both totals come out of
    ONE groupBy over ≤ n_buckets keys (conditional sums), then the
    scalar totals ride along via a window-free cross join of the 1-row
    total frame — everything after the partial agg is ≤ n_buckets rows.
    """
    hist = feats.groupBy("bucket").agg(
        F.count("*").cast("long").alias("r_cnt"),
        F.sum(F.when(is_target, 1).otherwise(0)).cast("long").alias("t_cnt"),
    )
    totals = hist.agg(
        F.sum("r_cnt").cast("long").alias("r_tot"),
        F.sum("t_cnt").cast("long").alias("t_tot"),
    )
    b = F.lit(float(n_buckets))
    return (
        hist.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("t_cnt") + 1.0) / (F.col("t_tot") + b))
                - F.log((F.col("r_cnt") + 1.0) / (F.col("r_tot") + b))
            ).alias("log_ratio"),
        )
    )


def gumbel_noise(id_col: Column, salt: str = DSIR_GUMBEL_SALT) -> Column:
    """Deterministic standard-Gumbel draw from md5(salt || id).

    u = (h + 0.5) / 2^32 with h the first 32 md5 bits — strictly inside
    (0, 1), so -ln(-ln(u)) is always finite.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8), 16, 10
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(_TWO32)
    return -F.log(-F.log(u))


def dsir_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    is_target: Column,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document importance weight = sum of its features' log ratios.

    Returns (id, n_feats, weight). One explode + one broadcast join +
    one shuffle keyed by ``id_col``.
    """
    # Carry the target flag THROUGH the explode (one boolean per row)
    # instead of joining a per-doc flag frame onto the occurrence
    # stream, and partial-aggregate the occurrences to (id, flag,
    # bucket) counts immediately. Both consumers below — the ≤n_buckets
    # histogram and the per-doc scoring join — branch off this ONE
    # identical aggregate, so the expensive tokenize+explode+md5 pass
    # runs once (runtime exchange reuse; the old shape evaluated it
    # twice because the histogram side carried a flag join the scoring
    # side lacked). The scoring shuffle now moves distinct (id, bucket)
    # counts, not every occurrence.
    toks = tokens_col(F.col(text_col))
    counts = (
        ensure_parallelism(
            df.select(F.col(id_col), F.col(text_col), is_target.alias("__is_t"))
        )
        .select(F.col(id_col), "__is_t", toks.alias("toks"))
        # explode_outer + null filter: see doc_features
        .select(
            id_col,
            "__is_t",
            F.explode_outer(
                F.concat(F.expr(ngrams_expr("toks", 1)), F.expr(ngrams_expr("toks", 2)))
            ).alias("feature"),
        )
        .filter(F.col("feature").isNotNull())
        .select(id_col, "__is_t", feature_bucket(F.col("feature")).alias("bucket"))
        .groupBy(id_col, "__is_t", "bucket")
        .agg(F.count("*").cast("long").alias("__cnt"))
    )
    hist = counts.groupBy("bucket").agg(
        F.sum("__cnt").cast("long").alias("r_cnt"),
        F.sum(F.when(F.col("__is_t"), F.col("__cnt")).otherwise(0))
        .cast("long")
        .alias("t_cnt"),
    )
    totals = hist.agg(
        F.sum("r_cnt").cast("long").alias("r_tot"),
        F.sum("t_cnt").cast("long").alias("t_tot"),
    )
    b = F.lit(float(n_buckets))
    ratios = hist.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("t_cnt") + 1.0) / (F.col("t_tot") + b))
            - F.log((F.col("r_cnt") + 1.0) / (F.col("r_tot") + b))
        ).alias("log_ratio"),
    )
    return (
        counts.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").cast("long").alias("n_feats"),
            F.sum(F.col("__cnt") * F.col("log_ratio")).alias("weight"),
        )
    )


def dsir_select(
    weights: DataFrame,
    id_col: str,
    tau: float,
    salt: str = DSIR_GUMBEL_SALT,
) -> DataFrame:
    """Gumbel-perturbed threshold selection: keep rows where
    ``weight + g > tau``. Equivalent in expectation to importance
    resampling with replacement probability ∝ softmax(weight) as
    tau sweeps; fully scan-side (no shuffle, no global sort), which is
    the form that survives 100 TB — Gumbel TOP-K (an ordered limit)
    is the alternative when an exact output count is required.
    """
    g = gumbel_noise(F.col(id_col), salt)
    return weights.withColumn("gumbel_key", F.col("weight") + g).withColumn(
        "selected", (F.col("gumbel_key") > F.lit(tau)).cast("int")
    )
