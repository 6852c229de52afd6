"""Mergeable-sketch aggregations (Apache DataSketches via Spark 4).

The 100 TB aggregation pattern these lock in: build small per-stratum
sketches ONCE (map-side, mergeable, fixed size), then answer any
rollup by merging sketches instead of rescanning rows — distinct
counts (HLL), quantiles (KLL), and set algebra over distinct sets
(theta). Every query computes the exact value in the same pass so the
sketch error is auditable. Raw estimates are engine-specific, so the
KLL/theta queries stay rows-only with the estimate beside the exact
column and tests asserting the bounds; the HLL rollup instead emits a
BANDED flag the DuckDB oracle pins to 1, promoting it to the full
value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .registry import register


#: relative-error band the merged-HLL estimate must sit in (lgK=12
#: default sketch ⇒ ~1.6% RSE; 2% leaves headroom without going weak)
HLL_BAND_PCT = 2.0


@register(
    "q_hll_union_rollup",
    sql=f"""
    SELECT CAST(sum(cnt) AS BIGINT)   AS exact_total,
           CAST(count(*) AS BIGINT)   AS n_sketches,
           CAST(1 AS BIGINT)          AS est_within_band
    FROM (SELECT source, count(DISTINCT doc_id) AS cnt
          FROM documents GROUP BY source)
    """,
    doc="Mergeable HLL rollup: per-source HLL sketches of the doc-id "
    "population, merged with hll_union_agg for the corpus-wide "
    "distinct estimate — the build-once/merge-anywhere sketch pattern "
    "(per-partition sketches at 100 TB, any rollup without rescanning). "
    "The estimate itself is engine-specific, so the query emits a "
    f"banded flag (within {HLL_BAND_PCT}% of the in-pass exact count) "
    "that the oracle pins to 1 — a wrong or drifting estimate now fails "
    "the value hash instead of hiding behind a rows-only check.",
    tags=("sketch", "approx", "agg"),
)
def q_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.hll_sketch_agg("doc_id").alias("sk"),
        F.count_distinct("doc_id").alias("exact_distinct"),
    )
    rolled = per_source.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total"),
        F.sum("exact_distinct").alias("exact_total"),  # doc_id unique per source
        F.count("*").alias("n_sketches"),
    )
    band = F.lit(HLL_BAND_PCT / 100.0)
    return rolled.select(
        "exact_total",
        "n_sketches",
        (
            F.abs(F.col("est_total") - F.col("exact_total"))
            <= band * F.col("exact_total")
        )
        .cast("long")
        .alias("est_within_band"),
    )


@register(
    "q_kll_quantiles",
    sql=None,  # sketch estimates are engine-specific; exact column audits
    doc="KLL quantile sketch over lineitem extended price: p50/p95 "
    "estimates from one mergeable sketch beside the exact "
    "percentiles from the same scan. At scale the sketch replaces "
    "the full sort/percentile shuffle with a fixed-size state merge. "
    "Test asserts rank error within the sketch's documented bound.",
    tags=("sketch", "approx", "agg"),
)
def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.kll_sketch_agg_double("l_extendedprice").alias("sk"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact_p95"),
    )
    return agg.select(
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 2).alias("est_p50"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.95)), 2).alias("est_p95"),
        F.round("exact_p50", 2).alias("exact_p50"),
        F.round("exact_p95", 2).alias("exact_p95"),
    )


@register(
    "q_theta_sketch_overlap",
    sql=None,  # sketch estimates are engine-specific; exact column audits
    doc="Theta-sketch set algebra: distinct users who clicked vs who "
    "purchased, and the intersection estimated via "
    "theta_sketch_agg + intersection — distinct-set overlap without "
    "a distinct-shuffle join at scale. Exact intersection computed "
    "in-pass as the audit; test asserts <5% relative error.",
    tags=("sketch", "approx", "events"),
)
def q_theta_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    buys = e.filter(F.col("event_type") == "purchase")
    sk = clicks.agg(F.theta_sketch_agg("user_id").alias("sk_c")).crossJoin(
        buys.agg(F.theta_sketch_agg("user_id").alias("sk_p"))
    )
    exact = (
        clicks.select("user_id")
        .intersect(buys.select("user_id"))
        .agg(F.count("*").alias("exact_overlap"))
    )
    return sk.crossJoin(exact).select(
        F.theta_sketch_estimate(F.expr("theta_intersection(sk_c, sk_p)")).alias(
            "est_overlap"
        ),
        "exact_overlap",
        F.theta_sketch_estimate("sk_c").alias("est_clickers"),
        F.theta_sketch_estimate("sk_p").alias("est_buyers"),
    )
