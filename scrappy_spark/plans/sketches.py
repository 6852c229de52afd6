"""Mergeable-sketch aggregations (Apache DataSketches via Spark 4).

The 100 TB aggregation pattern these lock in: build small per-stratum
sketches ONCE (map-side, mergeable, fixed size), then answer any
rollup by merging sketches instead of rescanning rows — distinct
counts (HLL), quantiles (KLL), and set algebra over distinct sets
(theta). Every query computes the exact value in the same pass so the
sketch error is auditable. Raw estimates are engine-specific, so each
sketch query emits the exact values plus BANDED flags (estimate within
the sketch's documented error of the in-pass exact value) that the
DuckDB oracle pins to 1 — a wrong or drifting estimate fails the value
hash instead of hiding behind a rows-only check. The raw estimates
themselves stay bound-asserted in tests (test_llm_ops2.py).
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


#: KLL rank-error band. The default sketch (k=200) guarantees ~1.65%
#: normalized rank error at 99% confidence; ±3% rank leaves headroom.
#: A VALUE band would be wrong — KLL bounds the rank of its answer,
#: not its distance from the exact quantile value.
KLL_RANK_BAND = 0.03


@register(
    "q_kll_quantiles",
    sql="""
    SELECT round(quantile_cont(l_extendedprice, 0.5), 2)  AS exact_p50,
           round(quantile_cont(l_extendedprice, 0.95), 2) AS exact_p95,
           CAST(1 AS BIGINT) AS p50_in_band,
           CAST(1 AS BIGINT) AS p95_in_band
    FROM lineitem
    """,
    doc="KLL quantile sketch over lineitem extended price: p50/p95 "
    "estimates from one mergeable sketch checked against the exact "
    "percentiles from the same scan. At scale the sketch replaces "
    "the full sort/percentile shuffle with a fixed-size state merge. "
    "KLL bounds RANK error (k=200 => ~1.65% normalized rank, 99% "
    "confidence), so the banded flags assert the estimate lands "
    f"between the exact quantiles at p±{KLL_RANK_BAND:.0%} — the "
    "rank-correct formulation of 'within documented error'. The "
    "oracle pins both flags to 1, so a drifting estimate fails the "
    "value hash; the raw estimate values are additionally "
    "bound-asserted in test_llm_ops2.py.",
    tags=("sketch", "approx", "agg"),
)
def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = KLL_RANK_BAND
    agg = li.agg(
        F.kll_sketch_agg_double("l_extendedprice").alias("sk"),
        F.expr(
            "percentile(l_extendedprice,"
            f" array(0.5, 0.95, {0.5 - b}, {0.5 + b}, {0.95 - b}, {0.95 + b}))"
        ).alias("pcts"),
    )
    est = agg.select(
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("est_p50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.95)).alias("est_p95"),
        F.col("pcts")[0].alias("exact_p50"),
        F.col("pcts")[1].alias("exact_p95"),
        F.col("pcts")[2].alias("p50_lo"),
        F.col("pcts")[3].alias("p50_hi"),
        F.col("pcts")[4].alias("p95_lo"),
        F.col("pcts")[5].alias("p95_hi"),
    )
    in_band = lambda e, lo, hi: (  # noqa: E731
        (F.col(e) >= F.col(lo)) & (F.col(e) <= F.col(hi))
    ).cast("long")
    return est.select(
        F.round("exact_p50", 2).alias("exact_p50"),
        F.round("exact_p95", 2).alias("exact_p95"),
        in_band("est_p50", "p50_lo", "p50_hi").alias("p50_in_band"),
        in_band("est_p95", "p95_lo", "p95_hi").alias("p95_in_band"),
    )


#: theta relative-error band. lgK=12 default => RSE ~1.6% per sketch
#: in estimation mode (exact below 4096 retained entries); the
#: intersection estimate compounds both sketches' error, so 5%.
THETA_BAND_PCT = 5.0


@register(
    "q_theta_sketch_overlap",
    sql="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS exact_clickers,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS exact_buyers,
           CAST((SELECT count(*) FROM c JOIN p USING (user_id)) AS BIGINT)
               AS exact_overlap,
           CAST(1 AS BIGINT) AS est_within_band
    """,
    doc="Theta-sketch set algebra: distinct users who clicked vs who "
    "purchased, and the intersection estimated via "
    "theta_sketch_agg + theta_intersection — distinct-set overlap "
    "without a distinct-shuffle join at scale. The exact counts are "
    "computed in the same pass, and a single banded flag (all three "
    f"estimates within {THETA_BAND_PCT:.0f}% of their exact values) "
    "is pinned to 1 by the oracle, so sketch drift fails the value "
    "hash. Raw estimates stay bound-asserted in test_llm_ops2.py.",
    tags=("sketch", "approx", "events"),
)
def q_theta_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    buys = e.filter(F.col("event_type") == "purchase")
    sk = clicks.agg(
        F.theta_sketch_agg("user_id").alias("sk_c"),
        F.count_distinct("user_id").alias("exact_clickers"),
    ).crossJoin(
        buys.agg(
            F.theta_sketch_agg("user_id").alias("sk_p"),
            F.count_distinct("user_id").alias("exact_buyers"),
        )
    )
    exact = (
        clicks.select("user_id")
        .intersect(buys.select("user_id"))
        .agg(F.count("*").alias("exact_overlap"))
    )
    est = sk.crossJoin(exact).select(
        "exact_clickers",
        "exact_buyers",
        "exact_overlap",
        F.theta_sketch_estimate("sk_c").alias("est_c"),
        F.theta_sketch_estimate("sk_p").alias("est_p"),
        F.theta_sketch_estimate(F.expr("theta_intersection(sk_c, sk_p)")).alias(
            "est_o"
        ),
    )
    band = F.lit(THETA_BAND_PCT / 100.0)
    within = lambda est_c, exact_c: F.abs(  # noqa: E731
        F.col(est_c) - F.col(exact_c)
    ) <= band * F.greatest(F.col(exact_c), F.lit(1)).cast("double")
    return est.select(
        "exact_clickers",
        "exact_buyers",
        "exact_overlap",
        (
            within("est_c", "exact_clickers")
            & within("est_p", "exact_buyers")
            & within("est_o", "exact_overlap")
        )
        .cast("long")
        .alias("est_within_band"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (deterministic -> full oracle, unlike HLL/KLL)
# ---------------------------------------------------------------------------

from ..operators import cms as CMS

_CMS_RAW_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

_CMS_SQL = f"""
    t AS (SELECT unnest({_CMS_RAW_TOKS}) AS tok FROM documents),
    cells AS (SELECT r, ((CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                          + r * (CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) | 1))
                         % {CMS.CMS_WIDTH}) AS pos
              FROM t, (SELECT unnest(range(0, {CMS.CMS_DEPTH})) AS r) d),
    grid AS (SELECT r, pos, CAST(count(*) AS BIGINT) AS cnt
             FROM cells GROUP BY r, pos),
    exact AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
              FROM t GROUP BY tok),
    probe AS (SELECT tok FROM exact ORDER BY exact_count DESC, tok LIMIT 40),
    ppos AS (SELECT tok, r, ((CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                              + r * (CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) | 1))
                             % {CMS.CMS_WIDTH}) AS pos
             FROM probe, (SELECT unnest(range(0, {CMS.CMS_DEPTH})) AS r) d),
    est AS (SELECT tok, CAST(min(coalesce(grid.cnt, 0)) AS BIGINT) AS cms_est
            FROM ppos LEFT JOIN grid USING (r, pos)
            GROUP BY tok)
"""


@register(
    "q_cms_heavy_hitters",
    sql=f"""
    WITH {_CMS_SQL}
    SELECT est.tok, exact.exact_count, est.cms_est,
           CAST(est.cms_est - exact.exact_count AS BIGINT) AS overcount
    FROM est JOIN exact USING (tok)
    """,
    doc="Count-min sketch over the corpus token stream (4x1024 grid, "
    "md5 double hashing), probed at the top-40 tokens beside their "
    "exact counts. The CMS is a DETERMINISTIC approximation -- "
    "min-of-counters never undercounts, and every cell reproduces "
    "bit-for-bit cross-engine -- so unlike the HLL/KLL estimates this "
    "sketch query takes the full value-hash gate, overcount column "
    "included. Build is one partial-agg groupBy to <= d*w cells; "
    "probe broadcasts the grid.",
    tags=("sketch", "approx", "agg"),
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mining import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
    grid = CMS.cms_build(toks, "tok")
    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_count"))
    probe = exact.orderBy(F.desc("exact_count"), F.asc("tok")).limit(40).select("tok")
    est = CMS.cms_estimate(probe, grid, "tok")
    return (
        est.join(exact, "tok")
        .select(
            "tok",
            "exact_count",
            "cms_est",
            (F.col("cms_est") - F.col("exact_count")).alias("overcount"),
        )
    )
