"""Hypertable-style time-series operators over the events table:
gap-filled resampling with last-observation-carried-forward, fixed-
range histograms, rank-based quantile normalization, and incremental
aggregate maintenance (combine partial states instead of recomputing
from raw history).

These extend the reference's date handling (its only time operations
are a literal fetch date column and a year-equality filter,
scrappy.py:204,385) to the continuous-aggregate surface a telemetry /
training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import load_table
from ..operators.incremental import aggregate_state, merge_agg_states
from .registry import register

#: fixed-point cents for value sums — integer, associative, hash-stable
#: across engines and shuffle orders (see registry docstring).
_CENTS = "CAST(round(value * 100) AS BIGINT)"


@register(
    "q_gapfill_locf",
    sql="""
    WITH ranked AS (
        SELECT user_id, date_trunc('hour', ts) AS hour, value,
               row_number() OVER (
                   PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ),
    per_hour AS (SELECT user_id, hour, value FROM ranked WHERE rn = 1),
    span AS (
        SELECT user_id, min(hour) AS h0, max(hour) AS h1
        FROM per_hour GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM span
    )
    SELECT g.user_id, g.hour,
           last_value(p.value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_filled,
           CAST(p.value IS NOT NULL AS BIGINT) AS observed
    FROM grid g LEFT JOIN per_hour p
      ON p.user_id = g.user_id AND p.hour = g.hour
    """,
    doc="Gap-filled hourly resample with LOCF (TimescaleDB "
    "time_bucket_gapfill + locf shape): latest event per (user, hour) "
    "— deterministic tie-break on (ts, event_id) — an hourly grid per "
    "user spanning that user's own observed range (sequence + explode, "
    "per-user bounded), left join, then last-non-null over an hour-"
    "ordered per-user window. Every stage is partitioned by user_id: "
    "one shuffle, no global sort, grid size bounded by span×users.",
    tags=("timeseries", "window"),
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = e.withColumn("hour", F.date_trunc("hour", F.col("ts")))
    w_pick = Window.partitionBy("user_id", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    per_hour = (
        hourly.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("user_id", "hour", "value")
    )
    grid = (
        per_hour.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(per_hour, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.last("value", ignorenulls=True).over(w_fill).alias("value_filled"),
            F.col("value").isNotNull().cast("long").alias("observed"),
        )
    )


@register(
    "q_value_histogram",
    sql=f"""
    SELECT CAST(least(greatest(floor(value / 25.0), 0), 19) AS BIGINT) AS bin,
           CAST(least(greatest(floor(value / 25.0), 0), 19) * 25 AS BIGINT)
               AS bin_lo,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CENTS}) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY 1, 2
    """,
    doc="Fixed-range histogram (20 bins of width 25 over [0, 500), "
    "clamped): single scan + one partial-agg shuffle of ≤20 rows. The "
    "bin expression is explicit floor math rather than width_bucket so "
    "both engines share edge semantics exactly; sums are fixed-point "
    "cents (integer, shuffle-order-proof).",
    tags=("timeseries", "agg"),
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / 25.0), F.lit(0)), F.lit(19)
    )
    return (
        e.groupBy(
            bin_.cast("long").alias("bin"),
            (bin_ * 25).cast("long").alias("bin_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(_CENTS)).cast("long").alias("sum_cents"),
        )
    )


@register(
    "q_quantile_normalize",
    sql="""
    SELECT event_id, event_type,
           round(percent_rank() OVER (PARTITION BY event_type ORDER BY value), 9)
               AS pr,
           CAST(ntile(10) OVER (
               PARTITION BY event_type ORDER BY value, event_id
           ) AS BIGINT) AS decile
    FROM events
    """,
    doc="Rank-based quantile normalization per event_type: percent_rank "
    "(ties share a rank; the (rank-1)/(n-1) rational is computed "
    "identically by both engines) plus ntile(10) deciles with a total "
    "order (value, event_id) so tile assignment is deterministic. One "
    "shuffle on event_type; per-group sort is the cost — at heavy skew "
    "salt the group or pre-bucket by value range.",
    tags=("timeseries", "window"),
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w_pr = Window.partitionBy("event_type").orderBy("value")
    w_nt = Window.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w_pr), 9).alias("pr"),
        F.ntile(10).over(w_nt).cast("long").alias("decile"),
    )


@register(
    "q_agg_increment",
    sql=f"""
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CENTS}) AS BIGINT) AS value_cents_sum,
           max(ts) AS ts_max
    FROM events
    GROUP BY user_id, event_type
    """,
    doc="Incremental aggregate maintenance: history (ts < 2024-01-15) "
    "and the new batch (ts >= 2024-01-15) are aggregated into partial "
    "states independently, then combined key-wise with "
    "operators/incremental.py::merge_agg_states — a full-outer join of "
    "two aggregate-sized tables, never a rescan of raw history. The "
    "oracle is the full recompute over everything; hash-equality IS the "
    "refresh-correctness proof (states are integer cents, so the "
    "combine is exact).",
    tags=("timeseries", "incremental", "agg"),
)
def q_agg_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "value_cents", F.expr(_CENTS)
    )
    split = F.lit("2024-01-15").cast("timestamp")
    keys = ["user_id", "event_type"]
    base = aggregate_state(
        e.filter(F.col("ts") < split), keys,
        sum_cols=["value_cents"], max_cols=["ts"],
    )
    delta = aggregate_state(
        e.filter(F.col("ts") >= split), keys,
        sum_cols=["value_cents"], max_cols=["ts"],
    )
    return merge_agg_states(base, delta, keys).select(
        "user_id",
        "event_type",
        "n",
        F.col("value_cents_sum"),
        F.col("ts_max"),
    )


# ---------------------------------------------------------------------------
# Robust median/MAD anomaly screen
# ---------------------------------------------------------------------------


@register(
    "q_robust_anomalies",
    sql=f"""
    WITH c AS (SELECT event_id, event_type,
                      CAST(hour(ts) AS BIGINT) AS hr,
                      {_CENTS} AS v_cents
               FROM events WHERE value IS NOT NULL),
    m AS (SELECT event_type, hr, quantile_cont(v_cents, 0.5) AS med
          FROM c GROUP BY 1, 2),
    d AS (SELECT c.event_id, c.event_type, c.hr, c.v_cents, m.med,
                 CAST(abs(4 * c.v_cents - CAST(4 * m.med AS BIGINT))
                      AS BIGINT) AS dev4
          FROM c JOIN m USING (event_type, hr)),
    md AS (SELECT event_type, hr,
                  CAST(2 * quantile_cont(dev4, 0.5) AS BIGINT) AS mad8
           FROM d GROUP BY 1, 2)
    SELECT d.event_id, d.event_type, d.hr, d.v_cents,
           CAST(2 * d.med AS BIGINT) AS med2, d.dev4, md.mad8
    FROM d JOIN md USING (event_type, hr)
    WHERE 2 * d.dev4 > 3 * md.mad8
    """,
    doc="Robust outlier screen over events: values more than 3 MADs "
    "from their (event_type, hour-of-day) median, INTEGER-EXACT — "
    "over integer cents the interpolated median is dyadic (k/2) and "
    "the MAD k/4, so dev4 = |4v − 4·med| and mad8 = 2·median(dev4) "
    "are exact BIGINTs and the 2·dev4 > 3·mad8 rule is pure integer "
    "comparison, hash-identical across engines (operators/"
    "profile.py::robust_anomalies). The heavy-tail-proof screen a "
    "z-score can't be: the outliers being hunted inflate a stddev "
    "but not a median.",
    tags=("timeseries", "quality", "agg"),
)
def q_robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import robust_anomalies

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = e.select(
        "event_id",
        "event_type",
        F.hour("ts").cast("long").alias("hr"),
        F.expr(_CENTS).alias("v_cents"),
    )
    out = robust_anomalies(c, ["event_type", "hr"], cents_col="v_cents", k_mad=3)
    return out.select(
        "event_id", "event_type", "hr", "v_cents", "med2", "dev4", "mad8"
    )


_CUSUM_K = 1500  # per-step slack, cents
_CUSUM_H = 15000  # alarm threshold, cents


@register(
    "q_cusum_shift",
    sql=f"""
    WITH c AS (SELECT user_id, event_id, ts, {_CENTS} AS v
               FROM events WHERE value IS NOT NULL),
    g AS (SELECT user_id, event_id, v,
                 CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
                 CAST(sum(v) OVER (PARTITION BY user_id) AS BIGINT) AS s,
                 CAST(row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                      AS BIGINT) AS seq
          FROM c),
    cs AS (SELECT user_id, event_id, v, seq, n,
                  CAST(sum(n * v - s - n * {_CUSUM_K}) OVER w
                       AS BIGINT) AS cp,
                  CAST(sum(n * v - s + n * {_CUSUM_K}) OVER w
                       AS BIGINT) AS cn
           FROM g
           WINDOW w AS (PARTITION BY user_id ORDER BY seq
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)),
    st AS (SELECT user_id, event_id, v, seq, n,
                  CAST(cp - least(min(cp) OVER w2, 0) AS BIGINT) AS s_pos,
                  CAST(greatest(max(cn) OVER w2, 0) - cn AS BIGINT)
                      AS s_neg
           FROM cs
           WINDOW w2 AS (PARTITION BY user_id ORDER BY seq
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW))
    SELECT user_id, event_id, v AS value_int, seq, n, s_pos, s_neg,
           CAST(s_pos > n * {_CUSUM_H} AS BIGINT) AS alarm_pos,
           CAST(s_neg > n * {_CUSUM_H} AS BIGINT) AS alarm_neg
    FROM st
    """,
    doc="Two-sided Page CUSUM level-shift detection per user over the "
    "events stream (operators/profile.py::cusum_changepoints), "
    "INTEGER-EXACT end to end: the textbook recursion max(0, S+(x-"
    "mu-k)) is rewritten to its closed window form S+ = C - min(0, "
    "running_min(C)) (C = running sum of deviations), the non-integer "
    "group mean mu is eliminated by scaling every term by the group "
    "size n (d = n*x - sum - n*k), and the alarm compare S > n*h is "
    "pure BIGINT. One partition-ordered window pass, no fold, no UDF, "
    "no join — the same shape the oracle runs. Slack k=1500 cents, "
    "threshold h=15000 cents; positive AND negative alarms both fire on the "
    "right-skewed fixture (1000+ and 205- at sf0.01), so every flag branch is hashed.",
    tags=("timeseries", "quality", "window"),
)
def q_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import cusum_changepoints

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", F.expr(_CENTS).alias("v_cents"))
    )
    out = cusum_changepoints(
        e,
        "v_cents",
        order_cols=["ts", "event_id"],
        group_cols=["user_id"],
        slack=_CUSUM_K,
        threshold=_CUSUM_H,
    )
    return out.select(
        "user_id",
        "event_id",
        "value_int",
        "seq",
        "n",
        "s_pos",
        "s_neg",
        "alarm_pos",
        "alarm_neg",
    )
