"""Event-table declared queries: JSON extraction and the batch twins of
the streaming window operators (SURVEY.md §2.9).

The streaming module (``scrappy_spark.streaming``) runs the same logic
through ``readStream`` with watermarks; these batch formulations are the
DuckDB-checkable contracts for the window semantics. Spark's ``window()``
buckets align to the Unix epoch, so the oracle reproduces them with
epoch arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import load_table
from .registry import register


@register(
    "q_json_extract",
    sql="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
    doc="§2.6 JSON field access (reference data.get(...) chains, e.g. "
    "scrappy.py:100,112,183) — get_json_object over the props payload.",
    tags=("scalar", "json"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@register(
    "q_map_funcs",
    sql="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS BIGINT)                 AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',')     AS keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT)     AS k_val
    FROM events WHERE event_id < 200
    """,
    doc="Map-typed column surface: from_json to map<string,bigint>, "
    "key enumeration, size, element access. Keys are joined to a flat "
    "string because the driver's canonicalizer (pandas sort + hash) "
    "cannot handle array-typed cells.",
    tags=("scalar", "json", "map"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.size(m).cast("long").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys"),
        m.getItem("k").alias("k_val"),
    )


@register(
    "q_variant_extract",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT)   AS k_val,
           json_extract_string(props, '$.s')                   AS s_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod
    FROM events
    WHERE event_id < 500
    """,
    doc="Spark 4 VARIANT path for semi-structured data: parse_json "
    "once into a binary variant, then typed variant_get extractions — "
    "the modern replacement for repeated get_json_object string "
    "re-parses (one parse per row instead of one per field). Output "
    "is atomic-typed; the oracle reads the same paths with DuckDB's "
    "JSON extraction.",
    tags=("scalar", "json", "variant"),
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.variant_get(v, "$.s", "string").alias("s_val"),
        (k % 7).alias("k_mod"),
    )


@register(
    "q_tumbling_window_agg",
    sql="""
    SELECT date_trunc('hour', ts) AS w_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Tumbling 1h window aggregate — batch twin of the streaming "
    "windowed agg; Spark window(ts, '1 hour') start == date_trunc('hour').",
    tags=("window", "streaming-twin"),
)
def q_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events", "sum_value")
    )


@register(
    "q_sliding_window_agg",
    sql="""
    WITH slid AS (
        SELECT make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000)
               AS w_start, value FROM events
        UNION ALL
        SELECT make_timestamp(CAST((floor(epoch(ts) / 300) - 1) * 300 AS BIGINT) * 1000000)
               AS w_start, value FROM events
    )
    SELECT w_start, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM slid GROUP BY w_start
    """,
    doc="Sliding window (10 min length, 5 min slide): each event lands in "
    "two windows; oracle reproduces Spark's epoch-aligned window starts.",
    tags=("window", "streaming-twin"),
)
def q_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "n_events", "sum_value")
    )


@register(
    "q_session_window_agg",
    sql="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events),
    sessions AS (
        SELECT user_id, ts, value,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged)
    SELECT user_id, session_id, min(ts) AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Sessionization (30 min gap) via lag + cumulative-sum windows — "
    "batch twin of session_window / applyInPandasWithState.",
    tags=("window", "streaming-twin", "session"),
)
def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w))
    flagged = e.withColumn(
        "is_new", F.when(gap_us > 1800 * 1_000_000, 1).otherwise(0)
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(wsum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "q_funnel_stages",
    sql="""
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id AND e.ts >= v.t1
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id AND e.ts >= c.t2
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase
    """,
    doc="Ordered funnel (view → click → purchase): each stage keeps "
    "users whose stage event occurs at-or-after their previous stage's "
    "first event. Every stage aggregates and joins on user_id, so the "
    "three shuffles share one partitioning (co-partitioned joins; no "
    "re-exchange between stages at scale).",
    tags=("events", "funnel", "agg"),
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def stage(event_type: str, prev: DataFrame | None, prev_t: str, t: str) -> DataFrame:
        s = e.filter(F.col("event_type") == event_type)
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("ts") >= F.col(prev_t))
        return s.groupBy("user_id").agg(F.min("ts").alias(t))

    v = stage("view", None, "", "t1")
    c = stage("click", v, "t1", "t2")
    p = stage("purchase", c, "t2", "t3")
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase")))
    )


@register(
    "q_retention_cohorts",
    sql="""
    WITH firsts AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort
                    FROM events GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events)
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, a.day) AS BIGINT) AS day_offset,
           count(*) AS n_active
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort, day_offset
    """,
    doc="Retention cohorts: first-active day per user × activity-day "
    "offset matrix. Two aggregation shuffles (first-day per user; "
    "distinct user-days) feed a join where the per-user firsts side "
    "is user-cardinality — broadcastable up to huge user counts; the "
    "final (cohort, offset) key is low-cardinality and combines "
    "map-side before its exchange.",
    tags=("events", "retention", "agg"),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.min(day).alias("cohort"))
    activity = e.select("user_id", day.alias("day")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy("cohort", F.datediff("day", "cohort").cast("long").alias("day_offset"))
        .agg(F.count("*").alias("n_active"))
    )


@register(
    "q_time_weighted_avg",
    sql="""
    WITH spans AS (
        SELECT user_id, value,
               epoch_us(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)) - epoch_us(ts) AS dur
        FROM events)
    SELECT user_id,
           round(CAST(sum(CAST(round(value * dur) AS BIGINT)) AS DOUBLE)
                 / CAST(sum(dur) AS DOUBLE), 4) AS twap,
           CAST(count(*) AS BIGINT) AS n_spans
    FROM spans WHERE dur IS NOT NULL AND dur > 0
    GROUP BY user_id
    """,
    doc="Time-weighted average (TWAP): each reading weighted by how "
    "long it was current (duration to the next event via lead), the "
    "correct aggregate for irregularly-sampled series where plain avg "
    "over-weights bursts. One user_id sort-shuffle shared by the "
    "window and the aggregation. Durations are integer MICROSECONDS "
    "(events carry sub-second timestamps; whole-second truncation "
    "would skew the weights) and the value·duration numerator sums "
    "fixed-point so shuffle order can't move the final rounding.",
    tags=("events", "window", "temporal"),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dur")
    spans = e.select("user_id", "value", dur).filter(
        F.col("dur").isNotNull() & (F.col("dur") > 0)
    )
    num = F.sum(F.round(F.col("value") * F.col("dur")).cast("long"))
    return spans.groupBy("user_id").agg(
        F.round(num.cast("double") / F.sum("dur").cast("double"), 4).alias("twap"),
        F.count("*").cast("long").alias("n_spans"),
    )


@register(
    "q_safe_cast_quality",
    sql="""
    SELECT ok, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(coalesce(k_val, 0) AS BIGINT)) AS BIGINT) AS k_total
    FROM (
        SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL AS ok
        FROM events)
    GROUP BY ok
    """,
    doc="Robust-ingestion surface: try_cast partitions rows into "
    "parseable/unparseable instead of failing the job on the first "
    "malformed value — the data-quality triage every 100 TB ingest "
    "needs (ANSI mode would abort; silent cast would null without a "
    "count). Scan-only plus one tiny agg.",
    tags=("scalar", "quality", "json"),
)
def q_safe_cast_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return (
        e.select(k.alias("k_val"), k.isNotNull().alias("ok"))
        .groupBy("ok")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.coalesce(F.col("k_val"), F.lit(0))).cast("long").alias("k_total"),
        )
    )


@register(
    "q_event_transitions",
    sql="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events)
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    doc="Behavioral transition matrix (Markov bigrams): per-user "
    "event-sequence successor via lead(), then a global pair count. "
    "One sort-shuffle on user_id for the window; the (type, next) key "
    "is tiny and combines map-side.",
    tags=("events", "window", "agg"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_view_click_attribution",
    sql="""
    WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
          FROM events WHERE event_type = 'click')
    SELECT v.user_id, v.view_id, v.view_ts, c.click_id, c.click_ts,
           date_diff('second', v.view_ts, c.click_ts) AS delay_sec
    FROM v JOIN c ON v.user_id = c.user_id
     AND c.click_ts >= v.view_ts
     AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE
    """,
    doc="View→click attribution: interval join of two event streams on "
    "user within a 10-minute delay bound — batch twin of the "
    "watermarked stream-stream join (streaming/joins.py; state bounded "
    "by watermark + max_delay). One shuffle on user_id.",
    tags=("join", "streaming-twin", "events"),
)
def q_view_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import view_click_attribution

    e = load_table(spark, sf_dir, "events")
    return view_click_attribution(e, max_delay="10 minutes")


@register(
    "q_view_click_attribution_outer",
    sql="""
    WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
          FROM events WHERE event_type = 'click')
    SELECT v.user_id, v.view_id, v.view_ts, c.click_id, c.click_ts,
           date_diff('second', v.view_ts, c.click_ts) AS delay_sec
    FROM v LEFT JOIN c ON v.user_id = c.user_id
     AND c.click_ts >= v.view_ts
     AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE
    """,
    doc="Left-outer view→click attribution: every view, with its "
    "in-window clicks or NULLs — the conversion-rate denominator. "
    "Batch twin of the watermarked stream-stream LEFT OUTER interval "
    "join (streaming/joins.py; unmatched views emit once the watermark "
    "proves no click can still arrive), completing the join-mode "
    "matrix over the events fixtures.",
    tags=("join", "streaming-twin", "events"),
)
def q_view_click_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import view_click_attribution

    e = load_table(spark, sf_dir, "events")
    return view_click_attribution(e, max_delay="10 minutes", how="left_outer")


@register(
    "q_view_click_attribution_full",
    sql="""
    WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
          FROM events WHERE event_type = 'click')
    SELECT coalesce(v.user_id, c.user_id) AS user_id,
           v.view_id, v.view_ts, c.click_id, c.click_ts,
           date_diff('second', v.view_ts, c.click_ts) AS delay_sec
    FROM v FULL JOIN c ON v.user_id = c.user_id
     AND c.click_ts >= v.view_ts
     AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE
    """,
    doc="Full-outer view→click attribution: unconverted views AND "
    "orphan clicks (no view in the preceding 10 minutes) in one pass — "
    "batch twin of the watermarked stream-stream FULL OUTER interval "
    "join (streaming/joins.py coalesces the key from whichever side "
    "matched), completing the interval-join mode matrix.",
    tags=("join", "streaming-twin", "events"),
)
def q_view_click_attribution_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import view_click_attribution

    e = load_table(spark, sf_dir, "events")
    return view_click_attribution(e, max_delay="10 minutes", how="full_outer")


# --------------------------------------------------------------------------
# Graph: PageRank over the page-transition graph
# --------------------------------------------------------------------------

def _pagerank_sql(n_iter: int = 3, unit: int = 10**12) -> str:
    base = (15 * unit) // 100
    k_page = "CAST(json_extract_string(props, '$.k') AS BIGINT)"
    iters = []
    for i in range(1, n_iter + 1):
        iters.append(f"""
    r{i} AS (
        SELECT n.node,
               CAST({base} + (85 * COALESCE(s.in_mass, 0)) // 100
                    AS BIGINT) AS rank_units
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node,
                   sum((r.rank_units * e.w) // o.out_w) AS in_mass
            FROM edges e
            JOIN outw o ON o.src = e.src
            JOIN r{i - 1} r ON r.node = e.src
            GROUP BY 1) s ON s.node = n.node)""")
    return f"""
    WITH seq AS (
        SELECT user_id, {k_page} AS src,
               lead({k_page}) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
        FROM events),
    edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
              FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w
             FROM edges GROUP BY 1),
    r0 AS (SELECT node, CAST({unit} AS BIGINT) AS rank_units FROM nodes),
    {",".join(iters)}
    SELECT node, rank_units,
           CAST(rank_units AS DOUBLE) / {unit} AS rank
    FROM r{n_iter}
    """


@register(
    "q_pagerank_pages",
    sql=_pagerank_sql(3),
    doc="Weighted PageRank over the page-transition graph (nodes = "
    "props.k pages, edges = per-user consecutive visits, weight = "
    "transition count). INTEGER-EXACT power iteration — rank units "
    "are bigints and every update is integer arithmetic, so the "
    "result is bit-identical across shuffle orders and engines; the "
    "oracle unrolls the same 3 iterations as recursive CTEs. Per "
    "round: one join on the co-partitioned edge frame + one groupBy "
    "dst; lineage cut per round (operators/graph.py).",
    tags=("graph", "iterative", "events"),
)
def q_pagerank_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    e = load_table(spark, sf_dir, "events")
    k_page = F.get_json_object("props", "$.k").cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(F.col("user_id"), k_page.alias("src"), F.col("ts"), F.col("event_id"))
        .withColumn("dst", F.lead("src").over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    return pagerank(edges, n_iter=3, weight_col="w")


@register(
    "q_session_top_paths",
    sql="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events),
    sessions AS (
        SELECT user_id, ts, event_id, event_type,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sessions GROUP BY user_id, session_id)
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM paths GROUP BY path
    ORDER BY n DESC, path LIMIT 20
    """,
    doc="Top-20 session navigation paths: 30-min-gap sessionization "
    "(same lag+cumsum twin as q_session_window_agg) → per-session "
    "ordered event-type string (array_sort over (ts,event_id,type) "
    "structs — deterministic under any shuffle order) → path "
    "frequency top-k. The product-analytics 'common journeys' query; "
    "two window shuffles on user, one groupBy on path, TakeOrdered "
    "for the k.",
    tags=("window", "session", "events", "topk"),
)
def q_session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sessions = e.withColumn(
        "is_new", F.when(gap_us > 1800 * 1_000_000, 1).otherwise(0)
    ).withColumn("session_id", F.sum("is_new").over(wsum))
    paths = sessions.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )
