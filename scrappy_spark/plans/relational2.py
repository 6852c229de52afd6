"""Second relational batch: outer joins, set ops, grouping sets,
statistical aggregates, as-of / range joins, regex / array / edit-
distance functions, and pivot — rounding out the standard query
surface beyond the reference's own operator set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_full_outer_join",
    sql="""
    SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
           coalesce(c.n_customers, 0)             AS n_customers,
           coalesce(s.n_suppliers, 0)             AS n_suppliers
    FROM (SELECT c_nationkey, count(*) AS n_customers
          FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
    FULL JOIN (SELECT s_nationkey, count(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey) s
      ON c.c_nationkey = s.s_nationkey
    """,
    doc="Full outer join of two pre-aggregated sides with null-side "
    "coalescing (nations with only customers or only suppliers).",
    tags=("join",),
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_suppliers"))
    )
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return j.select(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "q_cross_join_count",
    sql="""
    SELECT r_name, count(*) AS n_pairs
    FROM region CROSS JOIN nation
    GROUP BY r_name
    """,
    doc="Cartesian product (tiny dims only — a guarded operation at scale).",
    tags=("join",),
)
def q_cross_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).groupBy("r_name").agg(F.count("*").alias("n_pairs"))


@register(
    "q_intersect_langs",
    sql="""
    SELECT lang FROM documents WHERE source = 'src0'
    INTERSECT
    SELECT lang FROM documents WHERE source = 'src6'
    """,
    doc="INTERSECT (distinct) set operation.",
    tags=("setop",),
)
def q_intersect_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("source") == "src0").select("lang")
    b = d.filter(F.col("source") == "src6").select("lang")
    return a.intersect(b)


@register(
    "q_grouping_sets",
    sql="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit grouping sets (disjoint roll-up dimensions + grand "
    "total) — one pass, expand-based.",
    tags=("agg",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q_percentiles",
    sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4)      AS median_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(stddev_samp(l_quantity), 4)             AS sd_qty,
           round(corr(l_extendedprice, l_quantity), 6)   AS price_qty_corr
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: exact interpolated percentiles, sample "
    "stddev, correlation. (percentile_approx is the 100 TB path; exact "
    "percentile keeps the oracle checkable.)",
    tags=("agg", "stats"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
    )


@register(
    "q_asof_join",
    sql="""
    SELECT e.event_id, e.user_id, e.ts AS error_ts, c.ts AS prev_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    doc="As-of join: latest prior click per error event. Spark lacks a "
    "native ASOF operator; the engine expresses it as the merge pattern "
    "— union both sides, one window pass carrying the last match "
    "forward — which scales as a single sort-shuffle per key, never a "
    "range-product.",
    tags=("join", "asof"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("e_ts")
    )
    # merge pattern: tag and union, clicks sort before errors at equal ts
    u = clicks.select(
        "user_id", F.col("c_ts").alias("ts"), F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"), F.col("c_ts"),
    ).unionByName(
        errors.select(
            "user_id", F.col("e_ts").alias("ts"), F.lit(1).alias("kind"),
            "event_id", F.lit(None).cast("timestamp").alias("c_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("prev_click_ts", F.last("c_ts", ignorenulls=True).over(w))
    return (
        carried.filter((F.col("kind") == 1) & F.col("prev_click_ts").isNotNull())
        .select(
            "event_id", "user_id", F.col("ts").alias("error_ts"), "prev_click_ts"
        )
    )


@register(
    "q_range_join",
    sql="""
    SELECT a.user_id, count(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 60 SECOND
    GROUP BY a.user_id
    """,
    doc="Range join: same-user event pairs within 60s. The user_id "
    "equi-key keeps it a hash/sort-merge join with a range residual — "
    "never a nested-loop product.",
    tags=("join", "range"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    a = e.select("user_id", F.col("ts").alias("a_ts"))
    b = e.select(F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
    j = a.join(
        b,
        (a.user_id == b.b_user)
        & (b.b_ts > a.a_ts)
        & (b.b_ts <= a.a_ts + F.expr("INTERVAL 60 SECOND")),
    )
    return j.groupBy("user_id").agg(F.count("*").alias("n_pairs"))


@register(
    "q_regexp_extract",
    sql="""
    SELECT doc_id,
           CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) AS src_num,
           regexp_replace(text, '[aeiou]', '_', 'g')             AS devoweled
    FROM documents WHERE doc_id < 50
    """,
    doc="Regex surface: capture-group extraction + global replace.",
    tags=("scalar",),
)
def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.regexp_extract("source", r"([0-9]+)", 1).cast("long").alias("src_num"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
    )


@register(
    "q_levenshtein",
    sql="""
    SELECT doc_id, lang,
           CAST(levenshtein(lang, 'en') AS BIGINT) AS dist_en
    FROM documents
    """,
    doc="Edit-distance scalar (fuzzy matching primitive).",
    tags=("scalar",),
)
def q_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", F.levenshtein("lang", F.lit("en")).cast("long").alias("dist_en")
    )


@register(
    "q_array_funcs",
    sql="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT)                        AS dim,
           round(CAST(list_extract(embedding, 1) AS DOUBLE), 6)  AS first_val,
           round(list_sum(embedding[2:4]::DOUBLE[]), 6)          AS sum_2_4,
           round(CAST(list_max(embedding) AS DOUBLE), 6)         AS max_val
    FROM embeddings WHERE vec_id < 100
    """,
    doc="Array-column surface: size, element access, slice+aggregate, "
    "max — the building blocks of the similarity operators.",
    tags=("scalar", "array"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(
                F.slice("embedding", 2, 3), F.lit(0.0), lambda a, v: a + v.cast("double")
            ),
            6,
        ).alias("sum_2_4"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
    )


@register(
    "q_pivot",
    sql="""
    SELECT l_linestatus,
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_A,
           round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_N,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_R
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="Pivot (long→wide): Spark .pivot with an explicit value list "
    "(never inferred at scale — that's an extra pass).",
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return p.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


@register(
    "q_unpivot_metrics",
    sql="""
    WITH wide AS (
        SELECT l_linestatus,
               round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_A,
               round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_N,
               round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_R
        FROM lineitem GROUP BY l_linestatus)
    SELECT l_linestatus, flag, qty FROM wide
    UNPIVOT INCLUDE NULLS (qty FOR flag IN (qty_A, qty_N, qty_R))
    """,
    doc="Unpivot (wide→long, the melt inverse of q_pivot): Spark's "
    "native .unpivot — an Expand node, zero shuffle, stays in "
    "codegen. INCLUDE-NULLS semantics pinned on both engines so a "
    "status with no 'A' rows keeps its row. Round-trips q_pivot's "
    "exact wide table back to long form.",
    tags=("agg", "pivot", "reshape"),
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = q_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["l_linestatus"],
        values=["qty_A", "qty_N", "qty_R"],
        variableColumnName="flag",
        valueColumnName="qty",
    )


@register(
    "q_scd2_merge",
    sql="""
    WITH hist AS (
        SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
               TIMESTAMP '1995-01-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer),
    upd AS (
        SELECT c_custkey AS k,
               CASE WHEN c_custkey % 7 = 0 THEN 'UPGRADED'
                    ELSE c_mktsegment END AS new_seg,
               round(CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
                          ELSE c_acctbal END, 2) AS new_bal,
               TIMESTAMP '1997-01-01' AS eff
        FROM customer
        WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 3),
    ch AS (
        SELECT h.c_custkey, h.c_name, h.c_mktsegment, h.c_acctbal,
               h.valid_from, u.new_seg, u.new_bal, u.eff
        FROM hist h JOIN upd u ON u.k = h.c_custkey
        WHERE h.c_mktsegment <> u.new_seg OR h.c_acctbal <> u.new_bal)
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal, valid_from,
           eff AS valid_to FROM ch
    UNION ALL
    SELECT c_custkey, c_name, new_seg, new_bal, eff, NULL FROM ch
    UNION ALL
    SELECT h.* FROM hist h
    WHERE h.c_custkey NOT IN (SELECT c_custkey FROM ch)
    """,
    doc="SCD type-2 merge: an update batch against a customer history "
    "— changed keys get their current row closed at the effective "
    "date plus a new open row; identical re-updates are no-ops "
    "(idempotence proved in-query: the mod-11 update set carries "
    "unchanged values and must pass through untouched). One broadcast "
    "join + three scan-free branches, no row-by-row MERGE; history "
    "rows never join. operators/scd.py.",
    tags=("merge", "scd", "join"),
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import scd2_merge

    c = _t(spark, sf_dir, "customer")
    history = c.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = c.filter((F.col("c_custkey") % 7 == 0) | (F.col("c_custkey") % 11 == 3)).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("UPGRADED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.round(
            F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100)
            .otherwise(F.col("c_acctbal")),
            2,
        ).alias("c_acctbal"),
        F.lit("1997-01-01").cast("timestamp").alias("effective_date"),
    )
    return scd2_merge(
        history,
        updates,
        key_col="c_custkey",
        tracked_cols=["c_mktsegment", "c_acctbal"],
    )
