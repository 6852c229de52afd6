"""Relational-core declared queries (SURVEY.md §2.2–§2.5).

Each query pairs a Spark DataFrame builder (built from the operator
library) with a DuckDB oracle SQL string. Filters/projections push into
the parquet scan; joins rely on Catalyst strategy selection with
explicit broadcast hints on dimension-sized sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.localrel import local_relation
from ..io import load_table
from ..operators import dedup as D, joins as J
from ..operators.filters import normalize_term, truncate_col
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregations (capability class of reference A1–A5 over numeric measures)
# --------------------------------------------------------------------------


@register(
    "q_groupby_sum_avg",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                AS sum_qty,
           round(sum(l_extendedprice), 2)                           AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
           round(avg(l_quantity), 4)                                AS avg_qty,
           round(avg(l_extendedprice), 4)                           AS avg_price,
           round(avg(l_discount), 6)                                AS avg_disc,
           count(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: partial-agg heavy groupBy.",
    tags=("agg",),
)
def q_groupby_sum_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_count_distinct",
    sql="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*)                  AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact distinct aggregation (expand-based in Spark).",
    tags=("agg",),
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q_approx_count_distinct",
    sql="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(1 AS BIGINT) AS approx_in_band
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_count_distinct: the 100 TB path for distinct counts "
    "(single pass, fixed memory, no expand). The HLL++ estimate is "
    "sketch-dependent, so the query emits the in-pass exact count per "
    "group plus a banded flag (estimate within 5% at rsd=0.02) the "
    "oracle pins to 1 — same promotion pattern as the DataSketches "
    "suite; the raw estimate stays bound-asserted in tests.",
    tags=("agg", "approx"),
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
            F.count_distinct("l_partkey").alias("exact_parts"),
        )
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.lit(0.05) * F.col("exact_parts").cast("double")
        )
        .cast("long")
        .alias("approx_in_band"),
    )


@register(
    "q_cube_rollup",
    sql="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Hierarchical subtotals via ROLLUP (grouping-sets capability).",
    tags=("agg",),
)
def q_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


# --------------------------------------------------------------------------
# Filters / projections (reference P1–P12)
# --------------------------------------------------------------------------


@register(
    "q_filter_term",
    sql="""
    SELECT doc_id, source, lang, n_chars
    FROM documents
    WHERE contains(lower(text), 'join') OR contains(lower(source), 'join')
    """,
    doc="P1: null-safe case-insensitive substring OR across two columns "
    "(reference article_querry.py:14-17). Pushable predicate, pruned scan.",
    tags=("filter",),
)
def q_filter_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pred = F.coalesce(F.lower("text").contains("join"), F.lit(False)) | F.coalesce(
        F.lower("source").contains("join"), F.lit(False)
    )
    return docs.filter(pred).select("doc_id", "source", "lang", "n_chars")


@register(
    "q_filter_year",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(year(o_orderdate) AS BIGINT) AS o_year
    FROM orders
    WHERE CAST(year(o_orderdate) AS VARCHAR) = '1997'
    """,
    doc="P3: string-cast year equality (reference article_querry.py:22-23).",
    tags=("filter",),
)
def q_filter_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    return o.filter(yr.cast("string") == "1997").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", yr.cast("long").alias("o_year")
    )


@register(
    "q_project",
    sql="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part WHERE p_size > 40
    """,
    doc="P5: narrow projection — ReadSchema must show only 4 columns.",
    tags=("filter",),
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") > 40)
        .select("p_partkey", "p_name", "p_retailprice")
    )


@register(
    "q_string_funcs",
    sql="""
    SELECT doc_id,
           upper(lang)                                                  AS lang_uc,
           substr(text, 1, 20)                                          AS prefix,
           CAST(length(text) AS BIGINT)                                 AS text_len,
           concat(source, '-', lang)                                    AS src_lang,
           reverse(lang)                                                AS lang_rev,
           CASE WHEN length(text) > 50
                THEN substr(text, 1, 50) || '...' ELSE text END         AS text_trunc
    FROM documents
    """,
    doc="§2.6 scalar string surface incl. P12 truncation (scrappy.py:385).",
    tags=("scalar",),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.substring("text", 1, 20).alias("prefix"),
        F.length("text").cast("long").alias("text_len"),
        F.concat_ws("-", "source", "lang").alias("src_lang"),
        F.reverse(F.col("lang")).alias("lang_rev"),
        truncate_col(F.col("text"), 50).alias("text_trunc"),
    )


@register(
    "q_normalize",
    sql="""
    SELECT doc_id,
           trim(regexp_replace(lower(source || ' #' || lang), '[^a-z0-9 ]', '', 'g')) AS norm
    FROM documents
    """,
    doc="P9: term normalization (reference scrappy.py:46-47) as built-ins.",
    tags=("scalar",),
)
def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        normalize_term(F.concat(F.col("source"), F.lit(" #"), F.col("lang"))).alias("norm"),
    )


@register(
    "q_date_funcs",
    sql="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)                 AS o_year,
           CAST(month(o_orderdate) AS BIGINT)                AS o_month,
           CAST(quarter(o_orderdate) AS BIGINT)              AS o_quarter,
           date_trunc('month', o_orderdate)                  AS month_start,
           strftime(o_orderdate, '%Y-%m')                    AS ym,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
           CAST(isodow(o_orderdate) AS BIGINT)               AS iso_dow
    FROM orders
    WHERE year(o_orderdate) = 1996
    """,
    doc="§2.6 date/time surface (reference strftime at scrappy.py:330).",
    tags=("scalar",),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"),
    )


# --------------------------------------------------------------------------
# Joins (reference J1–J4 + standard suite over the star schema)
# --------------------------------------------------------------------------


@register(
    "q_join_orders_customer",
    sql="""
    SELECT c_mktsegment,
           CAST(year(o_orderdate) AS BIGINT)  AS o_year,
           round(sum(o_totalprice), 2)        AS revenue,
           count(*)                           AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, year(o_orderdate)
    """,
    doc="Equi-join fact→dim + grouped agg; dim side broadcast-eligible.",
    tags=("join",),
)
def q_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "q_join_lineitem_part_supp",
    sql="""
    SELECT p_brand, s_nationkey,
           round(sum(l_quantity), 2)                          AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2)  AS revenue,
           count(*)                                           AS n_items
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY p_brand, s_nationkey
    """,
    doc="Multi-way fact×dim×dim join; both dims explicitly broadcast "
    "so the fact table never shuffles for the join (only for the agg).",
    tags=("join",),
)
def q_join_lineitem_part_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_nationkey")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_semi_orders_with_lineitem",
    sql="""
    SELECT o_orderstatus, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderstatus
    """,
    doc="Left-semi join (EXISTS): no row multiplication, early out.",
    tags=("join",),
)
def q_semi_orders_with_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q_anti_customer_without_orders",
    sql="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
    """,
    doc="Left-anti join (NOT EXISTS) — the reference's set-membership "
    "pattern (scrappy.py:339-341) generalized: customers with no 1995 "
    "order.",
    tags=("join",),
)
def q_anti_customer_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q_topic_lookup",
    sql="""
    SELECT d.doc_id, d.lang, coalesce(m.topic_name, 'No topic') AS topic_name
    FROM documents d
    LEFT JOIN (VALUES ('en', 'english'), ('de', 'german'), ('es', 'spanish'),
                      ('fr', 'french')) AS m(lang, topic_name)
      ON d.lang = m.lang
    """,
    doc="J4: lookup join with default (reference scrappy.py:503-504 "
    "dict .apply with 'No topic' fallback) — broadcast left join + coalesce.",
    tags=("join",),
)
def q_topic_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    m = local_relation(
        spark,
        [("en", "english"), ("de", "german"), ("es", "spanish"), ("fr", "french")],
        "lang string, topic_name string",
    )
    return J.lookup_with_default(
        d.select("doc_id", "lang"), m, on="lang", value_col="topic_name", default="No topic"
    ).select("doc_id", "lang", "topic_name")


# --------------------------------------------------------------------------
# Windows / top-k (reference A3, D2 foundations)
# --------------------------------------------------------------------------


@register(
    "q_topk_per_group",
    sql="""
    SELECT * FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
    doc="A3: deterministic per-group top-k via row_number window.",
    tags=("window",),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_rank",
    sql="""
    SELECT * FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               dense_rank()  OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
               round(sum(c_acctbal) OVER (PARTITION BY c_nationkey
                                          ORDER BY c_acctbal DESC, c_custkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW), 2)         AS running_bal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey)  AS rn
        FROM customer)
    WHERE rn <= 5
    """,
    doc="Ranking + running aggregate window functions, top-5 per nation.",
    tags=("window",),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    order = [F.desc("c_acctbal"), F.asc("c_custkey")]
    w = Window.partitionBy("c_nationkey").orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal")
        .withColumn("bal_rank", F.dense_rank().over(w))
        .withColumn("running_bal", F.round(F.sum("c_acctbal").over(wsum), 2))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )


# --------------------------------------------------------------------------
# Set ops / dedup / merge (reference U1-U2, D1-D2, M1)
# --------------------------------------------------------------------------


@register(
    "q_union_sources",
    sql="""
    SELECT doc_id, lang, 'batch_a' AS batch FROM documents WHERE source = 'src0'
    UNION ALL
    SELECT doc_id, lang, 'batch_b' AS batch FROM documents WHERE source = 'src1'
    """,
    doc="U1: union of per-source batches (reference scrappy.py:289-305).",
    tags=("setop",),
)
def q_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("source") == "src0").select("doc_id", "lang", F.lit("batch_a").alias("batch"))
    b = d.filter(F.col("source") == "src1").select("doc_id", "lang", F.lit("batch_b").alias("batch"))
    return a.unionByName(b)


@register(
    "q_except_titles",
    sql="""
    SELECT text FROM documents WHERE source = 'src0'
    EXCEPT
    SELECT text FROM documents WHERE source = 'src1'
    """,
    doc="EXCEPT (distinct) — set-difference capability class.",
    tags=("setop",),
)
def q_except_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("source") == "src0").select("text")
    b = d.filter(F.col("source") == "src1").select("text")
    return a.subtract(b)


@register(
    "q_dedup_title",
    sql="""
    SELECT text, CAST(min(doc_id) AS BIGINT) AS doc_id, count(*) AS n_dups
    FROM documents GROUP BY text
    """,
    doc="D1: within-batch dedup with a deterministic representative "
    "(min key) — reference scrappy.py:316.",
    tags=("dedup",),
)
def q_dedup_title(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups"))
    )


@register(
    "q_dedup_keep_first",
    sql="""
    SELECT doc_id, text, lang, source FROM (
        SELECT doc_id, text, lang, source,
               row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        FROM documents)
    WHERE rn = 1
    """,
    doc="D2: deterministic keep-first dedup via priority window "
    "(reference scrappy.py:335 'existing wins'); dropDuplicates would "
    "pick arbitrary rows and break the guarantee.",
    tags=("dedup",),
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    return D.dedup_keep_first(d, keys=["lang", "source"], order_by=["doc_id"])


@register(
    "q_merge_simulation",
    sql="""
    SELECT lang, bucket, doc_id, source FROM (
        SELECT lang, bucket, doc_id, source,
               row_number() OVER (PARTITION BY lang, bucket
                                  ORDER BY prio, doc_id) AS rn
        FROM (
            SELECT lang, n_chars % 10 AS bucket, doc_id, source, 0 AS prio
            FROM documents WHERE source = 'src0'
            UNION ALL
            SELECT lang, n_chars % 10 AS bucket, doc_id, source, 1 AS prio
            FROM documents WHERE source = 'src1'))
    WHERE rn = 1
    """,
    doc="M1: merge/upsert — union existing+new, existing wins per key, "
    "deterministic tiebreak (reference scrappy.py:325-351).",
    tags=("dedup", "merge"),
)
def q_merge_simulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").withColumn("bucket", F.col("n_chars") % 10)
    cols = ["lang", "bucket", "doc_id", "source"]
    existing = d.filter(F.col("source") == "src0").select(cols)
    new = d.filter(F.col("source") == "src1").select(cols)
    return D.merge_keep_existing(existing, new, keys=["lang", "bucket"], tiebreak=["doc_id"])


@register(
    "q_anti_new_titles",
    sql="""
    SELECT doc_id, text FROM documents
    WHERE source = 'src1'
      AND text NOT IN (SELECT text FROM documents WHERE source = 'src0')
    """,
    doc="J1: the merge 'newly added' report — left-anti of new batch vs "
    "existing keys (reference scrappy.py:339-341).",
    tags=("join", "merge"),
)
def q_anti_new_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    existing = d.filter(F.col("source") == "src0").select("text")
    new = d.filter(F.col("source") == "src1").select("doc_id", "text")
    return D.newly_added(existing, new, keys=["text"])


@register(
    "q_flatten_institutions",
    sql="""
    SELECT s_nationkey,
           array_to_string(flatten([[s] FOR s IN names]), '; ') AS inst_flat
    FROM (SELECT s_nationkey, list_sort(list(s_name)) AS names
          FROM supplier GROUP BY s_nationkey)
    """,
    doc="P11: flatten list-of-lists + join (reference scrappy.py:318-320) "
    "— exercised on a nested array built from supplier names.",
    tags=("scalar", "nested"),
)
def q_flatten_institutions(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    nested = F.transform(F.sort_array(F.collect_list("s_name")), lambda x: F.array(x))
    return s.groupBy("s_nationkey").agg(
        F.array_join(F.flatten(nested), "; ").alias("inst_flat")
    )
