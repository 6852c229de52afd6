"""Fourth relational batch: TPC-H Q1/Q6 shapes and the lead/lag window
surface — classic single-pass aggregation and analytic-window plans the
engine must keep in whole-stage codegen with pushdown intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_tpch_q1_shape",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape (pricing summary): the canonical full-scan "
    "partial-aggregation plan — one scan, map-side combine on a "
    "2-column low-cardinality key, no join. The throughput yardstick "
    "for the agg pipeline.",
    tags=("agg", "tpch"),
)
def q_tpch_q1_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q_tpch_q6_shape",
    sql="""
    SELECT round(coalesce(sum(l_extendedprice * l_discount), 0), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecasting revenue change): pure filter + "
    "scalar aggregate — every predicate must reach the parquet scan "
    "(PushedFilters), making it the pushdown litmus test.",
    tags=("agg", "tpch", "pushdown"),
)
def q_tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.coalesce(F.sum(F.col("l_extendedprice") * F.col("l_discount")), F.lit(0)), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


@register(
    "q_window_lead_lag",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           round(lag(o_totalprice)  OVER w, 2)             AS prev_price,
           round(lead(o_totalprice) OVER w, 2)             AS next_price,
           CAST(ntile(4) OVER w AS BIGINT)                 AS quartile,
           round(cume_dist() OVER w, 6)                    AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Analytic window surface beyond rank: lag/lead navigation, "
    "ntile bucketing, cume_dist — one sort-shuffle on the partition "
    "key, all four functions sharing the same window frame.",
    tags=("window",),
)
def q_window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "q_skew_salted_agg",
    sql="""
    SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Two-phase salted aggregation on a 3-value (maximally hot) key: "
    "partial agg on (key, salt) spreads each hot key over 16 reducers, "
    "then a tiny re-agg on the key. Result is salt-invariant, so the "
    "oracle is the plain GROUP BY — proving the skew tool changes the "
    "plan, never the answer. (operators/skew.py)",
    tags=("agg", "skew"),
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_sum, salted_count

    li = _t(spark, sf_dir, "lineitem")
    s = salted_sum(li, ["l_returnflag"], "l_quantity", n_salts=16)
    c = salted_count(li, ["l_returnflag"], n_salts=16)
    return s.join(c, "l_returnflag").select(
        "l_returnflag",
        F.round("sum_l_quantity", 2).alias("sum_qty"),
        F.col("count").alias("n_items"),
    )


@register(
    "q_tpch_q14_shape",
    sql="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                      THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
    FROM read_parquet('{SF}/lineitem.parquet') l
    JOIN read_parquet('{SF}/part.parquet') p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """.replace("read_parquet('{SF}/lineitem.parquet')", "lineitem").replace(
        "read_parquet('{SF}/part.parquet')", "part"
    ),
    doc="TPC-H Q14 shape (promotion effect): conditional-aggregate "
    "ratio over a broadcast fact-dim join with a tight date pushdown — "
    "the CASE-inside-agg pattern stays in one partial-agg pass.",
    tags=("agg", "tpch"),
)
def q_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q_tpch_q18_shape",
    sql="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300)
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="TPC-H Q18 shape (large-volume customers): HAVING-filtered "
    "aggregate as a semi-join driver — the agg runs once over "
    "lineitem, its (small) qualifying key set then prunes orders "
    "before the customer join and the final re-aggregation.",
    tags=("agg", "join", "tpch"),
)
def q_tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # fresh scan for the detail join — `big` shares li's lineage and
    # Spark rejects the ambiguous self-join reference otherwise
    li2 = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 300)
        .select(F.col("l_orderkey").alias("__bigkey"))
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == F.col("__bigkey"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li2, li2.l_orderkey == o.o_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )
