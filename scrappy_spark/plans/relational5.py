"""Fifth relational batch: subquery-heavy TPC-H shapes.

The reference has no SQL surface at all (its "queries" are four pandas
predicates, `article_querry.py:13-28`); these shapes lock the engine's
coverage of the subquery patterns any relational user brings: EXISTS
with a correlated non-equi predicate (Q4), outer-join double
aggregation (Q13), disjunctive multi-clause join predicates (Q19),
scalar subqueries both global (Q22) and per-group decorrelated to a
window. Fixture tables lack some TPC-H columns (no l_commitdate /
p_container / c_phone), so each shape keeps the PLAN structure with the
columns the fixtures have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import load_table
from ..operators.layout import z_value, z_value_sql
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_tpch_q4_shape",
    sql="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order priority checking): EXISTS with a "
    "correlated NON-EQUI predicate (l_shipdate > o_orderdate) compiles "
    "to a left-semi join with an equi key plus residual condition — "
    "the date filter pushes into the orders scan; the semi join never "
    "duplicates orders rows regardless of lineitem fan-out.",
    tags=("join", "tpch", "subquery"),
)
def q_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate)
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q_tpch_q13_shape",
    sql="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (customer distribution): outer join with a "
    "join-condition filter (pre-filters the orders side — NOT a post-"
    "join WHERE, which would drop order-less customers), then two "
    "stacked aggregations: per-customer order count, then the count "
    "histogram. First agg shuffles on custkey; the second key "
    "(c_count) has ~tens of values, absorbed map-side.",
    tags=("join", "agg", "tpch"),
)
def q_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q_tpch_q19_shape",
    sql="""
    SELECT round(coalesce(sum(l_extendedprice * (1 - l_discount)), 0), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 shape (discounted revenue): disjunctive multi-clause "
    "predicate across BOTH join sides. The OR can't push down whole, "
    "but its common factor (p_brand IN (...)) can — applied explicitly "
    "to the part scan so the broadcast side shrinks before the join; "
    "the full disjunction evaluates post-join inside codegen.",
    tags=("join", "tpch", "predicate"),
)
def q_tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Common-factor extraction: every OR branch pins one of three
    # brands, so the scan-level IN-filter is implied by the disjunction
    # (result-identical; the oracle carries only the disjunction).
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    disj = (
        ((br == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((br == "Brand#2") & sz.between(10, 30) & q.between(10, 35))
        | ((br == "Brand#3") & sz.between(20, 50) & q.between(20, 50))
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return j.filter(disj).agg(F.round(F.coalesce(rev, F.lit(0.0)), 2).alias("revenue"))


@register(
    "q_tpch_q22_shape",
    sql="""
    SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape (global sales opportunity): a global scalar "
    "subquery (avg positive balance — computed once, broadcast as a "
    "one-row cross join) plus NOT EXISTS against filtered orders "
    "(left-anti join; the date filter pushes into the orders scan "
    "before the anti join). Customers above the average balance with "
    "no orders since 2000, by segment.",
    tags=("join", "agg", "tpch", "subquery"),
)
def q_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q_tpch_q15_shape",
    sql="""
    WITH rev AS (
        SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    doc="TPC-H Q15 shape (top supplier): scalar subquery over an "
    "aggregate — revenue per supplier in a quarter, keep the row(s) "
    "equal to the max (ties preserved, unlike ORDER BY/LIMIT 1). The "
    "agg result is tiny, so the max is a one-row broadcast cross join "
    "against it; the supplier join broadcasts the dimension.",
    tags=("agg", "tpch", "subquery"),
)
def q_tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_rev"
        )
    )
    s = _t(spark, sf_dir, "supplier")
    top = rev.agg(F.max("total_rev").alias("__max_rev"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("__max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q_tpch_q7_shape",
    sql="""
    SELECT n_s.n_name AS supp_nation, n_c.n_name AS cust_nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation n_s  ON s.s_nationkey = n_s.n_nationkey
    JOIN nation n_c  ON c.c_nationkey = n_c.n_nationkey
    WHERE (n_s.n_name = 'NATION_1' AND n_c.n_name = 'NATION_2')
       OR (n_s.n_name = 'NATION_2' AND n_c.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, o_year
    """,
    doc="TPC-H Q7 shape (volume shipping): 5-way join with a "
    "disjunctive NATION-PAIR predicate. Dimension chain (supplier → "
    "nation, customer → nation) broadcasts; the fact side shuffles "
    "once on orderkey for the orders join. The pair disjunction can't "
    "split per side, but each nation column's IN(two values) factor "
    "prunes its broadcast build.",
    tags=("join", "tpch"),
)
def q_tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n_s = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(*pair))
    n_c = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(*pair))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("nc_key"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "volume"
        )
    )


@register(
    "q_tpch_q8_shape",
    sql="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN n.n_name = 'NATION_3'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (market share): conditional aggregation — one "
    "nation's revenue share of the total per year, a single pass with "
    "CASE inside sum (no second scan, no self-join). Supplier/nation "
    "broadcast; one shuffle on orderkey.",
    tags=("agg", "tpch"),
)
def q_tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(0)) / F.sum(rev),
            6,
        ).alias("mkt_share")
    )


@register(
    "q_tpch_q10_shape",
    sql="""
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal, c.c_mktsegment
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): top-20 customers "
    "by lost revenue. Flag + date filters push to the scans; the final "
    "ordered limit is TakeOrderedAndProject (no global sort of the "
    "aggregate). Revenue sums fixed-point cents (integer sum — "
    "associative, so shuffle order can't move a rounding boundary "
    "between engines).",
    tags=("join", "agg", "tpch", "topk"),
)
def q_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("long")
                ).cast("double")
                / 100.0
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "c_mktsegment",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_tpch_q12_shape",
    sql="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape (shipping-priority split): conditional counts "
    "per group in one pass — CASE inside sum, not two filtered "
    "sub-aggregations unioned. Date range pushes to the lineitem "
    "scan.",
    tags=("join", "agg", "tpch"),
)
def q_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q17_shape",
    sql="""
    SELECT round(coalesce(sum(l.l_extendedprice), 0) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): correlated "
    "average over the FACT table, decorrelated to a window avg over "
    "l_partkey — one shuffle of lineitem instead of a per-row "
    "re-aggregate; the brand filter broadcasts the pruned part side "
    "and the window runs only on surviving rows.",
    tags=("join", "window", "tpch", "subquery"),
)
def q_tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    w = W.partitionBy("l_partkey")
    kept = j.withColumn("__avg_qty", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.2 * F.col("__avg_qty")
    )
    return kept.agg(
        F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) / 7.0, 2).alias(
            "avg_yearly"
        )
    )


@register(
    "q_moving_range_window",
    sql="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2)
           AS rev_30d,
           CAST(count(*) OVER (
               PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_30d
    FROM orders
    """,
    doc="RANGE-frame moving window: per customer, trailing-30-day "
    "revenue and order count at each order — a VALUE-bounded frame "
    "(epoch seconds), not a row count, so ties and gaps behave "
    "correctly. One sort-shuffle on o_custkey; both aggregates share "
    "the frame.",
    tags=("window", "range-frame"),
)
def q_moving_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rev_30d"),
        F.count("*").over(w).cast("long").alias("n_30d"),
    )


#: blocked fuzzy-pair CTEs — ONE source of truth shared by the pair
#: query and the entity-resolution capstone built on top of it.
_FUZZY_PAIR_SQL = """
    base AS (
        SELECT p_partkey, p_name,
               concat(p_brand, '|', string_split(lower(p_name), ' ')[1]) AS blk
        FROM part WHERE p_partkey < 500),
    pairs AS (
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
        FROM base a JOIN base b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 2)
"""


@register(
    "q_fuzzy_name_pairs",
    sql=f"""
    WITH {_FUZZY_PAIR_SQL}
    SELECT id_a, id_b, edit_dist FROM pairs
    """,
    doc="Entity-resolution fuzzy match: near-identical part names "
    "(edit distance <= 2) compared only inside (brand, first-token) "
    "blocks — the record-linkage canopy shape that keeps the "
    "levenshtein join off the O(n^2) path; block key choice is the "
    "caller's recall/cost dial.",
    tags=("join", "fuzzy", "entity-resolution"),
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import fuzzy_match_pairs

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    blk = F.concat_ws(
        "|", F.col("p_brand"), F.split(F.lower(F.col("p_name")), " ").getItem(0)
    )
    return fuzzy_match_pairs(
        p, "p_name", "p_partkey", max_edit_distance=2, block_expr=blk
    )


@register(
    "q_zorder_key",
    sql=f"""
    SELECT o_orderkey,
           {z_value_sql("o_custkey % 256", "year(o_orderdate) - 1995", 8)} AS z
    FROM orders
    """,
    doc="Z-order (Morton) clustering key: bit-interleave of the "
    "custkey bucket and order year — sorting a write by this key "
    "bounds BOTH columns' per-file min-max ranges so parquet stats "
    "prune on either dimension (Delta OPTIMIZE ZORDER BY as a plain "
    "column expression + sorted write; layout effect proven in "
    "test_layout.py). Pure bit arithmetic, codegen, oracle-checked "
    "bit-for-bit.",
    tags=("layout", "scalar"),
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        z_value(F.col("o_custkey") % 256, F.year("o_orderdate") - 1995, 8).alias("z"),
    )


@register(
    "q_correlated_avg",
    sql="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice)
                                  FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
    """,
    doc="Correlated scalar-aggregate subquery (each order vs its "
    "customer's average spend), decorrelated to a window average over "
    "custkey — ONE shuffle of the table instead of the naive re-"
    "aggregate-per-row; the window and the filter share the same "
    "partitioning so no second exchange appears.",
    tags=("window", "subquery"),
)
def q_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("__cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 1.5 * F.col("__cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


@register(
    "q_entity_resolution",
    sql=f"""
    WITH RECURSIVE
    {_FUZZY_PAIR_SQL},
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (
      SELECT p.p_partkey,
             least(p.p_partkey, coalesce(min(r.b), p.p_partkey)) AS entity_id
      FROM base p LEFT JOIN reach r ON r.a = p.p_partkey
      GROUP BY p.p_partkey),
    sizes AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members
              FROM comp GROUP BY entity_id)
    SELECT c.p_partkey, c.entity_id, k.p_name AS canonical_name, s.n_members
    FROM comp c
    JOIN base k ON k.p_partkey = c.entity_id
    JOIN sizes s ON s.entity_id = c.entity_id
    """,
    doc="Entity-resolution capstone: blocked fuzzy match (edit distance "
    "<= 2 inside brand/first-token canopies) -> connected components "
    "over the match graph -> one canonical record per entity (min-id "
    "member's name) with membership counts, every input record mapped "
    "to its entity. The oracle re-derives the same pairs from the "
    "SHARED SQL fragment and closes them with a recursive CTE, so the "
    "hash match proves the whole block->match->cluster->canonicalize "
    "composition — the q_dedup_corpus pattern applied to record "
    "linkage. Scale shape: canopy-blocked pairs (never all-pairs), "
    "O(log d)-round components, two small joins for canonical names.",
    tags=("join", "fuzzy", "entity-resolution", "pipeline"),
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components
    from ..operators.joins import fuzzy_match_pairs

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    blk = F.concat_ws(
        "|", F.col("p_brand"), F.split(F.lower(F.col("p_name")), " ").getItem(0)
    )
    pairs = fuzzy_match_pairs(
        p, "p_name", "p_partkey", max_edit_distance=2, block_expr=blk
    )
    cc = connected_components(
        p.select(F.col("p_partkey").alias("id")),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
    )
    sizes = cc.groupBy("component").agg(F.count("*").alias("n_members"))
    canon = p.select(
        F.col("p_partkey").alias("component"), F.col("p_name").alias("canonical_name")
    )
    return (
        cc.join(canon, "component")
        .join(sizes, "component")
        .select(
            F.col("id").alias("p_partkey"),
            F.col("component").alias("entity_id"),
            "canonical_name",
            "n_members",
        )
    )
