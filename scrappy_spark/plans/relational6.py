"""Sixth relational batch: the partsupp-family TPC-H shapes.

Completes the TPC-H structural suite (with relational4/relational5 this
covers 21 of the 22 queries; Q1,3,4,5,6,7,8,10,12,13,14,15,17,18,19,22
live in the earlier batches).  The fixtures have no ``partsupp`` table,
so these six shapes derive the supplier-part fact from ``lineitem``
(one groupBy on (l_partkey, l_suppkey)) and keep each query's PLAN
structure intact: Q2's correlated per-group minimum, Q9's multi-dim
profit rollup, Q11's global scalar-subquery threshold, Q16's NOT-IN
anti join over distinct pairs, Q20's nested-IN chain with a correlated
half-sum, Q21's EXISTS + NOT-EXISTS pair against the same fact table.

Cross-engine parity notes: the derived "supply cost" is min/sum over
raw doubles with NO arithmetic before the aggregate (exact same value
both engines); money sums use the fixed-point-cents idiom from
q_tpch_q10_shape; Q11's threshold compare is pure integer arithmetic
(10000 * part_cents > total_cents) so a shuffle-order rounding wobble
cannot flip the HAVING.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _supplier_part_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp: per (part, supplier) minimum observed price.

    min() over raw doubles — no arithmetic, so Spark and the oracle see
    bit-identical values and downstream equality comparisons are exact.
    """
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min("l_extendedprice").alias("ps_supplycost"))
    )


_SUPPLIER_PART_COST_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice) AS ps_supplycost
    FROM lineitem GROUP BY 1, 2
"""


@register(
    "q_tpch_q2_shape",
    sql=f"""
    WITH ps AS ({_SUPPLIER_PART_COST_SQL}),
    regional AS (
        SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal, n.n_name,
               ps.ps_supplycost,
               min(ps.ps_supplycost) OVER (PARTITION BY p.p_partkey)
                   AS min_cost
        FROM ps
        JOIN part p     ON p.p_partkey = ps.ps_partkey
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE' AND p.p_size BETWEEN 10 AND 25
          AND p.p_type = 'ECONOMY'
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, p_brand, round(ps_supplycost, 2) AS supply_cost
    FROM regional WHERE ps_supplycost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier): correlated per-part "
    "minimum over a region-restricted supplier set, kept as a window "
    "min over the SAME join output rather than a re-scan self-join — "
    "one shuffle on p_partkey serves both the min and the equality "
    "filter. Derived supplier-part cost stands in for partsupp "
    "(fixtures lack it); dims broadcast, ordered limit is top-k.",
    tags=("join", "tpch", "subquery", "window"),
)
def q_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _supplier_part_cost(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 25) & (F.col("p_type") == "ECONOMY")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    regional = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        regional.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("ps_supplycost", 2).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "q_tpch_q9_shape",
    sql="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)
                    - 0.5 * p.p_retailprice * l.l_quantity) * 100)
                    AS BIGINT)) AS DOUBLE) / 100.0 AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product-type profit): four-dim star join on "
    "the fact with every dim broadcast (no fact shuffle before the "
    "agg), p_name LIKE pushed into the part scan so the broadcast "
    "side shrinks first. Profit uses a retail-price cost proxy "
    "(fixtures lack ps_supplycost); fixed-point-cents sum keeps the "
    "rollup hash-stable across shuffle orders.",
    tags=("join", "agg", "tpch"),
)
def q_tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    profit_cents = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
    ).cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit_cents).cast("double") / 100.0).alias("profit"))
    )


@register(
    "q_tpch_q11_shape",
    sql=f"""
    WITH ps AS ({_SUPPLIER_PART_COST_SQL}),
    national AS (
        SELECT ps.ps_partkey,
               CAST(sum(CAST(round(ps.ps_supplycost * 100) AS BIGINT))
                    AS BIGINT) AS value_cents
        FROM ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY 1
    )
    SELECT ps_partkey,
           CAST(value_cents AS DOUBLE) / 100.0 AS part_value
    FROM national
    WHERE 10000 * value_cents >
          (SELECT CAST(sum(value_cents) AS BIGINT) FROM national)
    """,
    doc="TPC-H Q11 shape (important stock): per-part value within a "
    "nation group, kept only when above a fraction of the GLOBAL "
    "total — a scalar subquery over the same aggregate, computed once "
    "and broadcast, not recomputed per row. The threshold compare is "
    "pure integer math (10000 * part_cents > total_cents) so the "
    "HAVING cannot flip on a float rounding boundary.",
    tags=("agg", "tpch", "subquery"),
)
def q_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _supplier_part_cost(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    national = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.round(F.col("ps_supplycost") * 100).cast("long")).alias(
                "value_cents"
            )
        )
    )
    total = national.agg(F.sum("value_cents").alias("total_cents"))
    return (
        national.join(F.broadcast(total))
        .filter(10000 * F.col("value_cents") > F.col("total_cents"))
        .select(
            "ps_partkey",
            (F.col("value_cents").cast("double") / 100.0).alias("part_value"),
        )
    )


@register(
    "q_tpch_q16_shape",
    sql="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT pairs.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
    JOIN part p ON p.p_partkey = pairs.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (1, 5, 11, 20, 28, 37, 42, 49)
      AND pairs.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape (supplier relationship): distinct supplier "
    "count per part attribute bucket, excluding a NOT-IN supplier set. "
    "The distinct (part, supplier) pair collapse happens FIRST (one "
    "fact shuffle), the NOT IN compiles to a broadcast anti join (the "
    "excluded set is tiny and null-free by construction), and the "
    "part attribute filters all push into the broadcast dim scan.",
    tags=("join", "agg", "tpch", "subquery"),
)
def q_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 5, 11, 20, 28, 37, 42, 49)
    )
    complainers = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(
            F.broadcast(complainers),
            pairs.l_suppkey == complainers.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q20_shape",
    sql="""
    WITH sp AS (
        SELECT l_suppkey, l_partkey,
               sum(l_quantity) AS qty_total,
               sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                         AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                        THEN l_quantity ELSE 0 END) AS qty_1996
        FROM lineitem GROUP BY 1, 2
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_2', 'NATION_5', 'NATION_8')
      AND s.s_suppkey IN (
          SELECT sp.l_suppkey FROM sp
          WHERE sp.l_partkey IN
                (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
            AND sp.qty_total > 2.0 * sp.qty_1996)
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape (potential part promotion): nested IN chain — "
    "suppliers whose all-time volume on name-prefixed parts exceeds "
    "twice their 1996 volume (stand-in for availqty > half-year "
    "demand). Both IN subqueries compile to semi joins: parts filter "
    "broadcast into the derived supplier-part agg, the surviving "
    "suppkey set broadcast into the supplier dim. Quantities are "
    "integer-valued doubles, so the correlated compare is exact.",
    tags=("join", "tpch", "subquery"),
)
def q_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    in_1996 = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    sp = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum("l_quantity").alias("qty_total"),
            F.sum(F.when(in_1996, F.col("l_quantity")).otherwise(0.0)).alias(
                "qty_1996"
            ),
        )
    )
    small_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    excess = (
        sp.join(F.broadcast(small_parts), sp.l_partkey == small_parts.p_partkey, "left_semi")
        .filter(F.col("qty_total") > 2.0 * F.col("qty_1996"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_5", "NATION_8")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(excess), s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name")
    )


@register(
    "q_tpch_q21_shape",
    sql="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name IN ('NATION_1', 'NATION_4', 'NATION_7')
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): the "
    "EXISTS / NOT-EXISTS pair against the same fact, folded into "
    "aggregates instead of semi/anti self-joins (r14): 'another "
    "supplier touched the order' ⟺ min(l_suppkey) ≠ max(l_suppkey) "
    "over the order's lines (the probe's supplier is one of them), "
    "and 'no OTHER supplier was also late' ⟺ min = max over the "
    "order's LATE lines — so the late set is computed once, flagged "
    "in place by a window, and lineitem is scanned twice (late + the "
    "spread aggregate) instead of three times through two wide "
    "inequality joins. 'Late' is l_shipdate > o_orderdate + 90d "
    "(fixtures lack commit/receipt dates); NULL suppkeys (absent in "
    "TPC-H) could witness neither EXISTS branch and are likewise "
    "ignored by min/max. The final ordered limit is top-k, not a "
    "global sort.",
    tags=("join", "tpch", "subquery", "topk"),
)
def q_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    # EXISTS(l2: same order, different supplier) ⟺ the order's lines
    # span ≥ 2 distinct suppliers ⟺ min ≠ max (the probe row's own
    # supplier is always a member, so a single-supplier order can
    # never satisfy the inequality).
    multi = (
        li.groupBy("l_orderkey")
        .agg((F.min("l_suppkey") != F.max("l_suppkey")).alias("__multi"))
        .filter(F.col("__multi"))
        .select("l_orderkey")
    )
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey", "o_orderstatus")
    )
    # NOT EXISTS(l3: late in the same order, different supplier) ⟺ the
    # order's LATE lines (any status) span exactly one supplier — the
    # probe's own. One window over the late set replaces the anti
    # self-join, and the status filter applies to the probe rows only
    # AFTER the window so the anti side keeps its original scope.
    w = Window.partitionBy("l_orderkey")
    cand = late.select(
        "l_orderkey",
        "l_suppkey",
        "o_orderstatus",
        F.min("l_suppkey").over(w).alias("__lmn"),
        F.max("l_suppkey").over(w).alias("__lmx"),
    ).filter(
        (F.col("o_orderstatus") == "F") & (F.col("__lmn") == F.col("__lmx"))
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_4", "NATION_7")
    )
    return (
        cand.join(multi, "l_orderkey", "left_semi")
        .join(F.broadcast(s), cand.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )
