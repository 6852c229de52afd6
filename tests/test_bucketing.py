"""Bucketed co-located join: the join plan must contain NO shuffle."""

import pytest
from pyspark.sql import functions as F

from scrappy_spark.io import load_table
from scrappy_spark.operators.bucketing import cobucketed_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus", "o_totalprice"
    )
    write_bucketed(li, "t_lineitem_b", "l_orderkey", n_buckets=8)
    write_bucketed(o, "t_orders_b", "l_orderkey", n_buckets=8)
    yield ("t_lineitem_b", "t_orders_b")
    for t in ("t_lineitem_b", "t_orders_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.fixture()
def no_broadcast(spark):
    """At fixture scale Catalyst prefers broadcast (and rightly so);
    disable it to surface the co-located sort-merge path that a
    fact-fact join takes at 100 TB."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_cobucketed_join_has_no_shuffle(spark, bucketed_tables, no_broadcast):
    lt, rt = bucketed_tables
    joined = cobucketed_join(spark, lt, rt, on="l_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # no shuffle on either side
    assert "Bucketed: true" in plan


def test_cobucketed_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = cobucketed_join(spark, lt, rt, on="l_orderkey")
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert joined.count() == expected


def test_bucketed_aggregation_avoids_shuffle(spark, bucketed_tables, no_broadcast):
    lt, _ = bucketed_tables
    agg = (
        spark.table(lt)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan  # grouping key == bucket key
