"""Skew mitigation tools.

AQE's skew-join handling covers sort-merge joins automatically; these
helpers cover the cases AQE cannot: skewed *aggregations* (one hot key
overwhelms a reducer) and skewed joins against a small-but-not-tiny
side where salting beats waiting for AQE splits.

Two-phase (salted) aggregation: add a random salt to the key, partial-
aggregate on (key, salt), then re-aggregate on the key. The hot key's
load spreads across ``n_salts`` reducers; correctness needs the measure
to be re-aggregable (sum/count/min/max — avg must ship (sum, count)).

Salted broadcast-replicate join: salt the big (skewed) side, replicate
the small side once per salt, join on (key, salt). Classic recipe for
joining a Zipf fact key against a dimension too big to broadcast whole
but small enough to replicate n_salts× across the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_count(df: DataFrame, key_cols: list[str], n_salts: int = 16) -> DataFrame:
    """Two-phase count per key, immune to hot-key reducer skew."""
    salted = df.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(*key_cols).agg(F.sum("__c").alias("count"))


def salted_sum(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    salted = df.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(F.sum(value_col).alias("__s"))
    return partial.groupBy(*key_cols).agg(F.sum("__s").alias(f"sum_{value_col}"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side against a replicable small side.

    big gains a random salt in [0, n_salts); small is exploded once per
    salt value; the join key becomes (on, salt) so each hot key spreads
    over n_salts partitions. Output columns = big ∪ small (salt dropped).
    """
    b = big.withColumn("__salt", (F.rand(seed=11) * n_salts).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    )
    return b.join(s, on=[on, "__salt"], how=how).drop("__salt")
