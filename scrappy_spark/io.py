"""Table loading for the fixture star schema.

All reads are lazy parquet scans — Catalyst pushes predicates and
prunes columns into the scan, so callers should express filters on the
returned DataFrames rather than materializing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schema import FIXTURE_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {FIXTURE_TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Normalize ``ts`` to TIMESTAMP regardless of how the fixture writer
    encoded it. Fixture generators have shipped three encodings so far:

    - parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects:
      read nanos as long and convert with exact integer division
      (``div`` — a double division would lose precision at 1e18
      magnitudes), matching DuckDB's ns→us truncation;
    - tz-naive TIMESTAMP(isAdjustedToUTC=false), which Spark reads as
      TIMESTAMP_NTZ — that type is rejected by ``unix_micros`` and by
      ``withWatermark`` event time, so cast to TIMESTAMP. The session
      timezone is pinned UTC (session.py), making the cast an identity
      on the underlying micros and matching DuckDB's naive read;
    - plain UTC TIMESTAMP, where the cast below is a no-op.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
