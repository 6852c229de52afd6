"""SparkSession factory with scale-aware defaults.

Local mode is the test harness; the config is written so the same code
lands well on a real cluster: AQE for runtime re-planning (skew joins,
partition coalescing), Arrow for any Python exchange, UTC timezone so
timestamp semantics are stable across the oracle (DuckDB) and Spark.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "scrappy_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``).
    ``spark.sql.shuffle.partitions`` is sized to the local core count —
    on a real cluster this is superseded by AQE coalescing, which is on.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (Spark 4.1) — the
        # scrappy_snapshot reader prunes files at the manifest via
        # pushFilters; a RUNTIME conf, so non-engine sessions can
        # opt in with spark.conf.set (snapshot_datasource docstring)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
