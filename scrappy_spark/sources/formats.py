"""Generic table sinks/sources beyond parquet: ORC, JSON-lines, CSV.

The reference persists exactly one CSV file (scrappy.py:350,
`df.to_csv`); the engine generalizes that to the Spark-native columnar
and text formats so a corpus can land wherever the downstream consumer
needs it. All writers are directory-based (one file per task) — at
100 TB a sink is a parallel write of N partition files, never a single
driver-side file.

Schema discipline: text formats (JSON/CSV) do not self-describe types,
so ``read_table`` requires the schema for them — inference at scale is
both a correctness hazard (a column of digit-strings becomes longs)
and a performance one (inference is an extra full scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    r = spark.read.format(fmt)
    if fmt in ("json", "csv"):
        if schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema (no inference at scale)")
        r = r.schema(schema)
        if fmt == "csv":
            r = r.option("header", "true")
    elif schema is not None:
        r = r.schema(schema)
    return r.load(path)
