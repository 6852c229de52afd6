"""Watermarked window transformations over events streams.

Each function takes any events-shaped DataFrame (batch OR streaming —
the unified API) with columns (event_id, ts timestamp, user_id,
event_type, value) and returns the transformed DataFrame. On a
streaming input the watermark bounds state: late rows beyond
``watermark`` are dropped and window state is evicted once the
watermark passes the window end — this is what makes the operators
runnable indefinitely at scale (state is O(open windows), not O(stream)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Tumbling window count/sum per event_type (batch twin:
    plans/events.py::q_tumbling_window_agg)."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events", "sum_value")
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "n_events", "sum_value")
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Native session windows (gap-based). The batch declared query
    (q_session_window_agg) uses the lag+cumsum formulation because it is
    SQL-oracle-checkable; this is the streaming-native equivalent —
    session state merges as events arrive and closes ``gap`` after the
    last event."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Streaming exact dedup by event_id within the watermark horizon —
    state stores one key per event inside the horizon, then ages out
    (`dropDuplicatesWithinWatermark` on streams)."""
    keys = keys or ["event_id"]
    if events.isStreaming and watermark:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def read_events_stream(spark, path: str, schema, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over an events directory (parquet parts).

    ``ts`` is normalized to TIMESTAMP, mirroring io._load_events for
    every fixture encoding: nanos-as-int64 (bigint in the caller's
    schema) converts via exact integer division — a bare
    ``cast("timestamp")`` would read nanosecond counts as epoch
    SECONDS, silently placing events ~30,000 years out; tz-naive
    sources surface TIMESTAMP_NTZ, which ``withWatermark`` rejects as
    event time, so those cast to TIMESTAMP (identity under the UTC
    session timezone). Both are streaming-safe projections."""
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    if "ts" in df.columns:
        if dict(df.dtypes)["ts"] == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
