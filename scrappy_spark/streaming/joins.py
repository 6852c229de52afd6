"""Stream-stream interval join: correlate events across two streams
within a bounded time window (view→click attribution, request→response
matching, impression→conversion).

Same unified-API discipline as ``windows.py``: the function works on
batch AND streaming frames. On streams, watermarks on BOTH sides plus
the time-range join condition are what let Spark bound the join state —
a row older than (watermark + max_delay) can never match again and its
state is evicted. Without the range condition a stream-stream join
keeps every row forever.

At scale the join shuffles both streams on the key once; state size is
O(key-cardinality × max_delay × rate), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Inner-join ``left`` and ``right`` on ``key`` where the right
    event lands in ``[left_ts, left_ts + max_delay]``.

    Columns (other than ``key``) must already be disambiguated by the
    caller (e.g. prefixed) — the joined frame carries both sides'
    columns plus ``delay_sec``.
    """
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (left[key] == right[key])
        & (right[right_ts] >= left[left_ts])
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return (
        left.join(right, cond, "inner")
        .drop(right[key])
        .withColumn(
            "delay_sec",
            (F.unix_timestamp(right_ts) - F.unix_timestamp(left_ts)).cast("long"),
        )
    )


def view_click_attribution(
    events: DataFrame, max_delay: str = "10 minutes", watermark: str | None = None
) -> DataFrame:
    """Attribute each click to every view by the same user in the
    preceding ``max_delay`` — the canonical two-stream correlation,
    derived from one events frame by type split (each split is its own
    stream/scan)."""
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return interval_join(
        views,
        clicks,
        key="user_id",
        left_ts="view_ts",
        right_ts="click_ts",
        max_delay=max_delay,
        watermark=watermark,
    )


def enrich_with_static(
    stream: DataFrame, dim: DataFrame, key: str = "user_id", how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    stream. The static side is broadcast to every task — no state, no
    watermark needed, re-read per micro-batch (so a refreshed dim table
    is picked up on the next trigger). The standard shape for
    user-profile / feature-store lookups on an event stream."""
    return stream.join(F.broadcast(dim), on=key, how=how)
