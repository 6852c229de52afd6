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
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` on ``key`` where the right event
    lands in ``[left_ts, left_ts + max_delay]``.

    ``how="inner"`` (default) keeps matched pairs only;
    ``how="left_outer"`` also emits every unmatched left row with the
    right columns (and ``delay_sec``) NULL — the "views that never
    converted" shape. On STREAMS a left-outer interval join requires
    watermarks on both sides (Spark refuses otherwise): a left row can
    only be declared unmatched once the watermark proves no right row
    within ``max_delay`` can still arrive, so unmatched rows emit with
    that delay, and rows newer than (final watermark − max_delay) are
    still in state when an ``availableNow`` run terminates — the
    batch/stream equivalence is exact for matched rows and
    watermark-bounded for unmatched ones (see test_streaming).

    ``how="full_outer"`` additionally emits unmatched RIGHT rows (the
    "clicks with no preceding view" shape — orphan detection) with the
    left columns NULL; the output ``key`` is coalesced from whichever
    side is present. Same watermark requirement and eviction bound as
    left-outer, applied on both sides.

    Columns (other than ``key``) must already be disambiguated by the
    caller (e.g. prefixed) — the joined frame carries both sides'
    columns plus ``delay_sec``.
    """
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(
            f"how must be 'inner', 'left_outer' or 'full_outer', got {how!r}"
        )
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    # Rename the right key instead of joining left[key] == right[key]:
    # both sides typically derive from ONE source frame (type-split
    # streams), where same-name column references resolve ambiguously
    # (Spark's trivially-true-predicate warning) and drop(right[key])
    # can remove the LEFT key — which surfaces as NULL keys on
    # unmatched left-outer rows. Distinct names make the condition and
    # the drop unambiguous.
    right = right.withColumnRenamed(key, "__rkey")
    cond = (
        (left[key] == F.col("__rkey"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    # Coalesce the output key from whichever side matched: on
    # full_outer an unmatched right row has left[key] NULL and only
    # __rkey carries the key — dropping __rkey without the coalesce
    # would orphan those rows. (On inner/left_outer the coalesce is a
    # no-op: left[key] is always present.)
    return (
        left.join(right, cond, how)
        .withColumn(key, F.coalesce(left[key], F.col("__rkey")))
        .drop("__rkey")
        .withColumn(
            "delay_sec",
            (F.unix_timestamp(right_ts) - F.unix_timestamp(left_ts)).cast("long"),
        )
    )


def view_click_attribution(
    events: DataFrame,
    max_delay: str = "10 minutes",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Attribute each click to every view by the same user in the
    preceding ``max_delay`` — the canonical two-stream correlation,
    derived from one events frame by type split (each split is its own
    stream/scan). ``how="left_outer"`` keeps unconverted views with
    NULL click columns (conversion-rate denominators)."""
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
        how=how,
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
