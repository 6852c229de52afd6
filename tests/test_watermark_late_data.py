"""Watermark semantics: an event arriving after the watermark has
passed its window must be DROPPED from the streaming aggregate — the
state-bounding guarantee that makes windowed aggs runnable forever.

Two sequential availableNow runs share a checkpoint, so the second run
starts with the watermark persisted by the first — deterministic late-
row arrival (a single multi-file trigger gives no file-order guarantee).
"""

import datetime
import shutil
import tempfile

from pyspark.sql import functions as F

from scrappy_spark.streaming import tumbling_window_agg

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _events(spark, rows):
    data = [
        (i, datetime.datetime(2024, 1, 1, h, m), 1, "click", 1.0)
        for i, (h, m) in enumerate(rows)
    ]
    return spark.createDataFrame(data, SCHEMA)


def test_late_event_dropped_after_watermark(spark):
    base = tempfile.mkdtemp(prefix="late_")
    updates: list = []

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(f"{base}/in")
        agg = tumbling_window_agg(stream, window="10 minutes", watermark="30 minutes")

        def sink(df, batch_id):
            updates.extend(df.collect())

        q = (
            agg.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{base}/ckpt")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    try:
        # run 1: events 00:05 and 01:00 → watermark persists as
        # 01:00 − 30 min = 00:30
        _events(spark, [(0, 5), (1, 0)]).coalesce(1).write.mode("append").parquet(
            f"{base}/in"
        )
        run_once()
        # run 2: a LATE event at 00:06 (window 00:00 is past the
        # watermark) plus an on-time event at 01:10
        _events(spark, [(0, 6), (1, 10)]).coalesce(1).write.mode("append").parquet(
            f"{base}/in"
        )
        run_once()

        by_window = {}
        for r in updates:
            by_window.setdefault(str(r.w_start), []).append(r.n_events)
        # the 00:00 window only ever saw ONE event — the late row was
        # dropped, never producing an n_events=2 update
        assert by_window["2024-01-01 00:00:00"] == [1]
        assert by_window["2024-01-01 01:10:00"] == [1]

        # contrast: the batch twin (no watermark) counts the late row
        batch = tumbling_window_agg(
            spark.read.parquet(f"{base}/in"), window="10 minutes", watermark=None
        )
        n = batch.filter(F.col("w_start") == "2024-01-01 00:00:00").first().n_events
        assert n == 2
    finally:
        shutil.rmtree(base, ignore_errors=True)
