"""Batch-vs-stream equivalence (SURVEY.md §5.2): the same transformation
run through readStream on a file source for one trigger must equal the
batch result; late-data drop is exercised via watermark + out-of-order
input."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from scrappy_spark.io import load_table
from scrappy_spark.streaming import (
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_agg,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    """Events fixture re-written as normal-precision parquet so the
    streaming file source can read it (the original is TIMESTAMP(NANOS))."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, SF_DIR, "events").repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream_to_memory(spark, sdf, name, output_mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize(
    "op,mode",
    [
        (tumbling_window_agg, "complete"),
        (sliding_window_agg, "complete"),
        (session_window_agg, "complete"),
    ],
)
def test_stream_equals_batch(spark, events_dir, op, mode):
    batch = load_table(spark, SF_DIR, "events")
    schema = batch.schema
    stream_in = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(events_dir)
    )
    assert stream_in.isStreaming
    name = f"mem_{op.__name__}"
    out = _run_stream_to_memory(spark, op(stream_in), name, mode)
    assert _sorted_rows(out) == _sorted_rows(op(batch))


def test_streaming_dedup_drops_dupes(spark, events_dir):
    batch = load_table(spark, SF_DIR, "events")
    schema = batch.schema
    stream_in = spark.readStream.schema(schema).parquet(events_dir)
    deduped = streaming_dedup(stream_in).groupBy().agg(F.count("*").alias("n"))
    out = _run_stream_to_memory(spark, deduped, "mem_dedup", "complete")
    assert out.first().n == batch.dropDuplicates(["event_id"]).count()


def test_stream_stream_interval_join_equals_batch(spark, events_dir):
    """Watermarked stream-stream interval join (view→click attribution)
    over one availableNow pass equals the batch interval join."""
    from scrappy_spark.streaming.joins import view_click_attribution

    batch = load_table(spark, SF_DIR, "events")
    schema = batch.schema
    stream_in = spark.readStream.schema(schema).parquet(events_dir)
    joined = view_click_attribution(stream_in, watermark="1 hour")
    assert joined.isStreaming
    out = _run_stream_to_memory(spark, joined, "mem_vc_join", "append")
    assert _sorted_rows(out) == _sorted_rows(view_click_attribution(batch))
    assert len(out.collect()) > 0  # fixture actually produces matches


def test_stream_stream_left_outer_interval_join_watermark_bounded(spark, events_dir):
    """LEFT OUTER stream-stream interval join: matched rows equal the
    batch twin exactly; unmatched views emit only once the final
    watermark proves no in-window click can still arrive, so the
    streaming output is the batch output restricted to views older
    than (final watermark − max_delay) — exact on matched rows,
    watermark-bounded on unmatched ones."""
    import datetime as dt

    from scrappy_spark.streaming.joins import view_click_attribution

    cols = ["user_id", "view_id", "view_ts", "click_id", "click_ts", "delay_sec"]

    def named_rows(df):  # column order differs between stream/batch plans
        return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())

    batch = load_table(spark, SF_DIR, "events")
    stream_in = spark.readStream.schema(batch.schema).parquet(events_dir)
    joined = view_click_attribution(stream_in, watermark="1 hour", how="left_outer")
    assert joined.isStreaming
    out = _run_stream_to_memory(spark, joined, "mem_vc_outer", "append")
    got = named_rows(out)
    got_matched = [r for r in got if r[3] is not None]
    got_unmatched = [r for r in got if r[3] is None]
    assert all(r[0] is not None for r in got), "unmatched rows must keep the join key"

    batch_outer = view_click_attribution(batch, how="left_outer")
    expect_matched = named_rows(batch_outer.filter(F.col("click_id").isNotNull()))
    assert got_matched == expect_matched and len(got_matched) > 0

    # final watermark = min over both sides of (max event time − 1 h)
    max_view, max_click = (
        batch.filter(F.col("event_type") == t).agg(F.max("ts")).first()[0]
        for t in ("view", "click")
    )
    w = min(max_view, max_click) - dt.timedelta(hours=1)
    cutoff = w - dt.timedelta(minutes=10)  # view_ts + max_delay vs watermark
    unmatched = batch_outer.filter(F.col("click_id").isNull())
    candidates = (
        named_rows(unmatched.filter(F.col("view_ts") < cutoff)),
        named_rows(unmatched.filter(F.col("view_ts") <= cutoff)),
    )
    assert got_unmatched in candidates and len(got_unmatched) > 0
    # and nothing unmatched leaked past the watermark bound
    assert all(r[2] <= cutoff for r in got_unmatched)


def test_stream_stream_full_outer_interval_join_watermark_bounded(spark, events_dir):
    """FULL OUTER stream-stream interval join: matched rows equal the
    batch twin; unmatched rows on EACH side emit once the watermark
    proves the other side can't still match — views once
    (view_ts + max_delay) < watermark, clicks once click_ts < watermark
    (a matching view would be no later than the click). The coalesced
    key must survive on both kinds of unmatched rows."""
    import datetime as dt

    from scrappy_spark.streaming.joins import view_click_attribution

    cols = ["user_id", "view_id", "view_ts", "click_id", "click_ts", "delay_sec"]

    def named_rows(df):
        return sorted(
            (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    batch = load_table(spark, SF_DIR, "events")
    stream_in = spark.readStream.schema(batch.schema).parquet(events_dir)
    joined = view_click_attribution(stream_in, watermark="1 hour", how="full_outer")
    assert joined.isStreaming
    out = _run_stream_to_memory(spark, joined, "mem_vc_full", "append")
    got = named_rows(out)
    assert all(r[0] is not None for r in got), "coalesced key must never be NULL"
    got_matched = [r for r in got if r[1] is not None and r[3] is not None]
    got_no_click = [r for r in got if r[3] is None]
    got_no_view = [r for r in got if r[1] is None]

    batch_full = view_click_attribution(batch, how="full_outer")
    expect_matched = named_rows(
        batch_full.filter(F.col("view_id").isNotNull() & F.col("click_id").isNotNull())
    )
    assert got_matched == expect_matched and len(got_matched) > 0

    max_view, max_click = (
        batch.filter(F.col("event_type") == t).agg(F.max("ts")).first()[0]
        for t in ("view", "click")
    )
    w = min(max_view, max_click) - dt.timedelta(hours=1)
    view_cutoff = w - dt.timedelta(minutes=10)
    no_click = batch_full.filter(F.col("click_id").isNull())
    assert got_no_click in (
        named_rows(no_click.filter(F.col("view_ts") < view_cutoff)),
        named_rows(no_click.filter(F.col("view_ts") <= view_cutoff)),
    ) and len(got_no_click) > 0
    no_view = batch_full.filter(F.col("view_id").isNull())
    assert got_no_view in (
        named_rows(no_view.filter(F.col("click_ts") < w)),
        named_rows(no_view.filter(F.col("click_ts") <= w)),
    ) and len(got_no_view) > 0


def test_stream_static_enrichment_equals_batch(spark, events_dir):
    from scrappy_spark.streaming.joins import enrich_with_static

    batch = load_table(spark, SF_DIR, "events")
    dim = spark.createDataFrame(
        [(i, "heavy" if i % 3 == 0 else "light") for i in range(200)],
        ["user_id", "segment"],
    )
    stream_in = spark.readStream.schema(batch.schema).parquet(events_dir)
    enriched = enrich_with_static(stream_in, dim).groupBy("segment").count()
    out = _run_stream_to_memory(spark, enriched, "mem_enrich", "complete")
    expected = enrich_with_static(batch, dim).groupBy("segment").count()
    assert _sorted_rows(out) == _sorted_rows(expected)


def test_stream_over_ntz_source_equals_batch(spark, events_dir):
    """A tz-naive (TIMESTAMP_NTZ) stream source — exactly what the
    round-3 regenerated fixtures ship for batch — must still stream:
    read_events_stream normalizes ts to TIMESTAMP before any
    withWatermark sees it. Equivalence vs the batch twin proves the
    cast is value-identity under the UTC session timezone."""
    from pyspark.sql.types import TimestampNTZType

    from scrappy_spark.streaming.windows import read_events_stream

    batch = load_table(spark, SF_DIR, "events")
    ntz_dir = tempfile.mkdtemp(prefix="events_stream_ntz_")
    try:
        # re-write the source with ts as NTZ so the on-disk parquet is
        # Timestamp(isAdjustedToUTC=false)
        batch.withColumn("ts", F.col("ts").cast("timestamp_ntz")).repartition(
            4
        ).write.mode("overwrite").parquet(ntz_dir)
        ntz_schema = spark.read.parquet(ntz_dir).schema
        assert any(
            isinstance(f.dataType, TimestampNTZType) for f in ntz_schema.fields
        ), "precondition: source must actually be NTZ"
        stream_in = read_events_stream(spark, ntz_dir, ntz_schema, max_files_per_trigger=2)
        assert dict(stream_in.dtypes)["ts"] == "timestamp"
        out = _run_stream_to_memory(
            spark, tumbling_window_agg(stream_in), "mem_ntz_tumbling", "complete"
        )
        assert _sorted_rows(out) == _sorted_rows(tumbling_window_agg(batch))
    finally:
        shutil.rmtree(ntz_dir, ignore_errors=True)


def test_stream_over_nanos_long_source_equals_batch(spark, events_dir):
    """A rounds-1/2-style source whose ts column arrives as int64
    nanoseconds must stream correctly: read_events_stream converts via
    exact integer division — a bare cast would read nano counts as
    epoch SECONDS (~30,000 years out) and silently break every
    watermark."""
    from pyspark.sql.types import LongType, StructField, StructType

    from scrappy_spark.streaming.windows import read_events_stream

    batch = load_table(spark, SF_DIR, "events")
    nanos_dir = tempfile.mkdtemp(prefix="events_stream_nanos_")
    try:
        batch.withColumn(
            "ts", (F.unix_micros("ts") * F.lit(1000)).cast("long")
        ).repartition(4).write.mode("overwrite").parquet(nanos_dir)
        schema = StructType(
            [
                f if f.name != "ts" else StructField("ts", LongType())
                for f in batch.schema.fields
            ]
        )
        stream_in = read_events_stream(spark, nanos_dir, schema, max_files_per_trigger=2)
        assert dict(stream_in.dtypes)["ts"] == "timestamp"
        out = _run_stream_to_memory(
            spark, tumbling_window_agg(stream_in), "mem_nanos_tumbling", "complete"
        )
        assert _sorted_rows(out) == _sorted_rows(tumbling_window_agg(batch))
    finally:
        shutil.rmtree(nanos_dir, ignore_errors=True)


def test_stream_bloom_decontamination_equals_batch(spark):
    """Scan-side Bloom decontamination on a STREAM: the bank built from
    a benchmark set collapses to a dense array literal
    (bloom_contains), so the stream is filtered row-by-row with zero
    state — no join, no aggregation — and one availableNow pass equals
    the batch filter exactly (same expression, same bank)."""
    from scrappy_spark.operators import bloom as B

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") < 25).select(F.md5("text").alias("h"))
    dense = B.bank_to_dense(B.bloom_build(bench, "h"))

    d = tempfile.mkdtemp(prefix="docs_stream_")
    try:
        docs.repartition(4).write.mode("overwrite").parquet(d)
        stream_in = spark.readStream.schema(docs.schema).parquet(d)
        flagged = stream_in.select(
            "doc_id", B.bloom_contains(F.md5("text"), dense).alias("contaminated")
        )
        assert flagged.isStreaming
        out = _run_stream_to_memory(spark, flagged, "mem_bloom", "append")
        batch = docs.select(
            "doc_id", B.bloom_contains(F.md5("text"), dense).alias("contaminated")
        )
        assert _sorted_rows(out) == _sorted_rows(batch)
        # every benchmark doc flags itself (no false negatives)
        flagged_ids = {r[0] for r in out.collect() if r[1]}
        assert set(range(25)) <= flagged_ids
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_scan_only_curation_ops_compose_with_streams(spark):
    """hash_sample / mix_corpora / assign_splits / scrub are pure
    column expressions, so they run UNCHANGED on a stream — the
    unified-API guarantee that lets one curation codebase serve both
    the batch backfill and the live ingest path."""
    from scrappy_spark.operators.curation import assign_splits, hash_sample, mix_corpora

    docs = load_table(spark, SF_DIR, "documents")
    d = tempfile.mkdtemp(prefix="docs_cur_stream_")
    try:
        docs.repartition(4).write.mode("overwrite").parquet(d)
        stream_in = spark.readStream.schema(docs.schema).parquet(d)
        pipe = assign_splits(
            mix_corpora(hash_sample(stream_in, 0.5), {"src0": 1.0}, default_rate=0.25)
        ).select("doc_id", "kept", "split")
        assert pipe.isStreaming
        out = _run_stream_to_memory(spark, pipe, "mem_curation", "append")
        batch = assign_splits(
            mix_corpora(hash_sample(docs, 0.5), {"src0": 1.0}, default_rate=0.25)
        ).select("doc_id", "kept", "split")
        assert _sorted_rows(out) == _sorted_rows(batch)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_web_ingestion_ops_compose_with_streams(spark):
    """extract_html_text / normalize_urls / license_scan are pure
    column expressions, so the web-ingestion front door also runs
    UNCHANGED on a live capture stream — same unified-API guarantee as
    the curation ops above."""
    from scrappy_spark.operators.web import (
        extract_html_text,
        license_scan,
        normalize_urls,
    )

    docs = load_table(spark, SF_DIR, "documents")
    pages = docs.select(
        "doc_id",
        F.concat(F.lit("<p>"), "text", F.lit("</p><script>x<y</script>")).alias("html"),
        F.concat(F.lit("HTTPS://WWW."), "source", F.lit(".com:443/A?utm_x=1&id=2#f")).alias("url"),
    )
    d = tempfile.mkdtemp(prefix="web_stream_")
    try:
        pages.repartition(4).write.mode("overwrite").parquet(d)
        stream_in = spark.readStream.schema(pages.schema).parquet(d)

        def pipe(df):
            return license_scan(
                normalize_urls(extract_html_text(df), "url"), text_col="clean_text"
            ).select("doc_id", "clean_text", "url_norm", "license", "canary_hit")

        s = pipe(stream_in)
        assert s.isStreaming
        out = _run_stream_to_memory(spark, s, "mem_web_ingest", "append")
        assert _sorted_rows(out) == _sorted_rows(pipe(pages))
        assert out.count() == docs.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)
