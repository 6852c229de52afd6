"""Connectors (S1–S5) against recorded payloads — zero network — plus
the distributed fetch pipeline and the parquet store merge (EP2)."""

import datetime
import os
import time

import pytest
from pyspark.sql import functions as F

from scrappy_spark.schema import ARTICLES_SCHEMA
from scrappy_spark.sources import normalizers as N
from scrappy_spark.sources.fetch import RateLimiter, collect_all_articles, fetch_articles
from scrappy_spark.sources.store import ArticleStore

PAYLOADS = os.path.join(os.path.dirname(__file__), "payloads")


def _payload(name: str) -> str:
    with open(os.path.join(PAYLOADS, name)) as f:
        return f.read()


def test_normalize_ieee():
    rows = N.normalize_ieee(_payload("ieee.json"), "grid")
    assert len(rows) == 2
    a = rows[0]
    assert a["source"] == "IEEE" and a["term"] == "grid"
    assert a["authors"] == ["Ada Lovelace", "Alan Turing"]
    assert a["keywords"] == ["smart grid", "security"]
    assert a["year"] == 2021  # string "2021" normalized to int
    assert rows[1]["abstract"] is None and rows[1]["keywords"] == []
    assert rows[1]["year"] == 2023


def test_normalize_google_scholar_limit():
    rows = N.normalize_google_scholar(_payload("serpapi.json"), "zero trust", limit=2)
    assert [r["title"] for r in rows] == ["Deep Threat Models", "Zero Trust Surveys"]
    assert all(r["year"] is None and r["authors"] == [] for r in rows)


def test_normalize_semantic_scholar_nested_institutions():
    rows = N.normalize_semantic_scholar(_payload("semantic_scholar.json"), "hospital")
    assert rows[0]["institutions"] == [["Yale University", "US Navy"], ["NASA"]]
    assert rows[0]["year"] == 2022
    assert rows[1]["year"] is None and rows[1]["abstract"] is None


def test_normalize_pubmed():
    rows = N.normalize_pubmed(_payload("pubmed_efetch.xml"), "amr")
    assert rows[0]["title"] == "Antibiotic Resistance Surveillance"
    assert rows[0]["abstract"] == "Background text. Results text."
    assert rows[0]["authors"] == ["Marie Curie"]
    assert rows[0]["institutions"] == [["Institut Pasteur"]]
    assert rows[0]["url"] == ""  # reference leaves PubMed url empty
    assert rows[1]["abstract"] is None


def test_normalize_arxiv():
    rows = N.normalize_arxiv(_payload("arxiv_atom.xml"), "scaling")
    assert rows[0]["title"] == "Scaling Laws Revisited"
    assert rows[0]["authors"] == ["Emmy Noether", "David Hilbert"]
    assert rows[0]["year"] == 2024
    assert rows[1]["abstract"] is None


def _make_recorded_fetcher():
    """Return a self-contained closure (cloudpickle ships it by value —
    a module-level function would be pickled by reference to this test
    module, which executors can't import)."""
    payloads = {
        "IEEE": _payload("ieee.json"),
        "GoogleScholar": _payload("serpapi.json"),
        "SemanticScholar": _payload("semantic_scholar.json"),
        "PubMed": _payload("pubmed_efetch.xml"),
        "arXiv": _payload("arxiv_atom.xml"),
    }

    def fetcher(source: str, term: str) -> str | None:
        return payloads[source]

    return fetcher


_recorded_fetcher = _make_recorded_fetcher()


def test_fetch_articles_distributed(spark):
    df = fetch_articles(
        spark,
        terms=["термін"],
        fetcher=_recorded_fetcher,
        min_interval={s: 0.0 for s in N.NORMALIZERS},
        date_added="2024-06-01",
    )
    assert df.schema == ARTICLES_SCHEMA or [f.name for f in df.schema.fields] == [
        f.name for f in ARTICLES_SCHEMA.fields
    ]
    rows = df.collect()
    assert {r.source for r in rows} == set(N.NORMALIZERS)
    assert len(rows) == 2 + 3 + 2 + 2 + 2
    assert all(str(r.date_added) == "2024-06-01" for r in rows)


def test_fetch_tolerates_failures(spark):
    def flaky(source, term):
        if source == "IEEE":
            raise RuntimeError("boom")
        if source == "PubMed":
            return None
        return _recorded_fetcher(source, term)

    df = fetch_articles(
        spark, ["t"], flaky, min_interval={s: 0.0 for s in N.NORMALIZERS},
        date_added="2024-06-01",
    )
    assert {r.source for r in df.collect()} == {"GoogleScholar", "SemanticScholar", "arXiv"}


def test_collect_all_dedups_by_title(spark):
    df = collect_all_articles(
        spark, ["a", "b"], _recorded_fetcher, date_added="2024-06-01",
        sources=["IEEE", "arXiv"],
    )
    # same payload for both terms → duplicate titles collapse keep-first
    titles = [r.title for r in df.collect()]
    assert len(titles) == len(set(titles)) == 4


def test_rate_limiter_spacing():
    lim = RateLimiter(0.05)
    t0 = time.monotonic()
    for _ in range(3):
        lim.wait()
    assert time.monotonic() - t0 >= 0.10


def test_store_merge_roundtrip(spark, articles, tmp_path):
    store = ArticleStore(spark, str(tmp_path / "store"))
    assert store.read().count() == 0  # empty-store fallback

    batch1 = articles.filter(F.col("source") == "IEEE")
    report1 = store.merge(batch1)
    assert report1.count() == batch1.dropDuplicates(["title"]).count()

    # arrays round-trip as real types (not stringified like the CSV store)
    kw = store.read().filter(F.col("title") == "Edge Computing Platforms").first().keywords
    assert kw == ["edge computing", "iot"]

    # second merge: existing wins, duplicate titles add nothing
    report2 = store.merge(articles)
    assert report2.filter(F.col("title") == "Edge Computing Platforms").count() == 0
    gnn = store.read().filter(F.col("title") == "Graph Neural Networks Survey").collect()
    assert len(gnn) == 1 and gnn[0].source == "IEEE"  # keep-first by date,source

    # idempotence: merging the same full set again adds 0
    assert store.merge(articles).count() == 0


def _partition_file_mtimes(store_path: str, part: str) -> dict[str, float]:
    d = os.path.join(store_path, part)
    return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}


def test_merge_is_partition_selective(spark, articles, tmp_path):
    """A merge whose new rows touch only some sources must leave every
    other source partition's files byte-untouched on disk (mtimes and
    names identical) — the 100 TB guarantee: merge cost scales with the
    batch, not the store."""
    path = str(tmp_path / "store")
    store = ArticleStore(spark, path)
    store.merge(articles)

    untouched = {
        p: _partition_file_mtimes(path, p)
        for p in os.listdir(path)
        if p.startswith("source=") and p != "source=arXiv"
    }
    assert untouched  # sanity: multiple partitions exist

    time.sleep(1.1)  # ensure an overwrite would move mtime
    batch = spark.createDataFrame(
        [("arXiv", "Brand New arXiv Paper", "new", "http://n/1",
          ["New"], [[]], [], "new", 2024, datetime.date(2024, 2, 1))],
        ARTICLES_SCHEMA,
    )
    report = store.merge(batch)
    assert report.count() == 1

    for p, before in untouched.items():
        assert _partition_file_mtimes(path, p) == before, f"{p} was rewritten"
    # the touched partition kept its existing rows and gained the new one
    arxiv = store.read().filter(F.col("source") == "arXiv")
    assert arxiv.filter(F.col("title") == "Brand New arXiv Paper").count() == 1
    assert arxiv.filter(F.col("title") == "Quantum Error Correction").count() == 1
    # no hidden backup/staging leftovers
    assert not [d for d in os.listdir(path) if d.startswith(".old.")]
    assert not os.path.exists(path + ".staging")


def test_merge_noop_batch_touches_nothing(spark, articles, tmp_path):
    path = str(tmp_path / "store")
    store = ArticleStore(spark, path)
    store.merge(articles)
    before = {
        p: _partition_file_mtimes(path, p)
        for p in os.listdir(path)
        if p.startswith("source=")
    }
    time.sleep(1.1)
    assert store.merge(articles).count() == 0  # all titles already present
    after = {
        p: _partition_file_mtimes(path, p)
        for p in os.listdir(path)
        if p.startswith("source=")
    }
    assert after == before


def test_store_recovers_from_interrupted_swap(spark, articles, tmp_path):
    """Simulate a crash between the two swap renames: live partition
    renamed to .old, replacement never arrived. read() must roll the
    backup back and serve the pre-merge snapshot."""
    path = str(tmp_path / "store")
    store = ArticleStore(spark, path)
    store.merge(articles)
    n_before = store.read().count()

    part = "source=IEEE"
    os.rename(os.path.join(path, part), os.path.join(path, ".old." + part))
    assert store.read().count() == n_before  # rolled back

    # completed-swap leftover: live exists AND .old exists → backup dropped
    os.makedirs(os.path.join(path, ".old." + part))
    assert store.read().count() == n_before
    assert not os.path.exists(os.path.join(path, ".old." + part))


# ---------------------------------------------------------------------------
# Spark 4 custom Python DataSource (spark.read.format("scrappy_articles"))
# ---------------------------------------------------------------------------

def test_articles_datasource_reads_recorded_payloads(spark):
    import pytest
    from scrappy_spark.sources.datasource import ArticlesDataSource, READER_SCHEMA

    spark.dataSource.register(ArticlesDataSource)
    df = (
        spark.read.format("scrappy_articles")
        .option("payload_dir", PAYLOADS)
        .option("terms", "ransomware,botnet")
        .load()
    )
    assert df.schema == READER_SCHEMA
    # one InputPartition per (source, term) → parallel executor-side parse
    assert df.rdd.getNumPartitions() == len(N.NORMALIZERS) * 2
    rows = df.collect()
    # every (source, term) cell equals the direct normalizer output
    for src, fname in [("IEEE", "ieee.json"), ("arXiv", "arxiv_atom.xml")]:
        expect = {r["title"] for r in N.NORMALIZERS[src](_payload(fname), "ransomware")}
        got = {r.title for r in rows if r.source == src and r.term == "ransomware"}
        assert got == expect
    # source selection narrows partitions and rows
    sub = (
        spark.read.format("scrappy_articles")
        .option("payload_dir", PAYLOADS)
        .option("sources", "PubMed")
        .load()
    )
    assert {r.source for r in sub.collect()} == {"PubMed"}

    with pytest.raises(Exception, match="unknown sources"):
        (
            spark.read.format("scrappy_articles")
            .option("payload_dir", PAYLOADS)
            .option("sources", "nope")
            .load()
            .collect()
        )


def test_store_compact_preserves_content(spark, tmp_path):
    """Fragment a partition with several small merges, compact, and
    assert: identical content, fewer files, untouched partitions'
    files byte-identical (never rewritten)."""
    import glob

    store = ArticleStore(spark, str(tmp_path / "store"))
    def batch(i, source):
        return spark.createDataFrame(
            [(source, f"title {source} {i}", None, None, [], [[]], [],
              "t", 2020, datetime.date(2024, 6, 1))],
            ARTICLES_SCHEMA,
        )
    store.merge(batch(0, "IEEE"))
    store.merge(batch(0, "arXiv"))
    # fragment source=IEEE the way the streaming append sink does:
    # one small file per micro-batch
    for i in range(1, 6):
        batch(i, "IEEE").coalesce(1).write.mode("append").partitionBy(
            "source"
        ).parquet(str(tmp_path / "store"))
    before = sorted(map(tuple, store.read().collect()))
    arxiv_files = {
        p: os.path.getmtime(p)
        for p in glob.glob(str(tmp_path / "store" / "source=arXiv" / "*.parquet"))
    }
    report = store.compact(min_files=4, target_files=1)
    assert "source=IEEE" in report
    nb, na = report["source=IEEE"]
    assert nb >= 4 and na == 1
    assert "source=arXiv" not in report  # below threshold → untouched
    after_files = {
        p: os.path.getmtime(p)
        for p in glob.glob(str(tmp_path / "store" / "source=arXiv" / "*.parquet"))
    }
    assert after_files == arxiv_files
    assert sorted(map(tuple, store.read().collect())) == before


def test_store_merge_null_title_not_duplicated(spark, tmp_path):
    """Existing-wins must hold for NULL titles too: a plain-equality
    anti-join never matches NULL, so without the null-safe insert gate
    a NULL-title row would re-insert on every merge."""
    from pyspark.sql import types as T

    store = ArticleStore(spark, str(tmp_path / "nstore"))
    relaxed = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in ARTICLES_SCHEMA.fields]
    )
    def batch(day):
        return spark.createDataFrame(
            [("IEEE", None, "no title yet", None, [], [[]], [], "t", 2020,
              datetime.date(2024, 6, day)),
             ("IEEE", f"Titled {day}", None, None, [], [[]], [], "t", 2020,
              datetime.date(2024, 6, day))],
            relaxed,
        )
    store.merge(batch(1))
    store.merge(batch(2))
    rows = store.read().collect()
    assert sum(1 for r in rows if r.title is None) == 1  # one NULL-title row
    assert sum(1 for r in rows if r.title is not None) == 2  # both titled rows


def test_articles_datasource_streams_term_per_batch(spark, tmp_path):
    """Streaming read of the same recorded payloads: availableNow
    drains one micro-batch per term, the union of batches equals the
    batch read, and replay between offsets is deterministic."""
    from scrappy_spark.sources.datasource import (
        ArticlesDataSource,
        ArticlesStreamReader,
    )

    spark.dataSource.register(ArticlesDataSource)
    stream = (
        spark.readStream.format("scrappy_articles")
        .option("payload_dir", PAYLOADS)
        .option("terms", "ransomware,botnet")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_articles")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    # one micro-batch per term: drain until read() reports caught-up
    # (availableNow would stop after the first prefetched batch)
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT source, term, title FROM stream_articles").collect()

    batch = (
        spark.read.format("scrappy_articles")
        .option("payload_dir", PAYLOADS)
        .option("terms", "ransomware,botnet")
        .load()
        .select("source", "term", "title")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert {t for (_, t, _) in map(tuple, got)} == {"ransomware", "botnet"}

    # offset replay (task-retry path) is deterministic and term-sliced
    rdr = ArticlesStreamReader(
        {"payload_dir": PAYLOADS, "terms": "ransomware,botnet"}
    )
    replay = list(rdr.readBetweenOffsets({"term_idx": 0}, {"term_idx": 1}))
    per_batch, nxt = rdr.read({"term_idx": 0})
    assert list(per_batch) == replay and nxt == {"term_idx": 1}
    drained, same = rdr.read({"term_idx": 2})
    assert list(drained) == [] and same == {"term_idx": 2}


def test_merge_articles_snapshot_first_and_new(spark, articles, tmp_path):
    """The snapshot-backed articles merge (VERDICT r11 #4 adoption):
    keep='first' preserves the reference's existing-wins semantics as
    one append commit; keep='new' upserts via merge_keys in one
    commit — both time-travelable."""
    from scrappy_spark.sources.snapshots import SnapshotTable
    from scrappy_spark.sources.store import merge_articles_snapshot

    t = SnapshotTable(spark, str(tmp_path / "snap_store"))
    batch1 = articles.filter(F.col("source") == "IEEE")
    merge_articles_snapshot(t, batch1)
    n0 = t.read().count()
    assert n0 == batch1.dropDuplicates(["title"]).count()

    # keep-first: re-merging everything adds only unseen titles,
    # existing rows win (the reference's semantics), one new version
    added = merge_articles_snapshot(t, articles)
    assert added.filter(F.col("title") == "Edge Computing Platforms").count() == 0
    gnn = t.read().filter(F.col("title") == "Graph Neural Networks Survey").collect()
    assert len(gnn) == 1 and gnn[0].source == "IEEE"
    assert t.current_version() == 1
    # idempotent: nothing new on replay, no commit
    assert merge_articles_snapshot(t, articles).count() == 0
    assert t.current_version() == 1

    # keep='new': the batch replaces its matched titles in ONE commit
    upd = batch1.limit(1).withColumn("abstract", F.lit("REVISED"))
    title = upd.first().title
    merge_articles_snapshot(t, upd, keep="new")
    assert t.current_version() == 2
    got = t.read().filter(F.col("title") == title).collect()
    assert len(got) == 1 and got[0].abstract == "REVISED"
    # time travel still shows the pre-upsert row
    old = t.read(1).filter(F.col("title") == title).first()
    assert old.abstract != "REVISED"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep must be"):
        merge_articles_snapshot(t, upd, keep="both")
