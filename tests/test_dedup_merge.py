"""Dedup + merge semantics (D1/D2/M1/J1) incl. the keep-first guarantee
and merge idempotence (reference README.md:17 'never deletes existing')."""

from pyspark.sql import functions as F

from scrappy_spark.operators.dedup import (
    dedup_arbitrary,
    dedup_keep_first,
    merge_keep_existing,
    newly_added,
)


def test_dedup_within_batch(articles):
    out = dedup_arbitrary(articles, ["title"])
    assert out.count() == articles.select("title").distinct().count()


def test_keep_first_is_deterministic(articles):
    out = dedup_keep_first(articles, keys=["title"], order_by=["date_added", "source"])
    dup = out.filter(F.col("title") == "Graph Neural Networks Survey").collect()
    assert len(dup) == 1
    # earliest date_added, then source asc ('IEEE' < 'arXiv')
    assert dup[0].source == "IEEE"
    # re-running yields the identical representative
    again = dedup_keep_first(articles, keys=["title"], order_by=["date_added", "source"])
    assert again.filter(F.col("title") == "Graph Neural Networks Survey").first().source == "IEEE"


def test_merge_existing_wins(spark, articles):
    existing = articles.filter(F.col("source") == "arXiv")
    new = articles.filter(F.col("source") == "PubMed")  # same GNN title
    merged = merge_keep_existing(existing, new, keys=["title"], tiebreak=["source"])
    gnn = merged.filter(F.col("title") == "Graph Neural Networks Survey").collect()
    assert len(gnn) == 1 and gnn[0].source == "arXiv"


def test_merge_idempotent(articles):
    """Re-merging the same batch adds 0 rows."""
    base = dedup_keep_first(articles, keys=["title"], order_by=["source"])
    once = merge_keep_existing(base, base, keys=["title"], tiebreak=["source"])
    assert once.count() == base.count()
    assert newly_added(base, base, keys=["title"]).count() == 0


def test_newly_added_report(articles):
    existing = articles.filter(F.col("title") == "Graph Neural Networks Survey")
    out = newly_added(existing, articles, keys=["title"])
    assert out.filter(F.col("title") == "Graph Neural Networks Survey").count() == 0
    assert out.count() == articles.filter(F.col("title") != "Graph Neural Networks Survey").count()
