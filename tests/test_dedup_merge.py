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


def test_scd2_merge_versions_and_idempotence(spark):
    """Changed keys close + reopen; identical updates are no-ops;
    re-applying the same batch leaves the history unchanged; a second
    batch builds a 3-version chain with contiguous intervals."""
    import datetime

    from scrappy_spark.operators.scd import scd2_merge

    ts = lambda s: datetime.datetime.fromisoformat(s)
    hist = spark.createDataFrame(
        [(1, "gold", ts("1995-01-01"), None), (2, "iron", ts("1995-01-01"), None)],
        "id long, tier string, valid_from timestamp, valid_to timestamp",
    )
    upd1 = spark.createDataFrame(
        [(1, "platinum", ts("1996-01-01")), (2, "iron", ts("1996-01-01"))],
        "id long, tier string, effective_date timestamp",
    )
    m1 = scd2_merge(hist, upd1, key_col="id", tracked_cols=["tier"])
    rows = {(r.id, r.tier, r.valid_to is None) for r in m1.collect()}
    assert rows == {
        (1, "gold", False),      # closed
        (1, "platinum", True),   # reopened
        (2, "iron", True),       # identical update: untouched
    }

    again = scd2_merge(m1, upd1, key_col="id", tracked_cols=["tier"])
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, m1.collect()))

    upd2 = spark.createDataFrame(
        [(1, "diamond", ts("1997-01-01"))],
        "id long, tier string, effective_date timestamp",
    )
    m2 = scd2_merge(again, upd2, key_col="id", tracked_cols=["tier"])
    v1 = sorted(
        [(r.tier, r.valid_from, r.valid_to) for r in m2.collect() if r.id == 1],
        key=lambda t: t[1],
    )
    assert [t[0] for t in v1] == ["gold", "platinum", "diamond"]
    # contiguous intervals: each version closes where the next opens
    assert v1[0][2] == v1[1][1] and v1[1][2] == v1[2][1] and v1[2][2] is None
