"""Property-based invariants (SURVEY.md §5.2) under Hypothesis-generated
article batches: merge idempotence, dedup subset, keep-first stability."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scrappy_spark.operators.dedup import (
    dedup_keep_first,
    merge_keep_existing,
    newly_added,
)
from scrappy_spark.schema import ARTICLES_SCHEMA

_TITLES = ["alpha", "beta", "gamma", "delta"]
_SOURCES = ["IEEE", "arXiv", "PubMed"]


def _article(title: str, source: str, day: int):
    return (
        source, title, None, "", [], [[]], [], "t", None,
        datetime.date(2024, 1, day),
    )


_batches = st.lists(
    st.tuples(
        st.sampled_from(_TITLES),
        st.sampled_from(_SOURCES),
        st.integers(min_value=1, max_value=5),
    ),
    min_size=0,
    max_size=8,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(batch=_batches)
@_SETTINGS
def test_merge_idempotent_and_monotone(spark, batch):
    rows = [_article(t, s, d) for t, s, d in batch]
    df = spark.createDataFrame(rows, ARTICLES_SCHEMA)
    base = dedup_keep_first(df, ["title"], ["date_added", "source"])
    merged_once = merge_keep_existing(base, df, keys=["title"], tiebreak=["date_added", "source"])
    # idempotent: merging a batch into its own dedup adds nothing
    assert merged_once.count() == base.count()
    assert newly_added(base, df, keys=["title"]).count() == 0
    # never deletes: every existing title survives the merge
    assert merged_once.select("title").subtract(base.select("title")).count() == 0


@given(batch=_batches)
@_SETTINGS
def test_dedup_is_subset_with_unique_keys(spark, batch):
    rows = [_article(t, s, d) for t, s, d in batch]
    df = spark.createDataFrame(rows, ARTICLES_SCHEMA)
    out = dedup_keep_first(df, ["title"], ["date_added", "source"])
    n_titles = df.select("title").distinct().count()
    assert out.count() == n_titles
    assert out.select("title").distinct().count() == n_titles
    # subset property: every surviving row exists in the input
    assert out.subtract(df).count() == 0
