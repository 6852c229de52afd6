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


_groups = st.lists(
    st.tuples(st.integers(min_value=0, max_value=99), st.sampled_from(["a", "b", "c"])),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


@given(rows=_groups, quota=st.integers(min_value=1, max_value=6))
@_SETTINGS
def test_quota_sample_invariants(spark, rows, quota):
    """Output ⊆ input; per-group size == min(quota, group size); stable
    across calls."""
    from scrappy_spark.operators.curation import quota_sample

    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = quota_sample(df, quota=quota, group_col="source", id_col="doc_id").collect()
    in_set = set(rows)
    assert all((r.doc_id, r.source) in in_set for r in out)
    sizes: dict[str, int] = {}
    for r in out:
        sizes[r.source] = sizes.get(r.source, 0) + 1
    truth: dict[str, int] = {}
    for _, g in rows:
        truth[g] = truth.get(g, 0) + 1
    assert sizes == {g: min(quota, n) for g, n in truth.items() if min(quota, n) > 0}


_vectors = st.lists(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=2,
        max_size=6,
    ),
    min_size=1,
    max_size=8,
)


@given(vecs=_vectors)
@_SETTINGS
def test_quantize_roundtrip_bound(spark, vecs):
    """Every dequantized element is within half a quantization step of
    the original; codes stay in [0, 255]."""
    from scrappy_spark.operators.similarity import dequantize_int8, quantize_int8

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    for r in dequantize_int8(quantize_int8(df)).collect():
        assert all(0 <= c <= 255 for c in r.codes)
        for x, xhat in zip(r.embedding, r.dequantized):
            assert abs(x - xhat) <= r.q_scale / 2 + 1e-6
