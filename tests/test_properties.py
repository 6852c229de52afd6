"""Property-based invariants (SURVEY.md §5.2) under Hypothesis-generated
article batches: merge idempotence, dedup subset, keep-first stability."""

import datetime

from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F
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


_span_words = st.sampled_from(["w1", "w2", "w3", "w4", "w5", "shared"])
_span_docs = st.lists(
    st.lists(_span_words, min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)


@given(docs=_span_docs)
@_SETTINGS
def test_remove_repeated_spans_invariants(spark, docs):
    """For ANY corpus: n_removed accounting is exact, surviving tokens
    are an order-preserving subsequence of the original, and removal
    only fires when the span genuinely occurs in >= 2 documents."""
    from scrappy_spark.operators.curation import remove_repeated_spans

    L = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in remove_repeated_spans(df, span_len=L).collect()}

    # which L-token spans occur in >= 2 docs (ground truth, python-side)
    span_docs = {}
    for i, toks in enumerate(docs):
        for p in range(len(toks) - L + 1):
            span_docs.setdefault(" ".join(toks[p : p + L]), set()).add(i)
    repeated = {s for s, ds in span_docs.items() if len(ds) >= 2}

    assert set(out) == set(range(len(docs)))  # every doc surfaces
    for i, toks in enumerate(docs):
        r = out[i]
        kept = r.clean_text.split() if r.clean_text else []
        assert r.n_tokens == len(toks)
        assert r.n_removed == len(toks) - len(kept)  # exact accounting
        # order-preserving subsequence of the original tokens
        it = iter(toks)
        assert all(any(t == k for t in it) for k in kept)
        has_repeated = any(
            " ".join(toks[p : p + L]) in repeated for p in range(len(toks) - L + 1)
        )
        if not has_repeated:
            assert r.n_removed == 0 and kept == toks
        else:
            assert r.n_removed >= L


# ---------------------------------------------------------------------------
# Round-5 operators
# ---------------------------------------------------------------------------

_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),
        st.sampled_from(
            ["alpha beta gamma delta", "one two three four", "alpha beta gamma delta epsilon",
             "totally different words here", "one two three four five"]
        ),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(docs=_corpora, frac=st.sampled_from([0.0, 0.25, 0.5, 0.9]))
@_SETTINGS
def test_temperature_sample_invariants(spark, docs, frac):
    """Kept set ⊆ input; determinism; empty target keeps nothing;
    every group's kept count never exceeds its size."""
    from scrappy_spark.operators.curation import temperature_sample

    df = spark.createDataFrame(
        [(i, t, ["en", "fr", "zh"][i % 3]) for i, t in docs],
        "doc_id long, text string, lang string",
    )
    kept = temperature_sample(df, alpha=0.5, target_frac=frac)
    kept_ids = sorted(r["doc_id"] for r in kept.collect())
    all_ids = {i for i, _ in docs}
    assert set(kept_ids) <= all_ids
    again = sorted(r["doc_id"] for r in temperature_sample(df, alpha=0.5, target_frac=frac).collect())
    assert kept_ids == again
    if frac == 0.0:
        assert kept_ids == []


@given(docs=_corpora)
@_SETTINGS
def test_incremental_equals_full_minus_base_base(spark, docs):
    """For ANY split of the corpus, incremental pairs = full-corpus
    pairs minus base-base pairs, with n_match preserved."""
    from scrappy_spark.operators.dedup_approx import (
        incremental_minhash_pairs,
        minhash_candidate_pairs,
        minhash_signatures,
    )

    df = spark.createDataFrame(list(docs), "doc_id long, text string")
    cut = 30
    sig = minhash_signatures(df)
    sig_new = sig.filter(F.col("doc_id") < cut)
    sig_base = sig.filter(F.col("doc_id") >= cut)
    inc = {
        (r["id_a"], r["id_b"]): r["n_match"]
        for r in incremental_minhash_pairs(sig_new, sig_base).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["n_match"]
        for r in minhash_candidate_pairs(sig).collect()
    }
    expected = {p: m for p, m in full.items() if not (p[0] >= cut and p[1] >= cut)}
    assert inc == expected


# ---------------------------------------------------------------------------
# Round-7 audit operators: reconcile / join advisor / KS / CUSUM
# ---------------------------------------------------------------------------

_recon_sides = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # key
        st.sampled_from(["a", "b", None]),  # value
    ),
    min_size=0,
    max_size=7,
    unique_by=lambda t: t[0],  # primary-key uniqueness per side
)


@given(left=_recon_sides, right=_recon_sides)
@_SETTINGS
def test_reconcile_partitions_the_key_space(spark, left, right):
    """n_only_left + n_both == |left| (and symmetrically), and
    n_match + n_mismatch == n_both — the scoreboard partitions keys
    with nothing lost or double-counted; counts match a dict replica."""
    from scrappy_spark.operators.reconcile import reconcile_report

    ldf = spark.createDataFrame(left or [(99, "a")], "k int, s string")
    rdf = spark.createDataFrame(right or [(98, "a")], "k int, s string")
    lrows = dict(left or [(99, "a")])
    rrows = dict(right or [(98, "a")])
    rep = reconcile_report(ldf, rdf, ["k"], ["s"]).collect()[0]
    both = set(lrows) & set(rrows)
    assert rep["n_only_left"] == len(set(lrows) - set(rrows))
    assert rep["n_only_right"] == len(set(rrows) - set(lrows))
    assert rep["n_both"] == len(both)
    assert rep["n_match"] + rep["n_mismatch"] == rep["n_both"]
    assert rep["n_match"] == sum(1 for k in both if lrows[k] == rrows[k])


_adv_sides = st.lists(
    st.sampled_from(["a", "b", "c", "d"]),
    min_size=0,
    max_size=10,
)


@given(left=_adv_sides, right=_adv_sides)
@_SETTINGS
def test_join_advisor_cardinality_is_exact(spark, left, right):
    """est_out_rows equals the true inner-join row count, always."""
    from scrappy_spark.operators.profile import join_advisor

    ldf = spark.createDataFrame([(v,) for v in left] or [("zz",)], "k string")
    rdf = spark.createDataFrame([(v,) for v in right] or [("zz",)], "k string")
    row = join_advisor(ldf, rdf, "k").collect()[0]
    assert row["est_out_rows"] == ldf.join(rdf, "k").count()
    assert row["salt_factor"] >= 1


_ks_samples = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9), st.booleans()),
    min_size=2,
    max_size=12,
)


@given(sample=_ks_samples)
@_SETTINGS
def test_ks_drift_bounds_and_reference(spark, sample):
    """0 <= D <= 1 (in ppm), and d_num matches a brute-force ECDF scan;
    empty sides report 0 by convention."""
    from scrappy_spark.operators.profile import ks_drift

    df = spark.createDataFrame(
        [("g", v, int(s)) for v, s in sample], "g string, v long, s int"
    )
    got = ks_drift(
        df, "v", is_right=F.col("s") == 1, group_cols=["g"]
    ).collect()[0]
    lvals = [v for v, s in sample if not s]
    rvals = [v for v, s in sample if s]
    if not lvals or not rvals:
        assert got["d_num"] == 0 and got["d_ppm"] == 0
        return
    n1, n2 = len(lvals), len(rvals)
    expect = max(
        abs(
            sum(1 for x in lvals if x <= p) * n2
            - sum(1 for x in rvals if x <= p) * n1
        )
        for p in sorted(set(lvals + rvals))
    )
    assert got["d_num"] == expect
    assert 0 <= got["d_ppm"] <= 1_000_000


_cusum_series = st.lists(
    st.integers(min_value=0, max_value=50), min_size=1, max_size=12
)


@given(vals=_cusum_series, k=st.integers(0, 5), h=st.integers(1, 60))
@_SETTINGS
def test_cusum_equals_recursion_under_hypothesis(spark, vals, k, h):
    from scrappy_spark.operators.profile import cusum_changepoints

    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "g int, t int, v long"
    )
    got = {
        r["seq"]: r
        for r in cusum_changepoints(
            df, "v", ["t"], ["g"], slack=k, threshold=h
        ).collect()
    }
    n, s = len(vals), sum(vals)
    sp = sn = 0
    for i, v in enumerate(vals, start=1):
        sp = max(0, sp + (n * v - s - n * k))
        sn = max(0, sn - (n * v - s + n * k))
        assert got[i]["s_pos"] == sp and got[i]["s_neg"] == sn
