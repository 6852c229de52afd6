"""Round-6 wave: BM25 retrieval, k-core peeling, keep-first fragment
dedup — behavior pins on constructed inputs (the declared queries'
oracles cover the fixture corpus; these pin the semantics the oracles
can't isolate, e.g. exact peeling depth and rank ordering)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from scrappy_spark.operators.bm25 import bm25_retrieve
from scrappy_spark.operators.curation import dedup_fragments
from scrappy_spark.operators.graph import kcore


def test_bm25_ranks_exact_match_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle partition join"),
            (2, "spark spark spark spark spark spark"),
            (3, "gradient descent training loop"),
            (4, "shuffle partition"),
        ],
        ["doc_id", "text"],
    )
    queries = spark.createDataFrame(
        [(100, "shuffle partition")], ["query_id", "query_text"]
    )
    out = bm25_retrieve(docs, queries, k=3).collect()
    # doc 4 matches both rare terms with the shortest length; doc 3
    # matches nothing and must be absent entirely.
    assert [r.doc_id for r in out] == [4, 1]
    assert out[0].rank == 1 and out[0].n_matched == 2
    assert all(r.score_micro > 0 for r in out)


def test_bm25_score_matches_hand_formula(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "c d")], ["doc_id", "text"]
    )
    queries = spark.createDataFrame([(9, "b")], ["query_id", "query_text"])
    row = bm25_retrieve(docs, queries, k=1).first()
    # N=3 docs, L=6 tokens, df(b)=1, tf=1, dl=2
    idf_micro = round(math.log((3 - 1 + 0.5) / (1 + 0.5) + 1) * 1_000_000)
    expect = (idf_micro * 22 * 1 * 6) // (10 * 1 * 6 + 3 * 6 + 9 * 2 * 3)
    assert row.doc_id == 1 and row.score_micro == expect


def test_kcore_peels_tail_chain(spark):
    # Triangle {1,2,3} is the 2-core; the 4-5 tail must peel in TWO
    # cascading rounds (5 first, then 4) — the iterative part.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    out = {r.node: r.core_degree for r in kcore(edges, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_empty_when_graph_collapses(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    assert kcore(edges, k=2).count() == 0


def test_dedup_fragments_keeps_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta"),
            (2, "beta\ngamma\nalpha"),
            (3, "beta"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dedup_fragments(docs).collect()}
    assert out[1].clean_text == "alpha\nbeta"
    assert out[2].clean_text == "gamma"  # alpha+beta seen in doc 1
    assert out[3].clean_text == ""  # fully deduplicated
    assert (out[3].n_frags, out[3].n_kept) == (1, 0)
    assert (out[2].n_frags, out[2].n_kept) == (3, 1)


def test_dedup_fragments_within_doc_repeat(spark):
    docs = spark.createDataFrame([(7, "x\ny\nx")], ["doc_id", "text"])
    row = dedup_fragments(docs).first()
    assert row.clean_text == "x\ny" and row.n_kept == 2


# ---------------------------------------------------------------------------
# exact-substring dedup (ExactSubstr family)
# ---------------------------------------------------------------------------


def _exact_substr_ref(docs: list[tuple[int, str]], L: int) -> dict[int, str]:
    """Direct per-character reference of the keep-first coverage rule:
    char p of doc d is dropped iff some L-window starting at q ∈
    [p-L+1, p] has content whose first corpus occurrence (by (doc,
    pos)) is strictly earlier than (d, q)."""
    first: dict[str, tuple[int, int]] = {}
    for did, text in sorted(docs):
        for q in range(len(text) - L + 1):
            g = text[q : q + L]
            if g not in first or (did, q) < first[g]:
                first[g] = (did, q)
    out = {}
    for did, text in docs:
        dup_starts = [
            q
            for q in range(len(text) - L + 1)
            if first[text[q : q + L]] < (did, q)
        ]
        covered = set()
        for q in dup_starts:
            covered.update(range(q, q + L))
        out[did] = "".join(c for p, c in enumerate(text) if p not in covered)
    return out


def test_exact_substring_dedup_semantics(spark):
    from scrappy_spark.operators.curation import exact_substring_dedup

    L = 10
    s1 = "abcdefghijklmnop"      # 16 chars, unique to doc 0
    s2 = "QRSTUVWXYZ012345"      # 16 chars, shared doc 0 -> doc 1
    s3 = "zyxwvutsrqponmlk"      # unique to doc 1
    s4 = "REPEATREPEATXX"        # repeated within doc 4
    docs = [
        (0, s1 + s2),
        (1, s3 + s2),            # its s2 span must be dropped
        (2, s1 + s2),            # exact copy of doc 0 -> fully dropped
        (3, "tiny"),             # shorter than L -> untouched
        (4, s4 + s4),            # within-doc repeat
        (5, ""),                 # empty doc survives as a row
    ]
    expect = _exact_substr_ref(docs, L)
    out = {
        r.doc_id: r
        for r in exact_substring_dedup(
            spark.createDataFrame(docs, ["doc_id", "text"]), min_len=L
        ).collect()
    }
    assert set(out) == set(expect)
    for did, text in docs:
        assert out[did].cleaned_text == expect[did], did
        assert out[did].n_chars == len(text)
        assert out[did].n_dropped == len(text) - len(expect[did])
    assert out[2].cleaned_text == ""          # exact copy fully covered
    assert out[3].cleaned_text == "tiny"      # below threshold
    assert out[1].cleaned_text == s3          # shared suffix removed


def test_exact_substring_merge_bucket_seams_exact(spark):
    """The r14 two-level covered-interval merge (level 1 within
    (doc, q div XS_MERGE_BUCKET), level 2 across buckets) must equal
    the reference for islands that START in one bucket and END in
    another, and for islands that touch a bucket seam at exactly
    prev_end + 1. Shrinking the bucket width forces seams onto a small
    fixture (the chunk-stride test precedent); the result must be
    invariant to the width."""
    import scrappy_spark.operators.curation as cur

    L = 6
    shared = "SHAREDSPANABCDEFGH"          # 18 chars: island wider than bucket 8
    doc0 = "x" * 3 + shared + "y" * 7      # source of the shared span
    doc1 = "QQ" + shared + "ZZZZ" + shared  # two islands, seam-crossing
    docs = [(0, doc0), (1, doc1), (2, doc0)]
    expect = _exact_substr_ref(docs, L)
    orig = cur.XS_MERGE_BUCKET
    try:
        for bucket in (4, 8, 64):          # widths below/at island scale
            cur.XS_MERGE_BUCKET = bucket
            out = {
                r.doc_id: r.cleaned_text
                for r in cur.exact_substring_dedup(
                    spark.createDataFrame(docs, ["doc_id", "text"]), min_len=L
                ).collect()
            }
            assert out == expect, bucket
    finally:
        cur.XS_MERGE_BUCKET = orig


def test_exact_substring_dedup_collapse_neutrality(spark):
    """Many exact copies + a cross-doc overlap: the collapse-first
    fast path must equal the direct reference on every doc."""
    from scrappy_spark.operators.curation import exact_substring_dedup

    L = 8
    base = "the quick brown fox jumps over the lazy dog"
    docs = [(i, base) for i in range(6)] + [
        (6, "fresh words here " + base[:20]),
        (7, "entirely novel text with no repeats at all"),
    ]
    expect = _exact_substr_ref(docs, L)
    out = {
        r.doc_id: r.cleaned_text
        for r in exact_substring_dedup(
            spark.createDataFrame(docs, ["doc_id", "text"]), min_len=L
        ).collect()
    }
    assert out == expect


def test_minhash_signatures_stateless_matches_batch(spark):
    """The row-local (stream-safe) signature projection must emit
    exactly the explode+groupBy shape's rows — same universal-hash
    constants, same distinct shingles, shingle-free docs absent from
    both."""
    from scrappy_spark.io import load_table
    from scrappy_spark.operators.dedup_approx import (
        minhash_signatures,
        minhash_signatures_stateless,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(
        [(100001, "one two"), (100002, "")], ["doc_id", "text"]
    )  # too short for a 3-shingle / empty: must emit no rows
    docs = docs.unionByName(extra)
    batch = {
        (r.doc_id, r.seed, r.minhash)
        for r in minhash_signatures(docs).collect()
    }
    rowlocal = {
        (r.doc_id, r.seed, r.minhash)
        for r in minhash_signatures_stateless(docs).collect()
    }
    assert rowlocal == batch
    assert not any(d in (100001, 100002) for d, _, _ in rowlocal)


# ---------------------------------------------------------------------------
# ExactSubstr key-packing length guard (VERDICT r7 #1 / ADVICE r7 medium):
# key = doc_id * XS_POS_BASE + pos is only lexicographic (doc, pos) while
# every position stays below XS_POS_BASE. The guard makes oversize input a
# loud failure instead of silent keep-first / provenance corruption.
# ---------------------------------------------------------------------------


def test_exact_substring_length_guard_raises(spark):
    """A real >=1M-char document (a book, a concatenated log) must fail
    the job with the XS_POS_BASE message, on both the dedup and the
    provenance faces — not silently interleave key ranges."""
    import pytest

    from scrappy_spark.operators.curation import (
        XS_POS_BASE,
        exact_substring_dedup,
        exact_substring_provenance,
    )

    docs = spark.createDataFrame(
        [(0, "x" * XS_POS_BASE), (1, "a short normal document")],
        ["doc_id", "text"],
    )
    with pytest.raises(Exception, match="XS_POS_BASE"):
        exact_substring_dedup(docs, min_len=30).collect()
    with pytest.raises(Exception, match="XS_POS_BASE"):
        exact_substring_provenance(docs, min_len=30).collect()


def test_exact_substring_guard_boundary_just_under(spark):
    """length == XS_POS_BASE - 1 is the largest legal document: it must
    pass the guard and dedup correctly (its max position XS_POS_BASE - L
    still packs inside its own key range). Run with the base patched to
    4096 so the boundary doc stays test-sized — the guard reads the
    module global at plan-build time, so the patched bound is the one
    enforced."""
    import scrappy_spark.operators.curation as cur

    old = cur.XS_POS_BASE
    cur.XS_POS_BASE = 4096
    try:
        # doc 0 is maximal-length all-x; doc 1 repeats a 64-char x-run,
        # entirely covered by doc 0's earlier windows.
        docs = [(0, "x" * (4096 - 1)), (1, "x" * 64 + "UNIQUE-TAIL")]
        out = {
            r.doc_id: r
            for r in cur.exact_substring_dedup(
                spark.createDataFrame(docs, ["doc_id", "text"]), min_len=30
            ).collect()
        }
        assert out[0].n_dropped > 0      # within-doc repeats collapse
        assert out[1].cleaned_text == "UNIQUE-TAIL"
        assert out[1].n_dropped == 64
    finally:
        cur.XS_POS_BASE = old


def test_exact_substring_chunk_mode_seam_exact(spark):
    """long_doc='chunk' (VERDICT r8 #1): with a shrunken chunk_stride the
    fixture docs span several chunks, and duplicated spans are PLANTED
    to straddle chunk seams — the chunked path must equal the direct
    keep-first reference exactly (no window lost or double-counted at
    the overlap), including cross-doc, within-doc, and exact-copy
    cases."""
    from scrappy_spark.operators.curation import exact_substring_dedup

    L = 10
    stride = 54  # docs below split at positions 54, 108, ...
    shared = "SHARED-DUP-SPAN-CONTENT-XYZ"   # 27 chars
    # doc 0 places `shared` so it crosses the first seam (pos 45..71);
    # doc 1 repeats it mid-doc; doc 2 is an exact copy of doc 0.
    d0 = ("a" * 45 + shared + "b" * 80)[:160]
    d1 = "fresh prefix " + shared + " fresh suffix padding to cross"
    docs = [(0, d0), (1, d1), (2, d0), (3, "tiny"), (4, "")]
    expect = _exact_substr_ref(docs, L)
    out = {
        r.doc_id: r
        for r in exact_substring_dedup(
            spark.createDataFrame(docs, ["doc_id", "text"]),
            min_len=L,
            long_doc="chunk",
            chunk_stride=stride,
        ).collect()
    }
    assert set(out) == set(expect)
    for did, text in docs:
        assert out[did].cleaned_text == expect[did], did
        assert out[did].n_dropped == len(text) - len(expect[did]), did
    assert out[1].n_dropped >= len(shared)  # the straddling span fell
    assert out[2].cleaned_text == ""        # exact copy fully covered


def test_exact_substring_chunk_mode_accepts_oversized_doc(spark):
    """The production shape: one >=XS_POS_BASE 'book' in a normal
    corpus. Default mode must still fail loud; chunk mode must process
    it — repeated content inside the book collapses to the first
    occurrence, content first seen in an earlier (smaller-id) doc is
    dropped from the book, and the book's novel head survives."""
    import pytest

    from scrappy_spark.operators.curation import (
        XS_POS_BASE,
        exact_substring_dedup,
    )

    L = 30
    para = "This exact paragraph also lives in the giant book below! "
    head = "NOVEL-BOOK-OPENING-" + "".join(
        f"<{i:06d}>" for i in range(8)
    )  # unique 83-char head, no internal L-repeat
    book = head + (para * ((XS_POS_BASE + 200) // len(para)))
    assert len(book) >= XS_POS_BASE
    docs = spark.createDataFrame(
        [(1, para), (7, book)], ["doc_id", "text"]
    )
    with pytest.raises(Exception, match="XS_POS_BASE"):
        exact_substring_dedup(docs, min_len=L).collect()
    out = {
        r.doc_id: r
        for r in exact_substring_dedup(
            docs, min_len=L, long_doc="chunk"
        ).collect()
    }
    assert out[1].n_dropped == 0            # keep-first: doc 1 is first
    assert out[7].n_chars == len(book)
    # everything after the first L-1 chars of the first para copy is
    # covered (doc 1 owns the para's windows; later repeats self-cover)
    assert out[7].cleaned_text.startswith("NOVEL-BOOK-OPENING-")
    assert out[7].n_dropped > len(book) - len(head) - len(para) - L
    assert len(out[7].cleaned_text) == out[7].n_chars - out[7].n_dropped


def test_exact_substring_chunk_mode_guards(spark):
    """Chunk mode keeps the fail-loud posture for inputs its key
    packing cannot represent: too many chunks or an out-of-range id."""
    import pytest

    import scrappy_spark.operators.curation as cur

    docs = spark.createDataFrame(
        [(2**50, "y" * 200)], ["doc_id", "text"]
    )  # id >= 2^63 div (16384 * 55) = ~1.02e13 < 2^50: out of range
    with pytest.raises(Exception, match="chunk-mode capacity"):
        cur.exact_substring_dedup(
            docs, min_len=10, long_doc="chunk", chunk_stride=54
        ).collect()
    many = spark.createDataFrame(
        [(0, "z" * 3000)], ["doc_id", "text"]
    )
    g, _ = cur._lgram_stage_chunked(
        many, 10, "doc_id", "text", stride=54, max_chunks=4
    )  # 3000 chars need ~56 chunks of stride 54 >> 4
    with pytest.raises(Exception, match="chunk-mode capacity"):
        g.collect()
    with pytest.raises(ValueError):
        cur.exact_substring_dedup(docs, min_len=10, long_doc="banana")
    with pytest.raises(ValueError):
        cur.exact_substring_dedup(
            docs, min_len=10, long_doc="chunk", chunk_stride=0
        )  # stride must be positive


def _hyp_guard_settings():
    from hypothesis import HealthCheck, settings

    return settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )


def _run_guard_property(spark, spec):
    """With XS_POS_BASE patched small, any doc at/over the base must
    raise; an all-legal batch must equal the direct reference."""
    import pytest

    import scrappy_spark.operators.curation as cur

    L = 10
    base = 64
    pattern = "0123456789abcdefghij" * 8
    docs = [
        (i, pattern[off : off + ln]) for i, (ln, off) in enumerate(spec)
    ]
    old = cur.XS_POS_BASE
    cur.XS_POS_BASE = base
    try:
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        if any(len(t) >= base for _, t in docs):
            with pytest.raises(Exception, match="XS_POS_BASE"):
                cur.exact_substring_dedup(df, min_len=L).collect()
        else:
            expect = _exact_substr_ref(docs, L)
            got = {
                r.doc_id: r.cleaned_text
                for r in cur.exact_substring_dedup(df, min_len=L).collect()
            }
            assert got == expect
    finally:
        cur.XS_POS_BASE = old


def test_exact_substring_guard_property(spark):
    from hypothesis import given
    from hypothesis import strategies as st

    spec_st = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=80),   # doc length (64 = base)
            st.integers(min_value=0, max_value=7),    # pattern offset
        ),
        min_size=1,
        max_size=5,
    )

    @given(spec=spec_st)
    @_hyp_guard_settings()
    def prop(spec):
        _run_guard_property(spark, spec)

    prop()


def test_exact_substring_chunk_mode_property(spark):
    """Seam property (VERDICT r8 #1 'no window lost'): on random
    small-alphabet corpora (dense gram collisions), chunk mode with a
    TINY base — every doc spans many chunks, duplicates land on seams
    by construction — must equal the direct keep-first reference
    exactly. This is the proof that the overlap carries every
    boundary-crossing window and the packed chunk keys preserve
    global corpus order."""
    from hypothesis import given
    from hypothesis import strategies as st

    from scrappy_spark.operators.curation import exact_substring_dedup

    L = 10
    pattern = "ababbabaab" * 30  # 2-letter alphabet: repeats everywhere

    spec_st = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=220),  # doc length
            st.integers(min_value=0, max_value=40),   # pattern offset
        ),
        min_size=1,
        max_size=5,
    )

    @given(spec=spec_st)
    @_hyp_guard_settings()
    def prop(spec):
        docs = [
            (i, pattern[off : off + ln])
            for i, (ln, off) in enumerate(spec)
        ]
        expect = _exact_substr_ref(docs, L)
        got = {
            r.doc_id: r.cleaned_text
            for r in exact_substring_dedup(
                spark.createDataFrame(docs, ["doc_id", "text"]),
                min_len=L,
                long_doc="chunk",
                chunk_stride=22,  # a 220-char doc = 10 chunks
            ).collect()
        }
        assert got == expect

    prop()


def test_exact_substring_provenance_sampled_invariants(spark):
    """Sampled lineage vs the full report: exact totals must MATCH the
    full provenance exactly, sampled counts are bounded by them, the
    doc set is identical (totals come from the full occurrence set),
    attribution is honest (NULL source <-> zero sampled), and rate=1
    degenerates to the full report."""
    from scrappy_spark.operators.curation import (
        exact_substring_provenance,
        exact_substring_provenance_sampled,
    )
    from scrappy_spark.io import load_table

    L = 30
    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .filter("doc_id < 300")
    )
    full = {
        r.doc_id: r for r in exact_substring_provenance(docs, min_len=L).collect()
    }
    samp = {
        r.doc_id: r
        for r in exact_substring_provenance_sampled(
            docs, min_len=L, rate=0.25
        ).collect()
    }
    assert set(samp) == set(full)
    assert any(r.n_sampled_windows > 0 for r in samp.values())
    for did, r in samp.items():
        assert r.n_dup_windows == full[did].n_dup_windows  # exact totals
        assert 0 <= r.n_sampled_windows <= r.n_dup_windows
        assert r.top_source_windows <= r.n_sampled_windows
        if r.n_sampled_windows == 0:
            assert r.top_source_doc is None and r.top_source_windows == 0
        else:
            assert r.top_source_doc is not None

    # rate=1 keeps every occurrence: identical to the full report
    all_kept = {
        r.doc_id: r
        for r in exact_substring_provenance_sampled(
            docs, min_len=L, rate=1.0
        ).collect()
    }
    for did, r in all_kept.items():
        assert r.n_sampled_windows == full[did].n_dup_windows
        assert r.top_source_doc == full[did].top_source_doc
        assert r.top_source_windows == full[did].top_source_windows


def test_exact_substring_incremental_equals_full_run(spark):
    """The incremental contract: cleaning a batch against the base's
    stored gram index (+ within-batch keep-first) must equal running
    the full dedup over base ∪ batch and keeping the batch rows —
    including batch docs that duplicate base text, batch-internal
    exact copies, and batch docs shorter than L."""
    from scrappy_spark.operators.curation import (
        exact_substring_dedup,
        exact_substring_dedup_incremental,
        exact_substring_index,
    )

    L = 10
    s_base = "SHARED-BASE-CONTENT-0123456789"
    base_docs = [(0, "unique base words " + s_base), (1, "other base text entirely")]
    batch_docs = [
        (10, s_base + " plus fresh batch words"),   # overlaps base
        (11, "totally new batch content here"),     # novel
        (12, "totally new batch content here"),     # exact copy within batch
        (13, "unique base words " + s_base),        # exact copy of a BASE doc
        (14, "tiny"),                                # below threshold
    ]
    base = spark.createDataFrame(base_docs, ["doc_id", "text"])
    batch = spark.createDataFrame(batch_docs, ["doc_id", "text"])

    full = {
        r.doc_id: r
        for r in exact_substring_dedup(
            base.unionByName(batch), min_len=L
        ).collect()
        if r.doc_id >= 10
    }
    inc = {
        r.doc_id: r
        for r in exact_substring_dedup_incremental(
            batch, exact_substring_index(base, min_len=L), min_len=L
        ).collect()
    }
    assert set(inc) == set(full)
    for did in full:
        assert (
            inc[did].cleaned_text,
            inc[did].n_dropped,
            inc[did].n_chars,
        ) == (
            full[did].cleaned_text,
            full[did].n_dropped,
            full[did].n_chars,
        ), did
    assert inc[13].cleaned_text == ""          # base content fully removed
    assert inc[12].cleaned_text == ""          # batch-internal copy
    assert inc[14].cleaned_text == "tiny"      # below threshold untouched
    # index update is a set union: re-running against the merged index
    # drops everything the batch contributed
    merged = exact_substring_index(base, min_len=L).unionByName(
        exact_substring_index(batch, min_len=L)
    ).distinct()
    again = {
        r.doc_id: r.cleaned_text
        for r in exact_substring_dedup_incremental(
            batch, merged, min_len=L
        ).collect()
    }
    assert all(t == "" for d, t in again.items() if d != 14)


def test_exact_substring_chunk_mode_family_complete(spark):
    """Family-wide chunk mode: (a) provenance through chunked keys
    equals the unchunked reference attribution; (b) the gram INDEX is
    mode-invariant (identical set either way — the seam property);
    (c) incremental dedup accepts a book-length batch doc and matches
    the full chunked rerun on the batch rows."""
    from scrappy_spark.operators.curation import (
        exact_substring_dedup,
        exact_substring_dedup_incremental,
        exact_substring_index,
        exact_substring_provenance,
    )

    L = 10
    shared = "COMMON-SPAN-CONTENT-HERE"
    docs = [
        (0, "first doc holds " + shared + " originally"),
        (1, "second doc repeats " + shared + " later on"),
        (2, "third doc also has " + shared + " plus " + shared),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    plain = {
        r.doc_id: (r.n_dup_windows, r.top_source_doc, r.top_source_windows)
        for r in exact_substring_provenance(df, min_len=L).collect()
    }
    chunked = {
        r.doc_id: (r.n_dup_windows, r.top_source_doc, r.top_source_windows)
        for r in exact_substring_provenance(
            df, min_len=L, long_doc="chunk", chunk_stride=16
        ).collect()
    }
    assert plain == chunked and chunked[1][1] == 0  # doc 0 owns the span

    a = {r.gram for r in exact_substring_index(df, min_len=L).collect()}
    b = {
        r.gram
        for r in exact_substring_index(
            df, min_len=L, long_doc="chunk", chunk_stride=16
        ).collect()
    }
    assert a == b and len(a) > 0

    base = df.filter("doc_id = 0")
    book = "NOVEL-HEAD-" + ("this paragraph loops around " * 40)
    batch = spark.createDataFrame(
        [(10, "fresh batch doc with " + shared), (11, book)],
        ["doc_id", "text"],
    )
    idx = exact_substring_index(base, min_len=L)
    inc = {
        r.doc_id: (r.n_dropped, r.cleaned_text)
        for r in exact_substring_dedup_incremental(
            batch, idx, min_len=L, long_doc="chunk", chunk_stride=64
        ).collect()
    }
    # equivalence: full chunked rerun over base ∪ batch, batch rows only
    full = {
        r.doc_id: (r.n_dropped, r.cleaned_text)
        for r in exact_substring_dedup(
            base.unionByName(batch), min_len=L, long_doc="chunk",
            chunk_stride=64,
        ).collect()
        if r.doc_id >= 10
    }
    assert inc == full
    assert inc[10][0] >= len(shared)      # the indexed span fell
    assert inc[11][1].startswith("NOVEL-HEAD-")
