"""Corpus-curation operators: deterministic sampling/mixing, PII scrub,
boilerplate removal, decontamination, repetition stats, packing."""

import pytest
from pyspark.sql import functions as F

from scrappy_spark.operators import curation as CU


def test_sample_threshold_edges():
    assert CU.sample_threshold(0.0) == "0000"  # keeps nothing
    assert CU.sample_threshold(1.0) == "zzzz"  # above all hex buckets
    assert CU.sample_threshold(0.5) == "8000"
    with pytest.raises(ValueError):
        CU.sample_threshold(1.5)


def test_hash_sample_deterministic_and_calibrated(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in CU.hash_sample(df, 0.25).collect()}
    b = {r.doc_id for r in CU.hash_sample(df, 0.25).collect()}
    assert a == b  # pure function of the key, not rand()
    assert 0.20 < len(a) / 2000 < 0.30  # calibrated within binomial noise
    # rate monotonicity: a smaller rate yields a strict subset (nested
    # buckets) — the property that lets one audit sample contain another
    small = {r.doc_id for r in CU.hash_sample(df, 0.10).collect()}
    assert small < a


def test_hash_sample_consistent_across_tables(spark):
    """Same salt+key → same kept set, so sampling docs also selects the
    matching rows of any sibling table keyed by doc_id."""
    docs = spark.range(500).withColumnRenamed("id", "doc_id")
    sibling = docs.withColumn("payload", F.col("doc_id") * 2)
    kept_docs = {r.doc_id for r in CU.hash_sample(docs, 0.3).collect()}
    kept_sib = {r.doc_id for r in CU.hash_sample(sibling, 0.3).collect()}
    assert kept_docs == kept_sib


def test_mix_corpora_rates(spark):
    df = spark.createDataFrame(
        [(i, "hi" if i % 2 else "lo") for i in range(1000)], ["doc_id", "source"]
    )
    out = CU.mix_corpora(df, {"hi": 1.0, "lo": 0.0}, default_rate=0.5)
    kept = out.filter("kept").groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in kept}
    assert counts.get("hi") == 500  # rate 1.0 keeps everything
    assert "lo" not in counts  # rate 0.0 keeps nothing


def test_scrub_pii_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@site.co.uk now"),
            (2, "go to https://x.example.com/p?q=1 please"),
            (3, "ssn 123-45-6789 phone 555.123.4567"),
            (4, "clean text stays clean"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.clean for r in df.select("doc_id", CU.scrub_pii(F.col("text")).alias("clean")).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "go to <URL> please"
    assert out[3] == "ssn <SSN> phone <PHONE>"
    assert out[4] == "clean text stays clean"


def test_remove_common_fragments_lines(spark):
    """Newline-delimited boilerplate: a footer present in 3/4 docs is
    dropped; unique lines keep their order and duplicates; an all-
    boilerplate doc survives as an empty string."""
    footer = "(c) example corp - all rights reserved"
    docs = [
        (1, f"alpha line\nbeta line\n{footer}"),
        (2, f"{footer}\ngamma line\ngamma line"),
        (3, f"delta line\n{footer}"),
        (4, footer),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r.doc_id: r.clean_text
        for r in CU.remove_common_fragments(df, delim="\n", max_doc_pct=50).collect()
    }
    assert out[1] == "alpha line\nbeta line"
    assert out[2] == "gamma line\ngamma line"  # duplicates + order kept
    assert out[3] == "delta line"
    assert out[4] == ""  # all boilerplate, row survives
    assert len(out) == 4


def test_remove_common_fragments_threshold_is_strict(spark):
    """Fragment in exactly max_doc_pct% of docs is KEPT (strictly-
    greater comparison, integer-exact)."""
    df = spark.createDataFrame(
        [(1, "x\na"), (2, "x\nb"), (3, "c\nd"), (4, "e\nf")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r.clean_text
        for r in CU.remove_common_fragments(df, delim="\n", max_doc_pct=50).collect()
    }
    assert out[1] == "x\na"  # x is in 2/4 = exactly 50% → kept


def test_decontaminate_flags_overlap(spark):
    bench = spark.createDataFrame([(100, "the quick brown fox jumps")], ["doc_id", "text"])
    train = spark.createDataFrame(
        [
            (1, "a quick brown fox appeared"),  # shares 3-gram "quick brown fox"
            (2, "totally unrelated content here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.contaminated for r in CU.decontaminate(train, bench, n=3).collect()}
    assert out[1] is True
    assert out[2] is False


def test_repetition_stats_flags_repetitive_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in CU.repetition_stats(df).collect()}
    assert out[1].dup_word_frac > 0.8 and out[1].keep is False
    assert out[2].dup_word_frac == 0.0 and out[2].keep is True
    assert out[2].top_bigram_frac == 0.2  # 5 distinct bigrams, each 1/5


def test_pack_sequences_invariants(spark):
    df = spark.createDataFrame(
        [(i, "s", " ".join(["w"] * 100)) for i in range(10)],
        ["doc_id", "source", "text"],
    )
    rows = sorted(CU.pack_sequences(df, budget=256).collect(), key=lambda r: r.doc_id)
    assert all(0 <= r.chunk_offset < 256 for r in rows)
    assert rows[0].chunk_id == 0 and rows[0].chunk_offset == 0
    # 100-token docs into 256-token chunks: docs 0,1,2 start in chunk 0
    # (offsets 0,100,200), doc 3 starts at cum 300 → chunk 1
    assert [r.chunk_id for r in rows[:4]] == [0, 0, 0, 1]
    # chunk ids are non-decreasing along the stream
    chunk_ids = [r.chunk_id for r in rows]
    assert chunk_ids == sorted(chunk_ids)


def test_pack_sequences_partitions_independent(spark):
    """Each source stream packs from chunk 0 — no cross-partition
    coupling, which is what lets packing parallelize at scale."""
    df = spark.createDataFrame(
        [(1, "a", "w w w"), (2, "b", "w w w")], ["doc_id", "source", "text"]
    )
    rows = {r.source: r for r in CU.pack_sequences(df, budget=10).collect()}
    assert rows["a"].chunk_id == 0 and rows["b"].chunk_id == 0


# --------------------------------------------------------------------------
# Property-based invariants (Hypothesis)
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PROP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    r1=st.floats(min_value=0.0, max_value=1.0),
    r2=st.floats(min_value=0.0, max_value=1.0),
)
@_PROP_SETTINGS
def test_hash_sample_nesting_property(spark, r1, r2):
    """For ANY rates r1 <= r2, sample(r1) ⊆ sample(r2): md5 buckets are
    nested by construction, so audits of a small sample transfer to any
    larger one."""
    lo, hi = sorted((r1, r2))
    df = spark.range(300).withColumnRenamed("id", "doc_id")
    small = {r.doc_id for r in CU.hash_sample(df, lo).collect()}
    big = {r.doc_id for r in CU.hash_sample(df, hi).collect()}
    assert small <= big


@given(texts=st.lists(st.text(alphabet="abc @.:/-0123456789xyz\n", max_size=60), min_size=1, max_size=6))
@_PROP_SETTINGS
def test_scrub_pii_idempotent(spark, texts):
    """scrub(scrub(x)) == scrub(x): replacement tokens never re-match a
    PII pattern, so re-running a scrub pass is always safe."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    once = df.select("doc_id", CU.scrub_pii(F.col("text")).alias("text"))
    twice = once.select("doc_id", CU.scrub_pii(F.col("text")).alias("text"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(
    lens=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=12),
    budget=st.integers(min_value=1, max_value=64),
)
@_PROP_SETTINGS
def test_pack_sequences_cum_identity(spark, lens, budget):
    """chunk_id * budget + chunk_offset == running token count before
    the doc — the packing is a pure re-coordinatization of the stream."""
    rows = [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = sorted(CU.pack_sequences(df, budget=budget).collect(), key=lambda r: r.doc_id)
    cum = 0
    for r, n in zip(out, lens):
        assert r.chunk_id * budget + r.chunk_offset == cum
        assert 0 <= r.chunk_offset < budget
        cum += n


def test_quota_sample_caps_and_determinism(spark):
    rows = [(i, "big" if i < 40 else "small") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = CU.quota_sample(df, quota=10, group_col="source", id_col="doc_id")
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert len(by_src["big"]) == 10       # capped
    assert len(by_src["small"]) == 10     # under quota → whole group kept
    again = CU.quota_sample(df, quota=10, group_col="source", id_col="doc_id")
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in out.collect()}
    # a different salt picks a different (still size-10) subset
    other = CU.quota_sample(df, quota=10, group_col="source", id_col="doc_id", salt="v2")
    assert {r.doc_id for r in other.collect()} != {r.doc_id for r in out.collect()}


def test_assign_splits_partition_and_consistency(spark):
    df = spark.createDataFrame([(i,) for i in range(400)], ["doc_id"])
    out = CU.assign_splits(df).collect()
    counts = {}
    for r in out:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert abs(counts["train"] / 400 - 0.8) < 0.08  # md5 buckets ≈ uniform
    # every row assigned exactly one split; same key ⇒ same split across
    # tables (leakage-safe joins)
    again = {r.doc_id: r.split for r in CU.assign_splits(df).collect()}
    assert {r.doc_id: r.split for r in out} == again
    import pytest
    with pytest.raises(ValueError, match="sum to 1"):
        CU.assign_splits(df, weights={"a": 0.5, "b": 0.2})


def test_weighted_sample_bias_and_determinism(spark):
    # weight 100 vs weight 1: heavy rows should dominate the sample
    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = {r.doc_id for r in CU.weighted_sample(df, k=50, weight_col="w").collect()}
    heavy = sum(1 for i in out if i < 50)
    # 50 heavy rows carry 100x weight each vs 450 light rows: expect the
    # sample to be mostly heavy (binomial tail makes <30 vanishingly rare)
    assert heavy >= 30, heavy
    again = {r.doc_id for r in CU.weighted_sample(df, k=50, weight_col="w").collect()}
    assert out == again


def test_length_buckets_overflow_and_batching(spark):
    """Docs past the last edge land in the open-ended bucket with NULL
    pad_len (no ANSI index error), and batch numbering is dense and
    deterministic within (source, bucket)."""
    from scrappy_spark.operators.curation import length_buckets

    rows = [(i, "s", "tok " * n) for i, n in enumerate([2, 3, 4, 40, 900])]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r.doc_id: r
        for r in length_buckets(df, boundaries=(8, 64), batch_size=2).collect()
    }
    assert out[0].bucket == 0 and out[0].pad_len == 8
    assert out[3].bucket == 1 and out[3].pad_len == 64
    assert out[4].bucket == 2 and out[4].pad_len is None  # overflow
    assert out[4].n_tokens == 900
    # batch_size=2 in bucket 0: doc 0,1 → batch 0; doc 2 → batch 1
    assert (out[0].batch_idx, out[1].batch_idx, out[2].batch_idx) == (0, 0, 1)


def test_remove_repeated_spans(spark):
    """A verbatim 8-token span shared by two docs is removed from BOTH;
    unique text survives; overlapping coverage unions; a doc that is
    entirely the shared span comes back empty."""
    from scrappy_spark.operators.curation import remove_repeated_spans

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro one two three {span} outro four five six"),
            (2, f"different lead {span} different tail words here"),
            (3, "completely unrelated text with no shared content at all"),
            (4, span),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in remove_repeated_spans(docs, span_len=8).collect()}
    for d in (1, 2, 4):
        assert "alpha" not in out[d].clean_text and "theta" not in out[d].clean_text
        assert out[d].n_removed == 8
    assert out[1].clean_text == "intro one two three outro four five six"
    assert out[2].clean_text == "different lead different tail words here"
    assert out[3].n_removed == 0
    assert out[3].clean_text == "completely unrelated text with no shared content at all"
    assert out[4].clean_text == "" and out[4].n_tokens == 8


def test_remove_repeated_spans_overlap_union(spark):
    """Two overlapping repeated spans in one doc remove the UNION of
    their positions, not double-count."""
    from scrappy_spark.operators.curation import remove_repeated_spans

    nine = "a1 a2 a3 a4 a5 a6 a7 a8 a9"  # 9 tokens → two overlapping 8-spans
    docs = spark.createDataFrame(
        [(1, f"x {nine} y"), (2, f"p {nine} q")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in remove_repeated_spans(docs, span_len=8).collect()}
    assert out[1].n_removed == 9  # union of [1..8] and [2..9]
    assert out[1].clean_text == "x y"
    assert out[2].clean_text == "p q"


def test_remove_repeated_spans_min_docs_3(spark):
    """The general min_docs path (doc-frequency groupBy + join — the
    min≠max window shortcut only applies at min_docs=2): a span shared
    by exactly two docs survives at min_docs=3, one shared by three is
    removed from all three."""
    from scrappy_spark.operators.curation import remove_repeated_spans

    tri = "t1 t2 t3 t4 t5 t6 t7 t8"  # in docs 1,2,3
    duo = "d1 d2 d3 d4 d5 d6 d7 d8"  # in docs 4,5 only
    docs = spark.createDataFrame(
        [
            (1, f"one {tri} end"),
            (2, f"two {tri} end2"),
            (3, f"three {tri} end3"),
            (4, f"four {duo} end4"),
            (5, f"five {duo} end5"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in remove_repeated_spans(docs, span_len=8, min_docs=3).collect()
    }
    for d in (1, 2, 3):
        assert out[d].n_removed == 8 and "t1" not in out[d].clean_text
    for d in (4, 5):
        assert out[d].n_removed == 0 and "d1" in out[d].clean_text


def test_mixture_plan_math(spark):
    from scrappy_spark.operators.curation import mixture_plan
    import pytest

    df = spark.createDataFrame(
        [("wiki", 100), ("wiki", 100), ("cc", 1000), ("books", 50)],
        "source string, n_chars long",
    )
    out = {
        r.source: r
        for r in mixture_plan(
            df, {"wiki": 0.6, "cc": 0.4}, budget_tokens=1000
        ).collect()
    }
    # wiki: avail 200, target 600 -> under-supplied, 3.0 epochs
    assert out["wiki"].available_tokens == 200
    assert out["wiki"].target_tokens == 600
    assert out["wiki"].sample_rate_ppm == 1_000_000
    assert out["wiki"].epochs_milli == 3000
    assert out["wiki"].under_supplied == 1
    # cc: avail 1000, target 400 -> over-supplied, 0.4 rate
    assert out["cc"].sample_rate_ppm == 400_000
    assert out["cc"].epochs_milli == 400
    assert out["cc"].under_supplied == 0
    # books: no weight declared -> excluded from the mix
    assert out["books"].target_tokens == 0
    assert out["books"].sample_rate_ppm == 0
    assert out["books"].under_supplied == 0

    # a weighted domain ABSENT from the corpus must surface as an
    # under-supplied row (available 0), never silently vanish
    out2 = {
        r.source: r
        for r in mixture_plan(
            df, {"wiki": 0.5, "code": 0.5}, budget_tokens=1000
        ).collect()
    }
    assert out2["code"].available_tokens == 0
    assert out2["code"].target_tokens == 500
    assert out2["code"].under_supplied == 1
    assert (out2["code"].sample_rate_ppm, out2["code"].epochs_milli) == (0, 0)

    with pytest.raises(ValueError):
        mixture_plan(df, {"wiki": 0.5}, 1000)       # weights must sum to 1
    with pytest.raises(ValueError):
        mixture_plan(df, {"wiki": 1.0}, 0)          # budget must be > 0
    with pytest.raises(ValueError):
        mixture_plan(df, {"wiki": 1.0}, 2**63)      # budget must fit BIGINT


def test_mixture_plan_web_scale_budget(spark):
    """ADVICE r8 #1: ppm * budget wraps BIGINT above ~9.2e12 tokens —
    a 15T-token plan (exactly the scale the planner is for) must stay
    integer-exact through the DECIMAL path, on both supply branches."""
    from scrappy_spark.operators.curation import mixture_plan

    B = 15_000_000_000_000
    df = spark.createDataFrame(
        [("wiki", 200), ("cc", 10**15)], "source string, n_chars long"
    )
    out = {
        r.source: r
        for r in mixture_plan(df, {"wiki": 0.6, "cc": 0.4}, B).collect()
    }
    for dom, ppm, avail in (("wiki", 600_000, 200), ("cc", 400_000, 10**15)):
        tgt = ppm * B // 1_000_000
        want_rate = 1_000_000 if tgt >= avail else tgt * 1_000_000 // avail
        got = out[dom]
        assert got.target_tokens == tgt
        assert got.sample_rate_ppm == want_rate
        assert got.epochs_milli == tgt * 1000 // avail
        assert got.under_supplied == int(tgt > avail)


def test_segment_lang_profile_detects_code_switching(spark):
    from scrappy_spark.operators.textstats import segment_lang_profile

    en = "the quick fox and the lazy dog that was with it for a day "
    de = "der hund und die katze das ist ein nicht mit von zu haus "
    docs = spark.createDataFrame(
        [
            (1, en * 4),                 # pure English, 2 segments
            (2, en * 4 + de * 4),        # half English, half German
            (3, ""),                     # empty -> und, no segments
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in segment_lang_profile(docs, seg_tokens=20).collect()
    }
    assert out[1].majority_lang == "en" and out[1].mixed == 0
    assert out[2].mixed == 1 and out[2].n_langs == 2
    assert out[2].n_segments == out[2].majority_segments * 2  # even split
    assert out[3] == (3, 0, "und", 0, 0, 0)
