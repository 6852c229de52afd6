"""Round-5 LLM-corpus operators: Bloom filter, bigram perplexity,
temperature resampling. Properties here go beyond the DuckDB oracle
(which pins exact values): Bloom's zero-false-negative guarantee and
mergeability, the perplexity signal's boilerplate/gibberish
separation, and the resampler's distribution-flattening direction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scrappy_spark.operators import bloom as B
from scrappy_spark.operators.curation import temperature_sample
from scrappy_spark.operators.textstats import doc_perplexity


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bloom_parts(spark):
    members = spark.createDataFrame([(f"member{i}",) for i in range(2000)], "key string")
    bank = B.bloom_build(members, "key")
    return members, bank


def test_bloom_no_false_negatives(spark, bloom_parts):
    members, bank = bloom_parts
    probed = B.bloom_probe(members, bank, "key")
    assert probed.filter(F.col("bloom_hit") == 0).count() == 0


def test_bloom_fpr_bounded(spark, bloom_parts):
    _, bank = bloom_parts
    absent = spark.createDataFrame([(f"other{i}",) for i in range(5000)], "key string")
    fp = B.bloom_probe(absent, bank, "key").filter(F.col("bloom_hit") == 1).count()
    # n=2000, m=2^18, k=4 → theoretical FPR ≈ (1-e^{-kn/m})^4 ≈ 8e-6;
    # allow 100× slack and it still must be essentially zero here.
    assert fp <= 5, f"{fp}/5000 false positives — far above the m/k design point"


def test_bloom_bank_bounded_and_mergeable(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], "key string")
    bank_union = B.bloom_build(a.unionAll(b), "key")
    merged = (
        B.bloom_build(a, "key")
        .unionAll(B.bloom_build(b, "key"))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    assert bank_union.count() <= B.BLOOM_M_BITS // 32
    assert merged.exceptAll(bank_union).count() == 0
    assert bank_union.exceptAll(merged).count() == 0


def test_bloom_rejects_non_power_of_two():
    with pytest.raises(ValueError, match="power of two"):
        B.bloom_positions(F.lit("x"), m_bits=1000)


# ---------------------------------------------------------------------------
# Bigram perplexity
# ---------------------------------------------------------------------------


def test_perplexity_separates_boilerplate_from_gibberish(spark):
    # 8 near-identical boilerplate docs (their bigrams dominate the
    # corpus) + 1 doc of the same unigrams in a never-seen order.
    boiler = [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)]
    gibber = [(100, "dog the over quick lazy fox brown jumps the")]
    df = spark.createDataFrame(boiler + gibber, "doc_id long, text string")
    ppl = {r["doc_id"]: r["ppl"] for r in doc_perplexity(df).collect()}
    assert ppl[100] > 2 * ppl[0], (
        f"gibberish ppl {ppl[100]} should far exceed boilerplate ppl {ppl[0]}"
    )


def test_perplexity_short_docs_absent_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "three tokens here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in doc_perplexity(df).collect()}
    assert set(rows) == {3}
    assert rows[3]["n_bigrams"] == 2


# ---------------------------------------------------------------------------
# Temperature resampling
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def skewed(spark):
    rows = (
        [(i, "en") for i in range(800)]
        + [(1000 + i, "fr") for i in range(150)]
        + [(2000 + i, "zh") for i in range(50)]
    )
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_temperature_flattens_distribution(spark, skewed):
    kept = temperature_sample(skewed, alpha=0.3, target_frac=0.5)
    shares = {
        r["lang"]: r["c"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    total = sum(shares.values())
    # natural shares: en .80 / fr .15 / zh .05 — after α=0.3 smoothing
    # the head must shrink and the tail must grow, and small groups
    # whose boosted target exceeds their size are kept whole.
    assert shares["en"] / total < 0.70
    assert shares["zh"] / total > 0.05
    assert shares["zh"] == 50  # rate capped at 1 → whole group kept


def test_temperature_alpha_one_is_uniform_rate(spark, skewed):
    # α=1 ⇒ q_g = p_g ⇒ every group's keep rate is target_frac: group
    # shares of the output match the input within sampling noise.
    kept = temperature_sample(skewed, alpha=1.0, target_frac=0.5)
    shares = {
        r["lang"]: r["c"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    total = sum(shares.values())
    assert abs(shares["en"] / total - 0.80) < 0.06
    assert abs(total / 1000 - 0.5) < 0.08


def test_temperature_deterministic(spark, skewed):
    a = sorted(r["doc_id"] for r in temperature_sample(skewed).collect())
    b = sorted(r["doc_id"] for r in temperature_sample(skewed).collect())
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# Incremental dedup / quality floor
# ---------------------------------------------------------------------------


def test_incremental_pairs_exclude_base_base(spark):
    from scrappy_spark.operators.dedup_approx import (
        incremental_minhash_pairs,
        minhash_candidate_pairs,
        minhash_signatures,
    )

    # 2 base dups (10, 11), 1 new doc duplicating the base pair (1),
    # and 2 new dups of each other (2, 3).
    base = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),
         (11, "alpha beta gamma delta epsilon zeta eta theta"),
         (12, "totally different words in this base document here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight nine"),
         (3, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    sig_new, sig_base = minhash_signatures(new), minhash_signatures(base)
    got = {
        (r["id_a"], r["id_b"]): r["n_new_sides"]
        for r in incremental_minhash_pairs(sig_new, sig_base).collect()
    }
    assert (10, 11) not in got  # base-base never generated
    assert got[(2, 3)] == 2  # new-new
    assert got[(1, 10)] == 1 and got[(1, 11)] == 1  # new-base
    # and the increment's pair set matches a full recompute minus
    # base-base, proving the index reuse is result-neutral
    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(sig_new.unionAll(sig_base)).collect()
    }
    assert set(got) == {p for p in full if not (p[0] >= 10 and p[1] >= 10)}


def test_quality_floor_drops_exact_fraction_per_group(spark):
    from scrappy_spark.operators.curation import quality_floor

    rows = [(i, "en", float(i)) for i in range(10)] + [
        (100 + i, "fr", float(i)) for i in range(4)
    ] + [(200, "zh", 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, quality_score double")
    kept = quality_floor(df, frac=0.25)
    by_lang = {
        r["lang"]: sorted(x["doc_id"] for x in kept.filter(F.col("lang") == r["lang"]).collect())
        for r in kept.select("lang").distinct().collect()
    }
    # en: floor(.25*10)=2 lowest drop; fr: floor(.25*4)=1 drops;
    # zh: floor(.25*1)=0 — single-row group survives intact.
    assert by_lang["en"] == list(range(2, 10))
    assert by_lang["fr"] == [101, 102, 103]
    assert by_lang["zh"] == [200]


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------


def _ref_bpe(word_counts, n_merges):
    """Textbook BPE: strictly sequential merges, (count desc, pair asc)
    tie-break, leftmost non-overlapping application."""
    words = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        (a, b), cnt = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((a, b, cnt))
        new = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        words = new
    return merges


def test_bpe_batch1_matches_textbook(spark):
    from collections import Counter

    from scrappy_spark.operators.bpe import learn_bpe

    corpus = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new newer"),
        (3, "wide wider widest low new"),
    ]
    wc = Counter(w for _, t in corpus for w in t.split())
    expected = _ref_bpe(dict(wc), 10)
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges, _ = learn_bpe(df, n_merges=10, batch=1)
    got = [(m["left"], m["right"], m["pair_count"]) for m in merges]
    assert got == expected


def test_bpe_encode_roundtrip_and_fallback(spark):
    from scrappy_spark.operators.bpe import encode_bpe, learn_bpe

    train = spark.createDataFrame(
        [(1, "lower lower lowest newest newest")], "doc_id long, text string"
    )
    merges, word_pieces = learn_bpe(train, n_merges=8, batch=2)
    # encode a corpus containing a word never seen in training
    test = spark.createDataFrame(
        [(9, "lower unseenword lowest")], "doc_id long, text string"
    )
    enc = encode_bpe(test, merges, word_pieces).collect()
    sep = chr(0x2581)
    for r in enc:
        assert r["pieces_str"].replace(sep, "") == r["word"]  # reconstruction
        assert r["n_pieces"] == len(r["pieces_str"].split(sep))
    by_word = {r["word"]: r for r in enc}
    assert by_word["unseenword"]["n_pieces"] >= 1  # fallback path ran


def test_bpe_rejects_bad_params(spark):
    from scrappy_spark.operators.bpe import learn_bpe

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_merges"):
        learn_bpe(df, n_merges=0)


# ---------------------------------------------------------------------------
# JL random projection / SemDeDup
# ---------------------------------------------------------------------------


def test_random_projection_preserves_cosine_approximately(spark):
    import math
    import random

    from scrappy_spark.operators.similarity import random_projection

    rng = random.Random(7)
    dim = 64
    # 3 direction groups: pairs within a group are highly similar,
    # across groups near-orthogonal-ish
    bases = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(3)]
    vecs = []
    for vid in range(12):
        base = bases[vid % 3]
        vecs.append((vid, [b + rng.gauss(0, 0.05) for b in base]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    proj = random_projection(df, out_dim=16)
    by_id = {}
    for r in proj.collect():
        by_id.setdefault(r["vec_id"], {})[r["j"]] = r["comp"]
    def cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        return d / (math.sqrt(sum(a * a for a in u)) * math.sqrt(sum(b * b for b in v)))
    orig = {vid: v for vid, v in vecs}
    pvec = {vid: [by_id[vid][j] for j in range(16)] for vid in orig}
    # high-similarity pairs (same base direction) survive projection
    # almost exactly — this is what SemDeDup/ANN consumers rely on
    for a, b in [(0, 3), (1, 4), (2, 5), (3, 6), (4, 7)]:
        before, after = cos(orig[a], orig[b]), cos(pvec[a], pvec[b])
        assert before > 0.99 and abs(before - after) < 0.05
    # near-orthogonal pairs wander by ~1/sqrt(k) each; individual draws
    # can be bad at k=16, but the MEAN absolute distortion across all
    # cross-direction pairs must respect the JL bound
    cross_pairs = [(a, b) for a in range(6) for b in range(a + 1, 6) if a % 3 != b % 3]
    dist = [abs(cos(orig[a], orig[b]) - cos(pvec[a], pvec[b])) for a, b in cross_pairs]
    assert sum(dist) / len(dist) < 0.35, dist
    # and same-direction similarity stays above cross-direction on average
    same_avg = sum(cos(pvec[a], pvec[b]) for a, b in [(0, 3), (1, 4), (2, 5)]) / 3
    cross_avg = sum(cos(pvec[a], pvec[b]) for a, b in cross_pairs) / len(cross_pairs)
    assert same_avg > cross_avg + 0.2


def test_semdedup_drops_within_cluster_dups_keeps_lowest(spark):
    from scrappy_spark.operators.similarity import semdedup

    # two far-apart clusters; ids 0/1/2 identical in cluster A,
    # ids 10/11 identical in cluster B, 12 distinct in B
    a = [1.0] * 32 + [0.0] * 32
    b = [0.0] * 32 + [1.0] * 32
    c = [0.0] * 16 + [1.0] * 16 + [0.0] * 32
    rows = [(0, a), (1, a), (2, a), (10, b), (11, b), (12, c)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semdedup(df, k=2, threshold=0.95).collect()}
    assert out[0]["kept"] == 1          # lowest id survives
    assert out[1]["kept"] == 0 and out[2]["kept"] == 0
    assert out[10]["kept"] == 1 and out[11]["kept"] == 0
    assert out[12]["kept"] == 1          # distinct vector untouched
    # dups landed in the same cluster as their keeper
    assert out[1]["cluster"] == out[0]["cluster"]
    assert out[11]["cluster"] == out[10]["cluster"]


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_undercounts_and_merges(spark):
    from scrappy_spark.operators import cms as C

    rows = [(f"k{i % 50}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "key string")
    grid = C.cms_build(df, "key")
    exact = df.groupBy("key").agg(F.count("*").alias("c"))
    est = C.cms_estimate(df, grid, "key")
    joined = est.join(exact, "key").collect()
    assert all(r["cms_est"] >= r["c"] for r in joined)  # never undercount
    hot = [r for r in joined if r["key"] == "hot"][0]
    # heavy hitter estimated within the eps*N bound (e/w * N ~ 7 here)
    assert hot["cms_est"] - hot["c"] <= (2.718 / C.CMS_WIDTH) * 2500 + 1
    # mergeability: cell-wise sum of two halves == grid of the union
    h1 = spark.createDataFrame(rows[:1000], "key string")
    h2 = spark.createDataFrame(rows[1000:], "key string")
    merged = (
        C.cms_build(h1, "key")
        .unionAll(C.cms_build(h2, "key"))
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert merged.exceptAll(grid).count() == 0
    assert grid.exceptAll(merged).count() == 0


def test_cms_rejects_bad_width(spark):
    from scrappy_spark.operators import cms as C

    with pytest.raises(ValueError, match="power of two"):
        C.cms_positions(F.lit("x"), width=1000)


def test_incremental_dedup_corpus_verdicts_and_idempotence(spark):
    from scrappy_spark.operators.dedup_approx import minhash_signatures
    from scrappy_spark.pipelines import dedup_corpus_incremental

    base = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (101, "completely different base content about other things entirely here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of base
            (2, "one two three four five six seven eight nine ten"),          # fresh
            (3, "one two three four five six seven eight nine ten"),          # exact dup of 2
            (4, "one two three four five six seven eight nine eleven"),       # near dup of 2
            (5, "unique snowflake content found nowhere else in any corpus"), # fresh
        ],
        "doc_id long, text string",
    )
    base_sig = minhash_signatures(base)
    cleaned, verdicts, sig_out = dedup_corpus_incremental(new, base_sig)
    v = {r["doc_id"]: r["verdict"] for r in verdicts.collect()}
    assert v[1] == "dup_of_base"
    assert v[2] == "kept"
    assert v[3] == "exact_dup_in_batch"
    assert v[4] == "near_dup_in_batch"
    assert v[5] == "kept"
    assert sorted(r["doc_id"] for r in cleaned.collect()) == [2, 5]
    # index update closes the loop: re-ingesting the same batch against
    # base_sig + sig_out drops EVERYTHING (nothing new survives twice)
    updated = base_sig.unionAll(sig_out)
    renew = new.withColumn("doc_id", F.col("doc_id") + 50)
    cleaned2, v2, _ = dedup_corpus_incremental(renew, updated)
    assert cleaned2.count() == 0
    kept_twice = [r["doc_id"] for r in v2.collect() if r["verdict"] == "kept"]
    assert kept_twice == []


def test_leakage_safe_split_keeps_clusters_together(spark):
    from scrappy_spark.operators.curation import assign_splits
    from scrappy_spark.pipelines import dedup_corpus

    # many exact-dup pairs with ids far apart: a doc-id hash split
    # separates some pair, the component-keyed split never does
    rows = []
    for i in range(40):
        text = f"shared duplicate content number {i} with several more words appended"
        rows.append((i, text))
        rows.append((1000 + i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    _, clusters = dedup_corpus(docs, max_bucket_size=None)
    safe = assign_splits(clusters, id_col="component")
    # every component is entirely inside one split
    n_multi = (
        safe.groupBy("component")
        .agg(F.count_distinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert n_multi == 0
    # whereas the naive per-doc split DOES separate at least one pair
    naive = assign_splits(clusters, id_col="doc_id")
    n_multi_naive = (
        naive.groupBy("component")
        .agg(F.count_distinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert n_multi_naive > 0


def test_span_corrupt_roundtrip_and_structure(spark):
    from scrappy_spark.operators.curation import span_corrupt

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon") for i in range(20)],
        "doc_id long, text string",
    )
    out = span_corrupt(df, mask_rate=0.3).collect()
    assert len(out) == 20
    for r in out:
        inp, tgt = r["input_text"].split(), r["target_text"].split()
        sent_in = [t for t in inp if t.startswith("<extra_id_")]
        sent_tgt = [t for t in tgt if t.startswith("<extra_id_")]
        # sentinels appear once per span, in order, identical on both sides
        assert sent_in == [f"<extra_id_{k}>" for k in range(r["n_spans"])]
        assert sent_tgt == sent_in
        # reconstruction: replacing each input sentinel with its target
        # span yields the original token sequence
        spans, cur = {}, None
        for t in tgt:
            if t.startswith("<extra_id_"):
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        rebuilt = []
        for t in inp:
            rebuilt.extend(spans[t] if t.startswith("<extra_id_") else [t])
        assert rebuilt == ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                           "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
        assert r["n_masked"] == sum(len(v) for v in spans.values())
    # deterministic
    again = span_corrupt(df, mask_rate=0.3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_rag_retrieve_self_retrieval(spark):
    from scrappy_spark.pipelines import rag_retrieve

    docs = spark.createDataFrame(
        [(i, f"document number {i} talks about topic {i} in depth with many words "
             f"and continues for a while describing subject {i} thoroughly")
         for i in range(10)],
        "doc_id long, text string",
    )
    # query with doc 3's first chunk verbatim -> that chunk must come
    # back at rank 1 with cosine 1.0 (identical text, same encoder)
    q = docs.filter(F.col("doc_id") == 3).select(
        F.lit(0).alias("query_id"),
        F.substring("text", 1, 200).alias("query_text"),
    )
    out = rag_retrieve(docs, q, k=3).orderBy(F.desc("cos_sim")).collect()
    assert out[0]["doc_id"] == 3 and out[0]["chunk_idx"] == 0
    assert out[0]["cos_sim"] == 1.0
