"""LLM-data operators: text stats, fingerprints, near-dup dedup,
similarity search (incl. LSH recall vs the exact baseline)."""

import pytest
from pyspark.sql import functions as F

from scrappy_spark.operators import dedup_approx as DA, similarity as SIM, textstats as TS

SF_DIR = "/root/testdata/sf0.001"


def test_doc_stats_values(spark):
    df = spark.createDataFrame([(1, "The cat the cat"), (2, "")], ["doc_id", "text"])
    rows = {r.doc_id: r for r in TS.doc_stats(df).collect()}
    assert rows[1].n_tokens == 4
    assert rows[1].n_distinct_tokens == 2
    assert rows[1].stopword_ratio == 0.5  # 'the' twice out of 4
    assert rows[1].avg_token_len == 3.0
    assert rows[2].n_tokens == 0 and rows[2].stopword_ratio == 0.0


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  world!"), (2, "hello world"), (3, "other text")],
        ["doc_id", "text"],
    )
    fps = {r.doc_id: r.fingerprint for r in TS.fingerprint(df).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, "der hund und die katze"), (3, "zzz qqq")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.pred_lang for r in TS.lang_id(df).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "und"


def test_exact_dup_groups(spark):
    df = spark.createDataFrame([(1, "same"), (2, "same"), (3, "diff")], ["doc_id", "text"])
    out = {r.doc_id: r.n_dups for r in DA.exact_dup_groups(df).collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_identical_docs_share_signature(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "q r s t u v w")],
        ["doc_id", "text"],
    )
    sig = DA.minhash_signatures(df, num_hashes=4).collect()
    by_doc = {}
    for r in sig:
        by_doc.setdefault(r.doc_id, {})[r.seed] = r.minhash
    assert by_doc[1] == by_doc[2] != by_doc[3]
    pairs = DA.minhash_candidate_pairs(
        DA.minhash_signatures(df, num_hashes=4), min_matches=4
    ).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]


def test_lsh_bucket_cap_is_default_on(spark):
    """A hot (seed, minhash) bucket emits d² join rows; the skew cap
    must be the DEFAULT so a direct caller on a duplicate-heavy corpus
    never pays that blowup. None is the explicit opt-out."""
    hot = [(i, s, mh) for i in range(DA.LSH_MAX_BUCKET + 1) for s, mh in ((0, 7), (1, 9))]
    cold = [(i, s, mh) for i in (5000, 5001) for s, mh in ((0, 11), (1, 13))]
    sig = spark.createDataFrame(hot + cold, "doc_id long, seed int, minhash long")
    capped = DA.minhash_candidate_pairs(sig, min_matches=2)  # default cap
    assert [(p.id_a, p.id_b) for p in capped.collect()] == [(5000, 5001)]
    n = DA.LSH_MAX_BUCKET + 1
    uncapped = DA.minhash_candidate_pairs(sig, min_matches=2, max_bucket_size=None)
    assert uncapped.count() == n * (n - 1) // 2 + 1  # d² pairs are back
    # cap exactly at the bucket size keeps it
    kept = DA.minhash_candidate_pairs(sig, min_matches=2, max_bucket_size=n)
    assert kept.count() == n * (n - 1) // 2 + 1


def test_minhash_xxhash64_variant(spark):
    """The deployment hash (xxhash64) preserves LSH semantics: identical
    docs share full signatures; long-typed minhashes still min-order."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "q r s t u v w")],
        ["doc_id", "text"],
    )
    sig = DA.minhash_signatures(df, num_hashes=4, hash_fn="xxhash64")
    assert dict(sig.dtypes)["minhash"] == "bigint"
    pairs = DA.minhash_candidate_pairs(sig, min_matches=4).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    fp = {r.doc_id: r.simhash for r in DA.simhash(df, hash_fn="xxhash64").collect()}
    assert fp[1] == fp[2] != fp[3]


def test_jaccard_pairs_blocked(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en"),
            (2, "alpha beta gamma epsilon", "en"),
            (3, "alpha beta gamma delta", "de"),  # same text, other block
            (4, "totally different words here", "en"),
        ],
        ["doc_id", "text", "lang"],
    )
    out = DA.jaccard_pairs(df, block_col="lang", threshold=0.5).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in out] == [(1, 2, 0.6)]


def test_simhash_near_duplicates(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again today"),
            (3, "entirely unrelated content about databases and query planners"),
        ],
        ["doc_id", "text"],
    )
    fp = DA.simhash(df)
    pairs = DA.simhash_near_pairs(fp, max_hamming=8).collect()
    assert (1, 2) in [(p.id_a, p.id_b) for p in pairs]
    vals = {r.doc_id: r.simhash for r in fp.collect()}
    assert vals[1] != vals[3]


def test_cosine_topk_exact(spark):
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.cosine_topk(df, q, k=2).collect()
    assert [r.vec_id for r in out] == [0, 1]  # self first, then nearest


def test_ann_lsh_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = SIM.cosine_topk(emb, queries, k=5).collect()
    approx = SIM.ann_lsh_topk(emb, queries, k=5).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    # LSH must at least find each query's own vector + some true neighbors
    assert all((q, q) in approx_set for q in range(3))
    assert len(exact_set & approx_set) >= 3


def test_approx_count_distinct_error(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_partkey", 0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05


def test_vocab_coverage_known_corpus(spark):
    """Top-2 vocab over a tiny corpus: 'a' and 'b' dominate; OOV
    occurrences count with multiplicity; empty docs survive at 0."""
    from scrappy_spark.operators.textstats import vocab_coverage

    docs = spark.createDataFrame(
        [
            (1, "a a a b b rare1"),
            (2, "a b b rare2 rare2"),
            (3, "a b"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in vocab_coverage(docs, vocab_size=2).collect()}
    # freq: a=5, b=5 → vocab {a, b} (count desc, token asc tie-break)
    assert out[1].n_tokens == 6 and out[1].n_oov == 1
    assert out[2].n_tokens == 5 and out[2].n_oov == 2  # multiplicity
    assert out[3].n_oov == 0 and out[3].oov_rate == 0.0
    assert out[4].n_tokens == 0 and out[4].oov_rate == 0.0
    assert abs(out[2].oov_rate - 0.4) < 1e-9


def test_prefix_filter_jaccard_join_exact(spark):
    """Prefix-filtered join returns EXACTLY the brute-force result —
    including a pair that shares zero RARE tokens (its overlap is all
    high-frequency tokens, the case a careless prefix choice would
    drop) — with integer-exact basis points."""
    from itertools import combinations

    from scrappy_spark.operators.dedup_approx import prefix_filter_jaccard_join

    docs_py = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),     # J(1,2) = 4/6 = 0.666
        (3, "alpha beta gamma delta epsilon"),  # J(1,3) = 1.0 exact dup
        (4, "omega psi chi phi"),               # disjoint from 1-3
        (5, "omega psi chi phi upsilon"),       # J(4,5) = 4/5 = 0.8
        (6, "alpha beta unrelated tokens here"),  # J(1,6)=2/8 below t
        (7, ""),                                # empty: never appears
    ]
    docs = spark.createDataFrame(docs_py, ["doc_id", "text"])
    out = {
        (r.id_a, r.id_b): r
        for r in prefix_filter_jaccard_join(docs, threshold_bp=6000).collect()
    }

    # brute force over the same tokenization
    sets = {i: set(t.lower().split()) for i, t in docs_py if t}
    expect = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        un = len(sets[a] | sets[b])
        if 10000 * inter >= 6000 * un:
            expect[(a, b)] = (inter, un, 10000 * inter // un)

    assert set(out) == set(expect) == {(1, 2), (1, 3), (2, 3), (4, 5)}
    for k, (inter, un, bp) in expect.items():
        assert (out[k].inter, out[k].un, out[k].jaccard_bp) == (inter, un, bp)
    assert out[(1, 3)].jaccard_bp == 10000  # exact dup hits 10000 exactly


def test_prefix_filter_jaccard_collapsed_equals_direct(spark):
    """Collapse-first variant returns the EXACT pair set of the direct
    join on a corpus mixing exact-dup groups (incl. a 3-member group
    and a token-free dup pair) with near-dups across groups."""
    from scrappy_spark.operators.dedup_approx import (
        prefix_filter_jaccard_join,
        prefix_filter_jaccard_join_collapsed,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),   # dup of 1
            (3, "alpha beta gamma delta epsilon"),   # dup of 1
            (4, "alpha beta gamma delta zeta"),      # near-dup of group
            (5, "omega psi chi phi"),
            (6, "omega psi chi phi"),                # dup of 5
            (7, "!!!"),                              # token-free
            (8, "!!!"),                              # token-free dup: no pair
        ],
        ["doc_id", "text"],
    )
    key = lambda r: (r.id_a, r.id_b)  # noqa: E731
    direct = {key(r): (r.inter, r.un, r.jaccard_bp)
              for r in prefix_filter_jaccard_join(docs).collect()}
    coll = {key(r): (r.inter, r.un, r.jaccard_bp)
            for r in prefix_filter_jaccard_join_collapsed(docs).collect()}
    assert coll == direct
    assert (1, 2) in coll and coll[(1, 2)] == (5, 5, 10000)
    assert (1, 4) in coll and (2, 4) in coll and (3, 4) in coll
    assert not any(7 in k or 8 in k for k in coll)
