"""Unit tests: perceptual image dHash + near-dup pairs, DoReMi-lite
domain reweighting, deterministic epoch shuffle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrappy_spark.operators.codecs import encode_png
from scrappy_spark.operators.phash import (
    _dhash_bits,
    dhash_from_text,
    dhash_images,
    dhash_pairs,
)
from scrappy_spark.operators.reweight import domain_reweight


# ---------------------------------------------------------------------------
# dHash kernel math
# ---------------------------------------------------------------------------


def test_dhash_bits_known_gradient():
    # strictly increasing rows: every left<right comparison true → all
    # 64 bits set
    arr = np.tile(np.arange(16, dtype=np.uint8) * 10, (16, 1))
    assert _dhash_bits(arr) == (1 << 64) - 1
    # constant image: no strict inequality → zero hash
    assert _dhash_bits(np.full((16, 16), 7, np.uint8)) == 0
    # flipping the gradient flips every bit
    assert _dhash_bits(arr[:, ::-1].copy()) == 0


def test_dhash_rgb_luma_path():
    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[:, 8:, :] = 255  # right half white → increasing across the seam
    h = _dhash_bits(rgb)
    assert h != 0
    gray = np.zeros((16, 16), np.uint8)
    gray[:, 8:] = 255
    assert h == _dhash_bits(gray)


def test_dhash_images_real_png_decode(spark):
    rng = np.random.default_rng(7)
    imgs = {i: rng.integers(0, 256, (16, 16), dtype=np.uint8) for i in range(5)}
    rows = [(i, bytearray(encode_png(a))) for i, a in imgs.items()]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in dhash_images(df).collect()}
    for i, a in imgs.items():
        want = _dhash_bits(a)
        assert out[i]["dhash_hex"] == f"{want:016x}"
        got = (
            out[i]["b0"]
            | (out[i]["b1"] << 16)
            | (out[i]["b2"] << 32)
            | (out[i]["b3"] << 48)
        )
        assert got == want


def test_dhash_pairs_exact_and_near(spark):
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    near = base.copy()
    near[0, 0] ^= 0xFF  # perturb one pixel → few bit flips
    far = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    rows = [
        (0, bytearray(encode_png(base))),
        (1, bytearray(encode_png(base))),  # exact dup of 0
        (2, bytearray(encode_png(near))),
        (3, bytearray(encode_png(far))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    sig = dhash_images(df)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in dhash_pairs(sig).collect()}
    assert pairs[(0, 1)] == 0  # exact dup at hamming 0
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_dhash_from_text_tiling_identity(spark):
    # text whose bytes tile deterministically; kernel goes through a
    # REAL png encode/decode, so hash must equal direct pixel hash
    text = "abcdefgh" * 3
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    [row] = dhash_from_text(df).collect()
    raw = text.encode()
    tiled = (raw * (256 // len(raw) + 1))[:256]
    pix = np.frombuffer(tiled, np.uint8).reshape(16, 16)
    assert row["dhash_hex"] == f"{_dhash_bits(pix):016x}"


def test_dhash_from_text_skips_empty(spark):
    df = spark.createDataFrame([(0, ""), (1, "xyz")], "doc_id long, text string")
    out = dhash_from_text(df).collect()
    assert [r["doc_id"] for r in out] == [1]


# ---------------------------------------------------------------------------
# domain reweight
# ---------------------------------------------------------------------------


def test_domain_reweight_upweights_high_loss(spark):
    # two domains, equal token mass; domain b has double the per-token
    # loss → its weight must exceed its 0.5 share; budgets sum ≤ budget
    rows = [
        ("a", 100, 1_000_000 * 100),
        ("a", 100, 1_000_000 * 100),
        ("b", 100, 2_000_000 * 100),
        ("b", 100, 2_000_000 * 100),
    ]
    df = spark.createDataFrame(rows, "lang string, n_tokens long, loss long")
    out = {
        r["lang"]: r
        for r in domain_reweight(df, "lang", "loss", "n_tokens", budget=1000).collect()
    }
    assert out["b"]["excess"] == pytest.approx(0.5)  # 2.0 - global 1.5
    assert out["a"]["excess"] == 0.0
    assert out["b"]["weight"] > 0.5 > out["a"]["weight"]
    assert out["a"]["weight"] + out["b"]["weight"] == pytest.approx(1.0)
    assert out["a"]["doc_budget"] + out["b"]["doc_budget"] <= 1000
    assert out["a"]["mean_loss"] == pytest.approx(1.0)


def test_domain_reweight_uniform_loss_keeps_shares(spark):
    rows = [("a", 300, 1_000_000 * 300), ("b", 100, 1_000_000 * 100)]
    df = spark.createDataFrame(rows, "lang string, n_tokens long, loss long")
    out = {
        r["lang"]: r
        for r in domain_reweight(df, "lang", "loss", "n_tokens").collect()
    }
    # zero excess everywhere → weights collapse to token shares
    assert out["a"]["weight"] == pytest.approx(0.75)
    assert out["b"]["weight"] == pytest.approx(0.25)


# ---------------------------------------------------------------------------
# epoch shuffle (registered query semantics)
# ---------------------------------------------------------------------------


def test_epoch_shuffle_permutation_and_determinism(spark):
    from scrappy_spark.plans.registry import all_specs

    fn = all_specs()["q_epoch_shuffle"].fn
    a = fn(spark, "/root/testdata/sf0.001").collect()
    b = fn(spark, "/root/testdata/sf0.001").collect()
    pos_a = sorted(r["position"] for r in a)
    assert pos_a == list(range(len(a)))  # exact permutation
    assert {(r["doc_id"], r["position"]) for r in a} == {
        (r["doc_id"], r["position"]) for r in b
    }  # deterministic
    # shuffled: positions must not follow doc_id order
    by_id = [r["position"] for r in sorted(a, key=lambda r: r["doc_id"])]
    assert by_id != sorted(by_id)


# ---------------------------------------------------------------------------
# audio fingerprint
# ---------------------------------------------------------------------------


def test_afp_bits_integer_exact():
    from scrappy_spark.operators.codecs import decode_wav_bytes, encode_wav
    from scrappy_spark.operators.phash import _afp_bits

    rng = np.random.default_rng(11)
    samples = rng.integers(0, 256, 256, dtype=np.uint8)
    _, wave = decode_wav_bytes(encode_wav(samples))
    # roundtrip is lossless for 8-bit PCM: quantized wave == samples-128
    assert np.array_equal(np.rint(wave * 128.0).astype(np.int64), samples.astype(np.int64) - 128)
    e = ((samples.astype(np.int64) - 128).reshape(32, 8) ** 2).sum(axis=1)
    want = sum(1 << f for f in range(31) if e[f + 1] > e[f])
    assert _afp_bits(wave) == want


def test_afp_constant_silence_is_zero():
    from scrappy_spark.operators.codecs import decode_wav_bytes, encode_wav
    from scrappy_spark.operators.phash import _afp_bits

    _, wave = decode_wav_bytes(encode_wav(np.full(256, 128, np.uint8)))
    assert _afp_bits(wave) == 0


def test_audio_fp_pairs_exact_dup(spark):
    from scrappy_spark.operators.phash import audio_fp_from_text, audio_fp_pairs

    df = spark.createDataFrame(
        [(0, "same clip text"), (1, "same clip text"), (2, "another thing entirely zz")],
        "doc_id long, text string",
    )
    sig = audio_fp_from_text(df)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in audio_fp_pairs(sig).collect()}
    assert pairs.get((0, 1)) == 0


# ---------------------------------------------------------------------------
# product quantization ANN
# ---------------------------------------------------------------------------


def test_pq_recall_and_self_retrieval(spark):
    from collections import defaultdict

    from scrappy_spark.io import load_table
    from scrappy_spark.operators import pq as PQ
    from scrappy_spark.operators.similarity import cosine_topk

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    book = PQ.pq_train(e)
    assert book.count() == PQ.PQ_M * PQ.PQ_KSUB  # broadcast-sized
    codes = PQ.pq_encode(e, book)
    [row] = codes.limit(1).collect()
    assert len(row["codes"]) == PQ.PQ_M  # 64 floats -> 16 codes
    approx = PQ.pq_search(codes, book, qs, k=10).collect()
    brute = cosine_topk(e, qs, k=10).collect()
    ap, bp = defaultdict(set), defaultdict(set)
    for r in approx:
        ap[r["query_id"]].add(r["vec_id"])
    for r in brute:
        bp[r["query_id"]].add(r["vec_id"])
    # near-random fixture vectors are PQ's worst case; measured ~0.6
    overlaps = [len(ap[q] & bp[q]) / 10 for q in bp]
    assert sum(overlaps) / len(overlaps) >= 0.4
    # the quantized self is still each query's own nearest neighbour
    assert all(q in ap[q] for q in bp)


def test_pq_encode_deterministic(spark):
    from scrappy_spark.io import load_table
    from scrappy_spark.operators import pq as PQ

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    book = PQ.pq_train(e)
    a = {r["vec_id"]: r["codes"] for r in PQ.pq_encode(e, book).collect()}
    b = {r["vec_id"]: r["codes"] for r in PQ.pq_encode(e, book).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# contrastive negatives
# ---------------------------------------------------------------------------


def test_contrastive_negatives_deterministic_and_guarded(spark):
    from scrappy_spark.io import load_table
    from scrappy_spark.operators.contrastive import contrastive_negatives

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    anchors = docs.filter(F.col("doc_id") < 20).select("doc_id", "text")
    a = contrastive_negatives(docs, anchors, k=4).collect()
    b = contrastive_negatives(docs, anchors, k=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    per_anchor = {}
    for r in a:
        assert r["cand_id"] != r["anchor_id"]
        assert texts[r["cand_id"]] != texts[r["anchor_id"]]  # no exact dups
        per_anchor.setdefault(r["anchor_id"], []).append(r["rank"])
    for ranks in per_anchor.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))  # dense 1..k'
        assert len(ranks) <= 4


# ---------------------------------------------------------------------------
# video fingerprint
# ---------------------------------------------------------------------------


def test_vfp_real_container_matches_byte_math(spark):
    from scrappy_spark.operators.phash import VFP_BYTES, video_fp_from_text

    text = "some video like content here"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    [row] = video_fp_from_text(df).collect()
    raw = text.encode()
    tiled = (raw * (VFP_BYTES // len(raw) + 1))[:VFP_BYTES]
    e = [sum(tiled[k * 16 : (k + 1) * 16]) for k in range(32)]
    want = sum(1 << f for f in range(31) if e[f + 1] > e[f])
    assert row["vfp_hex"] == f"{want:08x}"
    assert (row["b1"] << 16 | row["b0"]) == want


def test_video_fp_pairs_exact_dup(spark):
    from scrappy_spark.operators.phash import video_fp_from_text, video_fp_pairs

    df = spark.createDataFrame(
        [(0, "clip a"), (1, "clip a"), (2, "something very different indeed")],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in video_fp_pairs(video_fp_from_text(df)).collect()
    }
    assert pairs.get((0, 1)) == 0


# ---------------------------------------------------------------------------
# composed curation pipeline
# ---------------------------------------------------------------------------


def test_curate_corpus_report_is_consistent(spark):
    from scrappy_spark.io import load_table
    from scrappy_spark.pipelines import curate_corpus, dedup_corpus

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    curated, report = curate_corpus(train, bench, max_bucket_size=None)
    rep = report.collect()
    assert len(rep) == train.count()  # one verdict per input doc
    by_v = {}
    for r in rep:
        by_v.setdefault(r["verdict"], []).append(r)
    # kept docs and only kept docs carry a split
    assert all(r["split"] in ("train", "val", "test") for r in by_v["kept"])
    for v in ("dup", "contaminated", "low_quality"):
        assert all(r["split"] is None for r in by_v.get(v, []))
    # curated == the kept set, with component+split attached
    cur = curated.collect()
    assert {r["doc_id"] for r in cur} == {r["doc_id"] for r in by_v["kept"]}
    # dup verdicts match the dedup stage run standalone
    _, clusters = dedup_corpus(train, max_bucket_size=None)
    n_dups = clusters.filter(~F.col("is_canonical")).count()
    assert len(by_v.get("dup", [])) == n_dups
    # leakage safety: all members of one component share one split fate
    comp_splits = {}
    for r in cur:
        comp_splits.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in comp_splits.values())
