"""LLM-corpus operators, round-5 third batch: the perceptual near-dup
triad (image dHash / audio energy / video frame-sum fingerprints, each
through the REAL codec path with a bit-exact oracle), DoReMi-style
domain reweighting + mixture materialization, deterministic epoch
shuffling, product-quantization ANN, and contrastive negative
sampling.

The reference is text-only with no sampling or mixtures (scrappy.py);
these extend the multimodal + curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..operators.phash import IMG_SIDE, dhash_from_text, dhash_pairs
from ..operators.ranking import global_rank
from ..operators.reweight import domain_reweight
from ..operators.textstats import unigram_surprisal
from .registry import register

#: DuckDB mirror of operators/mining.py::tokens_col
_RAW_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

# ---------------------------------------------------------------------------
# dHash: the oracle recomputes the 64 gradient bits straight from the
# text bytes. This is sound because the Spark kernel's PNG roundtrip is
# lossless (encode_png → decode_image_bytes is identity on pixels), so
# the REAL-codec hash is a pure function of the tiled utf-8 bytes —
# shared geometry constants keep the two derivations aligned.
# ---------------------------------------------------------------------------

#: nearest_resize column map for 16 → 9 (operators/codecs.py:nearest_resize)
_XS = [(j * IMG_SIDE) // 9 for j in range(9)]
_HEX_LEN = 2 * IMG_SIDE * IMG_SIDE  # 512 hex chars = 256 bytes


def _sql_byte(pos: int) -> str:
    return f"CAST(('0x' || substr(h2, {2 * pos + 1}, 2)) AS INT)"


def _sql_band(b: int) -> str:
    terms = []
    for i in (2 * b, 2 * b + 1):  # nearest_resize row map 16→8 is r=2i
        for j in range(8):
            w = 1 << ((i * 8 + j) - 16 * b)
            pl = 32 * i + _XS[j]
            pr = 32 * i + _XS[j + 1]
            terms.append(
                f"CASE WHEN {_sql_byte(pl)} < {_sql_byte(pr)} THEN {w} ELSE 0 END"
            )
    return " + ".join(terms)


#: byte-tiling CTE shared by the image and audio fingerprints (both
#: tile the utf-8 bytes to 256 = 16x16 = AFP_N).
_TILE_SQL = f"""
    p AS (SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents
          WHERE len(text) > 0),
    rep AS (SELECT doc_id,
                   substr(repeat(hx, CAST(ceil({_HEX_LEN}.0 / len(hx)) AS INT)),
                          1, {_HEX_LEN}) AS h2
            FROM p)
"""

_DHASH_SQL = f"""
    {_TILE_SQL},
    sig AS (SELECT doc_id,
                   CAST({_sql_band(0)} AS BIGINT) AS b0,
                   CAST({_sql_band(1)} AS BIGINT) AS b1,
                   CAST({_sql_band(2)} AS BIGINT) AS b2,
                   CAST({_sql_band(3)} AS BIGINT) AS b3
            FROM rep)
"""


@register(
    "q_image_dhash",
    sql=f"""
    WITH {_DHASH_SQL}
    SELECT doc_id, printf('%04x%04x%04x%04x', b3, b2, b1, b0) AS dhash_hex,
           b0, b1, b2, b3
    FROM sig
    """,
    doc="Perceptual image hash (dHash) through the REAL codec path: "
    "each doc's bytes tile a 16x16 gray image, PNG-encode, PNG-decode "
    "(production decoder, all in the Arrow kernel), 9x8 nearest "
    "downsample, 64 gradient-sign bits as 4 16-bit bands. The oracle "
    "recomputes the bits from the raw bytes — valid exactly because "
    "the PNG roundtrip is lossless — so the full decode+hash kernel is "
    "value-hash-gated, not rows-only.",
    tags=("multimodal", "dedup", "phash"),
)
def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return dhash_from_text(docs)


@register(
    "q_image_near_dups",
    sql=f"""
    WITH {_DHASH_SQL}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
              + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
                AS BIGINT) AS hamming
    FROM sig a JOIN sig b
      ON a.doc_id < b.doc_id
     AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 6
    """,
    doc="Near-duplicate images: banded LSH join on exact 16-bit dHash "
    "bands (perfect recall at Hamming<=3, pigeonhole), exact popcount "
    "verify at <=6. Engine side caps bucket lists (LSH_MAX_BUCKET) and "
    "expands pairs from sorted id arrays — one groupBy, never an "
    "all-pairs product; the oracle's O(n^2) join is the spec, not the "
    "plan.",
    tags=("multimodal", "dedup", "phash"),
)
def q_image_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return dhash_pairs(dhash_from_text(docs), max_hamming=6)


# ---------------------------------------------------------------------------
# audio fingerprint (energy-delta bits; operators/phash.py audio half)
# ---------------------------------------------------------------------------


def _sql_energy(f: int) -> str:
    return " + ".join(
        f"(({_sql_byte(8 * f + k)} - 128) * ({_sql_byte(8 * f + k)} - 128))"
        for k in range(8)
    )


_AFP_EN = ",\n            ".join(f"{_sql_energy(f)} AS e{f}" for f in range(32))
_AFP_B0 = " + ".join(
    f"CASE WHEN e{f + 1} > e{f} THEN {1 << f} ELSE 0 END" for f in range(16)
)
_AFP_B1 = " + ".join(
    f"CASE WHEN e{f + 1} > e{f} THEN {1 << (f - 16)} ELSE 0 END" for f in range(16, 31)
)

_AFP_SQL = f"""
    {_TILE_SQL},
    en AS (SELECT doc_id,
            {_AFP_EN}
           FROM rep),
    asig AS (SELECT doc_id,
                    CAST({_AFP_B0} AS BIGINT) AS b0,
                    CAST({_AFP_B1} AS BIGINT) AS b1
             FROM en)
"""


@register(
    "q_audio_fingerprint",
    sql=f"""
    WITH {_AFP_SQL}
    SELECT doc_id, printf('%08x', b1 * 65536 + b0) AS afp_hex, b0, b1
    FROM asig
    """,
    doc="Chromaprint-style audio fingerprint through the REAL codec "
    "path: bytes tile a 256-sample 8-bit PCM clip, WAV-encode, "
    "WAV-decode (stdlib wave both ways, in the Arrow kernel), then 31 "
    "energy-delta sign bits over 32 frames. 8-bit PCM keeps every "
    "frame energy an exact integer, so the oracle recomputes the bits "
    "from the raw bytes and the kernel is value-hash-gated.",
    tags=("multimodal", "dedup", "audio"),
)
def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.phash import audio_fp_from_text

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return audio_fp_from_text(docs)


@register(
    "q_audio_near_dups",
    sql=f"""
    WITH {_AFP_SQL}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
                AS BIGINT) AS hamming
    FROM asig a JOIN asig b
      ON a.doc_id < b.doc_id AND (a.b0 = b.b0 OR a.b1 = b.b1)
    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) <= 3
    """,
    doc="Near-duplicate audio clips: banded fingerprint LSH (2 bands, "
    "perfect recall at Hamming<=1) + exact popcount verify at <=3; "
    "same capped-bucket pair expansion as the image path.",
    tags=("multimodal", "dedup", "audio"),
)
def q_audio_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.phash import audio_fp_from_text, audio_fp_pairs

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return audio_fp_pairs(audio_fp_from_text(docs), max_hamming=3)


# ---------------------------------------------------------------------------
# DoReMi-lite domain reweighting over unigram surprisal
# ---------------------------------------------------------------------------

_RW_TAU = 0.5
_RW_BUDGET = 10_000


#: the reweight CTE chain, shared by q_domain_reweight and the
#: mixture materializer — one source of truth for the math.
_RW_CTE = f"""
    t AS (SELECT doc_id, unnest({_RAW_TOKS}) AS tok FROM documents),
    freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS s FROM freq),
    lp AS (SELECT tok,
                  CAST(round(ln(CAST(c AS DOUBLE) / s) * 1000000) AS BIGINT)
                      AS lp_micro
           FROM freq, tot),
    doc AS (SELECT t.doc_id, d.lang, count(*) AS n_toks,
                   -sum(lp.lp_micro) AS loss_micro
            FROM t JOIN lp USING (tok)
                   JOIN documents d ON d.doc_id = t.doc_id
            GROUP BY 1, 2),
    g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_toks) AS BIGINT) AS n_tokens,
                 CAST(sum(loss_micro) AS BIGINT) AS loss_micro
          FROM doc GROUP BY 1),
    tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
                  CAST(sum(loss_micro) AS BIGINT) AS tot_loss FROM g),
    s AS (SELECT lang, n_docs, n_tokens,
                 loss_micro / n_tokens / 1e6 AS mean_loss,
                 greatest(0, loss_micro / n_tokens / 1e6
                           - tot_loss / tot_tokens / 1e6) AS excess,
                 CAST(n_tokens AS DOUBLE) / tot_tokens AS share
          FROM g, tt),
    u AS (SELECT *, share * exp(excess / {_RW_TAU}) AS u FROM s),
    z AS (SELECT sum(u) AS z FROM u)
"""


@register(
    "q_domain_reweight",
    sql=f"""
    WITH {_RW_CTE}
    SELECT lang, n_docs, n_tokens,
           round(mean_loss, 6) AS mean_loss_r,
           round(excess, 6)    AS excess_r,
           round(u / z, 6)     AS weight_r,
           CAST(floor(u / z * {_RW_BUDGET}) AS BIGINT) AS doc_budget
    FROM u, z
    """,
    doc="DoReMi-style one-step domain reweighting (arXiv 2305.10429): "
    "per-lang token-weighted mean unigram surprisal, excess over the "
    "global mean, weight = share * exp(excess/tau) normalized, plus an "
    "integer doc budget. Everything past the per-doc loss aggregation "
    "runs on a <= n_domains-row frame; loss sums are integer "
    "micro-nats, so the heavy aggregation is cross-engine exact.",
    tags=("llm", "curation", "mixture"),
)
def q_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    doc_loss = unigram_surprisal(docs).join(docs.select("doc_id", "lang"), "doc_id")
    out = domain_reweight(
        doc_loss, "lang", "surprisal_micro", "n_tokens", tau=_RW_TAU, budget=_RW_BUDGET
    )
    return out.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round("mean_loss", 6).alias("mean_loss_r"),
        F.round("excess", 6).alias("excess_r"),
        F.round("weight", 6).alias("weight_r"),
        "doc_budget",
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle
# ---------------------------------------------------------------------------

_EPOCH_SALT = "ep1:"
_EPOCH_SHARD = 128


@register(
    "q_epoch_shuffle",
    sql=f"""
    SELECT doc_id,
           CAST(row_number() OVER (
                ORDER BY md5('{_EPOCH_SALT}' || CAST(doc_id AS VARCHAR)), doc_id)
                - 1 AS BIGINT) AS position,
           CAST((row_number() OVER (
                ORDER BY md5('{_EPOCH_SALT}' || CAST(doc_id AS VARCHAR)), doc_id)
                - 1) // {_EPOCH_SHARD} AS BIGINT) AS shard_id
    FROM documents
    """,
    doc="Deterministic epoch shuffle: global permutation ordered by "
    "md5(salt||id) — reproducible across engines and runs, new salt "
    "per epoch — cut into fixed-size shards. Uses the two-phase "
    "distributed rank (operators/ranking.py), not the single-task "
    "global window the oracle spells.",
    tags=("llm", "curation", "ranking"),
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    key = F.md5(F.concat(F.lit(_EPOCH_SALT), F.col("doc_id").cast("string")))
    ranked = global_rank(docs, [key, F.col("doc_id")], rank_col="position")
    return ranked.withColumn(
        "shard_id", (F.col("position") / F.lit(_EPOCH_SHARD)).cast("long")
    )


# ---------------------------------------------------------------------------
# product-quantization ANN (operators/pq.py)
# ---------------------------------------------------------------------------


@register(
    "q_pq_ann_topk",
    sql="""
    SELECT vec_id AS query_id,
           CAST(1 AS BIGINT) AS n_results,
           CAST(1 AS BIGINT) AS self_found,
           CAST(1 AS BIGINT) AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
    doc="Product-quantization ANN (Jegou et al. 2011): 64-d embeddings "
    "-> 8 codes from per-subspace 16-centroid codebooks (~32x memory "
    "compression); asymmetric-distance search scores every doc from "
    "broadcast m*ksub lookup tables without reading any embedding. "
    "Declared through its banded-flag audit (operators/ann_audit.py): "
    "the oracle pins full-k results, self-retrieval, and recall ≥ 2 "
    "of the true top-10 per query (measured min 4 at sf0.01, min 5 at "
    "sf0.001 — 2x floor margin; no exact-score flag because ADC "
    "scores are approximate by design). Raw top-k stays pinned in "
    "tests/test_phash_reweight.py.",
    tags=("llm", "similarity", "approx"),
)
def q_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pq as PQ
    from ..operators.ann_audit import topk_recall_audit
    from ..operators.similarity import cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    book = PQ.pq_train(e)
    codes = PQ.pq_encode(e, book)
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann = PQ.pq_search(codes, book, queries, k=10)
    exact = cosine_topk(e, queries, k=10)
    return topk_recall_audit(ann, exact, k=10, min_hits=2)


# ---------------------------------------------------------------------------
# contrastive negative sampling (operators/contrastive.py)
# ---------------------------------------------------------------------------

_CN_B = 64
_CN_PROBE = 2
_CN_K = 4


@register(
    "q_contrastive_negatives",
    sql=f"""
    WITH cand AS (SELECT doc_id AS cand_id, text AS ctext,
            (CAST(('0x' || substr(md5('cb:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_CN_B}) AS bucket
          FROM documents),
    probes AS (SELECT doc_id AS anchor_id, text AS atext,
            (CAST(('0x' || substr(md5('ab' || CAST(i AS VARCHAR) || ':'
                       || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_CN_B}) AS bucket
          FROM documents, (SELECT unnest(range(0, {_CN_PROBE})) AS i) g
          WHERE doc_id < 50),
    pool AS (SELECT DISTINCT anchor_id, cand_id
             FROM probes JOIN cand USING (bucket)
             WHERE cand_id <> anchor_id AND ctext <> atext),
    ranked AS (SELECT anchor_id, cand_id,
            CAST(row_number() OVER (PARTITION BY anchor_id
                 ORDER BY md5('nr:' || CAST(anchor_id AS VARCHAR) || '|'
                              || CAST(cand_id AS VARCHAR)), cand_id)
                 AS BIGINT) AS rank
          FROM pool)
    SELECT anchor_id, cand_id, rank FROM ranked WHERE rank <= {_CN_K}
    """,
    doc="Deterministic contrastive negative sampling: anchors probe 2 "
    "md5-derived candidate buckets (equi-join -- each anchor sees "
    "~n_probe/n_buckets of the corpus, never all of it), exact-dup "
    "false negatives are excluded, and the per-anchor permutation is "
    "md5(anchor||cand) -- reproducible bit-for-bit across engines and "
    "task retries, which rand()-based sampling is not.",
    tags=("llm", "curation", "contrastive"),
)
def q_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.contrastive import contrastive_negatives

    docs = load_table(spark, sf_dir, "documents")
    anchors = docs.filter(F.col("doc_id") < 50).select("doc_id", "text")
    return contrastive_negatives(docs, anchors, k=_CN_K, n_probe=_CN_PROBE)


@register(
    "q_domain_mixture_sample",
    sql=f"""
    WITH {_RW_CTE},
    budgets AS (SELECT lang, CAST(floor(u / z * {_RW_BUDGET}) AS BIGINT)
                       AS doc_budget
                FROM u, z),
    ranked AS (SELECT d.doc_id, d.lang,
            CAST(row_number() OVER (PARTITION BY d.lang
                 ORDER BY md5('mx:' || CAST(d.doc_id AS VARCHAR)), d.doc_id)
                 AS BIGINT) AS pick
          FROM documents d)
    SELECT ranked.doc_id, ranked.lang, ranked.pick
    FROM ranked JOIN budgets USING (lang)
    WHERE ranked.pick <= budgets.doc_budget
    """,
    doc="Materialize the DoReMi mixture: per-domain integer budgets "
    "from q_domain_reweight's math (shared CTE -- one source of "
    "truth), then a deterministic md5-ranked pick of that many docs "
    "per domain. The rank window is PARTITIONED by domain (parallel), "
    "budgets join back broadcast-sized; end-to-end reweight -> "
    "materialized corpus in one declared query.",
    tags=("llm", "curation", "mixture"),
)
def q_domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    doc_loss = unigram_surprisal(docs).join(docs.select("doc_id", "lang"), "doc_id")
    budgets = domain_reweight(
        doc_loss, "lang", "surprisal_micro", "n_tokens", tau=_RW_TAU, budget=_RW_BUDGET
    ).select("lang", "doc_budget")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("mx:"), F.col("doc_id").cast("string"))), "doc_id"
    )
    ranked = docs.select("doc_id", "lang").withColumn(
        "pick", F.row_number().over(w).cast("long")
    )
    return ranked.join(F.broadcast(budgets), "lang").filter(
        F.col("pick") <= F.col("doc_budget")
    ).select("doc_id", "lang", "pick")


# ---------------------------------------------------------------------------
# video fingerprint (per-frame luma-sum delta bits; phash.py video half)
# ---------------------------------------------------------------------------


def _sql_venergy(f: int) -> str:
    return " + ".join(f"{_sql_byte(16 * f + k)}" for k in range(16))


_VFP_EN = ",\n            ".join(f"{_sql_venergy(f)} AS e{f}" for f in range(32))

_VFP_SQL = f"""
    pv AS (SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents
           WHERE len(text) > 0),
    repv AS (SELECT doc_id,
                    substr(repeat(hx, CAST(ceil(1024.0 / len(hx)) AS INT)),
                           1, 1024) AS h2
             FROM pv),
    env AS (SELECT doc_id,
            {_VFP_EN}
           FROM repv),
    vsig AS (SELECT doc_id,
                    CAST({_AFP_B0} AS BIGINT) AS b0,
                    CAST({_AFP_B1} AS BIGINT) AS b1
             FROM env)
"""


@register(
    "q_video_fingerprint",
    sql=f"""
    WITH {_VFP_SQL}
    SELECT doc_id, printf('%08x', b1 * 65536 + b0) AS vfp_hex, b0, b1
    FROM vsig
    """,
    doc="Video fingerprint through the REAL container path: bytes "
    "become a 32-frame 4x4 mono Y4M clip, encoded and decoded with "
    "the production parsers, then 31 per-frame luma-sum delta bits "
    "(the video twin of the audio energy bits). Mono Y4M is lossless "
    "raw luma, so the oracle recomputes the bits from the bytes and "
    "the decode kernel is value-hash-gated. Completes the perceptual "
    "near-dup triad: image dHash / audio energy / video frame-sums.",
    tags=("multimodal", "dedup", "video"),
)
def q_video_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.phash import video_fp_from_text

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return video_fp_from_text(docs)


@register(
    "q_video_near_dups",
    sql=f"""
    WITH {_VFP_SQL}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
                AS BIGINT) AS hamming
    FROM vsig a JOIN vsig b
      ON a.doc_id < b.doc_id AND (a.b0 = b.b0 OR a.b1 = b.b1)
    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) <= 3
    """,
    doc="Near-duplicate clips: banded video-fingerprint LSH + exact "
    "popcount verify; same capped-bucket machinery as image/audio.",
    tags=("multimodal", "dedup", "video"),
)
def q_video_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.phash import video_fp_from_text, video_fp_pairs

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return video_fp_pairs(video_fp_from_text(docs), max_hamming=3)
