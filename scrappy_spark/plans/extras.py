"""Remaining SURVEY.md §2 query keys (P2 institution filter, P12
truncate) plus the rows-only declared queries that surface the ML and
multimodal operator families to the driver (non-SQL-expressible →
rows-only checks; deterministic for fixed seeds/inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..operators.filters import truncate_col
from ..operators.multimodal import (
    attach_fake_payload,
    attach_synthetic_video,
    decode_image,
    extract_meta,
    sample_frames,
)
from .registry import register


@register(
    "q_filter_institution",
    sql="""
    SELECT s_nationkey, inst_flat FROM (
        SELECT s_nationkey,
               array_to_string(flatten([[s] FOR s IN names]), '; ') AS inst_flat
        FROM (SELECT s_nationkey, list_sort(list(s_name)) AS names
              FROM supplier GROUP BY s_nationkey))
    WHERE contains(lower(inst_flat), 'supplier#00000001')
    """,
    doc="P2: case-insensitive substring filter over the flattened "
    "institutions string (reference article_querry.py:19-20) — exercised "
    "on nested arrays built from supplier names.",
    tags=("filter",),
)
def q_filter_institution(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    nested = F.transform(F.sort_array(F.collect_list("s_name")), lambda x: F.array(x))
    flat = s.groupBy("s_nationkey").agg(
        F.array_join(F.flatten(nested), "; ").alias("inst_flat")
    )
    return flat.filter(F.lower(F.col("inst_flat")).contains("supplier#00000001"))


@register(
    "q_truncate",
    sql="""
    SELECT doc_id,
           CASE WHEN length(text) > 100 THEN substr(text, 1, 100) || '...'
                ELSE text END AS text_short,
           CAST(length(text) AS BIGINT) AS orig_len
    FROM documents
    """,
    doc="P12: display ellipsization at 100 chars (reference scrappy.py:385).",
    tags=("scalar",),
)
def q_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        truncate_col(F.col("text"), 100).alias("text_short"),
        F.length("text").cast("long").alias("orig_len"),
    )


@register(
    "q_multimodal_meta",
    sql="""
    SELECT doc_id,
           CAST(octet_length(encode('FAKE' || text)) AS BIGINT) AS byte_len,
           upper(hex(encode(substr('FAKE' || text, 1, 4))))     AS magic_hex,
           md5('FAKE' || text)                                  AS checksum
    FROM documents
    """,
    doc="Multimodal metadata probe: binary payload column → mapInPandas "
    "magic/byte-length/checksum extraction. The payload here is a "
    "deterministic fake (utf-8 bytes + magic) so the DuckDB oracle can "
    "reproduce the exact bytes; real media swaps the ingestion, not the "
    "plumbing.",
    tags=("multimodal",),
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_meta(attach_fake_payload(docs))


# The fake decoder's byte histogram buckets by HIGH NIBBLE (byte >> 4),
# which is exactly the character at every odd position of the payload's
# hex dump — so DuckDB reproduces the histogram with string ops alone:
# strip every second hex char, then count each digit by length delta.
_NIBBLE_COUNTS = ",\n           ".join(
    f"CAST(len(hi) - len(replace(hi, '{d}', '')) AS VARCHAR)" for d in "0123456789ABCDEF"
)


@register(
    "q_multimodal_decode",
    sql=rf"""
    WITH p AS (SELECT doc_id, encode('FAKE' || text) AS b FROM documents),
    nib AS (SELECT doc_id, octet_length(b) AS n,
                   regexp_replace(upper(hex(b)), '(.).', '\1', 'g') AS hi
            FROM p)
    SELECT doc_id, CAST(n AS INT) AS width, 1 AS height,
           concat_ws(',', {_NIBBLE_COUNTS}) AS hist
    FROM nib
    """,
    doc="Image-decode kernel (mapInPandas, Arrow batches) with the "
    "deterministic fake decoder over fake payloads — the oracle "
    "recomputes the 16-bin high-nibble byte histogram from the hex dump "
    "of the same payload bytes, upgrading this from a rows-only check "
    "to a full value-hash gate. Real decode is q_frame_sample's and the "
    "multimodal tests' territory (PNG/BMP/PPM payloads).",
    tags=("multimodal",),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = decode_image(attach_fake_payload(docs), fake=True)
    # Flatten the histogram for the driver harness (no complex-typed
    # output columns in declared queries — contract lint enforces this).
    return out.withColumn("hist", F.array_join(F.col("hist").cast("array<string>"), ","))


@register(
    "q_frame_sample",
    sql="""
    SELECT doc_id, CAST(u.k AS BIGINT) AS frame_idx,
           CAST(1 AS BIGINT) AS frame_ok
    FROM (SELECT doc_id,
                 CAST(ceil(greatest(strlen(coalesce(text, '')), 1) / 256.0)
                      AS INT) AS nf
          FROM documents WHERE doc_id < 50),
         unnest(generate_series(0, nf - 1)) AS u(k)
    """,
    doc="Frame-sampling one-to-many expansion over REAL video: each doc's "
    "text becomes a mono Y4M clip (deterministic 16x16 luma frames), the "
    "kernel parses the container, samples frames, and re-encodes PNG — "
    "the full decode path, not the byte-slicer fake. Declared through "
    "its banded-flag audit (operators/multimodal.py::frame_sample_audit, "
    "the ann_audit promotion pattern): the oracle recomputes the exact "
    "frame GRID (ceil(utf8_bytes/256) frames per doc — the one-to-many "
    "expansion shape) and pins frame_ok=1 per frame, where frame_ok "
    "verifies decoded PNG pixels equal the text bytes that built the "
    "frame — one flag covering encode → Y4M → parse → sample → PNG → "
    "decode. Raw per-frame md5s stay pixel-pinned in pytest.",
    tags=("multimodal",),
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import frame_sample_audit

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return frame_sample_audit(docs)


@register(
    "q_embed_vectors",
    sql="""
    SELECT doc_id, CAST(64 AS BIGINT) AS dim,
           CAST(1 AS BIGINT) AS unit_norm_ok
    FROM documents
    """,
    doc="ML4 embedding inference surface: Arrow pandas-UDF hash-"
    "projection encoder over documents (deterministic; 64-d unit "
    "vectors), declared through a banded-flag audit of the UDF "
    "PLUMBING (the encoder's float values have no SQL twin, but the "
    "contract does): the oracle pins one output row per input doc "
    "(totality through the Arrow batch path), dim = 64 exactly, and a "
    "unit-norm flag (|v| within 1e-6 of 1, checked JVM-side with "
    "aggregate/sqrt) fixed to 1. Encoder determinism and class "
    "separation stay pinned in tests/test_ml.py.",
    tags=("ml",),
)
def q_embed_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.embeddings import embed_texts

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = embed_texts(docs)
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    # norm is exactly 0 for a token-free text (the encoder's `if n > 0`
    # guard leaves the zero vector) and ~1 otherwise; accepting both
    # keeps the oracle's pinned 1 correct on ANY corpus slice instead
    # of spuriously failing the gate on the first alnum-free document.
    # The sharper invariant — zero only when the text has no tokens —
    # is Python-tokenizer-exact and pinned in tests/test_ml.py, where
    # both sides share the tokenizer.
    return out.select(
        "doc_id",
        F.size("embedding").cast("long").alias("dim"),
        ((F.abs(norm - 1.0) < 1e-6) | (norm == 0.0))
        .cast("long")
        .alias("unit_norm_ok"),
    )


from .mining import _TOKS_SQL as _MINING_TOKS_SQL


@register(
    "q_classifier_predict",
    sql=f"""
    WITH toks AS (SELECT {_MINING_TOKS_SQL} AS toks FROM documents),
    grams AS (
        SELECT unnest(toks) AS term FROM toks
        UNION ALL
        SELECT unnest([toks[i] || ' ' || toks[i + 1]
                       FOR i IN generate_series(1, len(toks) - 1)]) AS term
        FROM toks
    ),
    top20 AS (SELECT term, count(*) AS freq FROM grams GROUP BY term
              ORDER BY freq DESC, term LIMIT 20)
    SELECT term, CAST(1 AS BIGINT) AS label_valid FROM top20
    """,
    doc="ML1/ML2 surface: MLlib TF-IDF + logistic-regression pipeline "
    "trained on the engine's labeled pairs, predicting over mined "
    "document terms — declared through a banded-flag audit (the "
    "fitted LR's label choice has no SQL ground truth, but the "
    "inference CONTRACT does): the oracle recomputes the exact top-20 "
    "mined term set (so the hash pins which terms were scored and "
    "that each got exactly one prediction) and pins label_valid = 1, "
    "where validity means the predicted class is one of the fitted "
    "StringIndexer's labels (decode totality through the whole "
    "tokenize→TF-IDF→LR→IndexToString pipeline). Prediction QUALITY "
    "(class separation on held-out pairs) stays pinned in "
    "tests/test_ml.py.",
    tags=("ml",),
)
def q_classifier_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.classifier import train_classifier, classify_terms
    from ..operators.mining import top_terms

    docs = load_table(spark, sf_dir, "documents")
    terms = top_terms(docs, ngram_range=(1, 2), k=20).select("term")
    model = train_classifier(spark)
    labels = set(model.stages[-1].getLabels())
    out = classify_terms(model, terms)
    return out.select(
        "term",
        F.col("predicted_class")
        .isin(*labels)
        .cast("long")
        .alias("label_valid"),
    )


@register(
    "q_taxonomy_topics",
    sql="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(5 AS BIGINT)        AS n_topics,
           CAST(0 AS BIGINT)        AS n_unassigned,
           CAST(1 AS BIGINT)        AS sizes_in_band,
           CAST(1 AS BIGINT)        AS cohesion_ok,
           CAST(1 AS BIGINT)        AS kw_ok
    FROM documents
    """,
    doc="ML5/ML6 surface under the HASH gate: seeded-KMeans taxonomy "
    "audited via banded flags (exact doc count, pinned cluster count, "
    "assignment totality, per-cluster size bounds, WSS<TSS cohesion "
    "margin, exact-5-distinct-keywords per topic) — the "
    "q_kll_quantiles/q_approx_count_distinct promotion pattern applied "
    "to the last no-oracle §2 row (VERDICT r5 Next #2; reference "
    "scrappy.py:496-505). Per-doc assignments + keyword arrays stay "
    "pinned in test_ml.py.",
    tags=("ml",),
)
def q_taxonomy_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.taxonomy import taxonomy_audit

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return taxonomy_audit(docs, k=5, seed=42)


@register(
    "q_footer_stats",
    sql="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           min(l_quantity) AS min_l_quantity,
           max(l_quantity) AS max_l_quantity,
           min(l_orderkey) AS min_l_orderkey,
           max(l_orderkey) AS max_l_orderkey
    FROM lineitem
    """,
    doc="Whole-table count/min/max answered from parquet FOOTER "
    "metadata (DSv2 aggregate pushdown — PushedAggregation in the "
    "scan, no row-group read). The 100 TB stats query that costs "
    "seconds instead of a full scan; oracle proves footer stats equal "
    "scan-derived truth.",
    tags=("stats", "pushdown", "scan"),
)
def q_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import footer_stats

    return footer_stats(
        spark, f"{sf_dir}/lineitem.parquet", ["l_quantity", "l_orderkey"]
    )


from ..operators.curation import sample_threshold

# ONE scrub-oracle generator: q_pii_scrub and q_config_pipeline must
# check the same semantics, so both import llmdata3's fragment.
from .llmdata3 import _scrub_sql as _scrub_sql_twin


@register(
    "q_config_pipeline",
    sql=(
        lambda thr, scrub: f"""
    WITH s AS (SELECT * FROM documents
               WHERE substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 4)
                     < '{thr}'),
    p AS (SELECT doc_id, {scrub} AS text FROM s)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS text_len,
           CASE WHEN substring(md5(concat('split', '|', CAST(doc_id AS VARCHAR))), 1, 4)
                     < 'cccc' THEN 'train'
                WHEN substring(md5(concat('split', '|', CAST(doc_id AS VARCHAR))), 1, 4)
                     < 'e666' THEN 'val'
                ELSE 'test' END AS split
    FROM p
    """
    )(sample_threshold(0.5), _scrub_sql_twin("text")),
    doc="Config-driven pipeline surface: the JSON spec "
    "[hash_sample(0.5), scrub_pii, assign_splits] compiled by "
    "pipeline_config.compile_pipeline onto the same operators the "
    "stage queries check individually — the oracle stitches the same "
    "shared fragments, value-hash-gating the declarative composition "
    "path itself.",
    tags=("pipeline", "curation", "config"),
)
def q_config_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline_config import run_pipeline

    docs = load_table(spark, sf_dir, "documents")
    spec = {
        "stages": [
            {"op": "hash_sample", "rate": 0.5},
            {"op": "scrub_pii"},
            {"op": "assign_splits"},
        ]
    }
    out = run_pipeline(docs, spec)
    return out.select(
        "doc_id", F.length("text").cast("bigint").alias("text_len"), "split"
    )


@register(
    "q_skew_report",
    sql="""
    WITH c AS (SELECT CAST(l_orderkey AS VARCHAR) AS key,
                      CAST(count(*) AS BIGINT) AS cnt
               FROM lineitem GROUP BY 1),
    t AS (SELECT sum(cnt) AS _t FROM c)
    SELECT key, cnt, CAST(cnt * 10000 // _t AS BIGINT) AS share_bp
    FROM c, t ORDER BY cnt DESC, key LIMIT 10
    """,
    doc="Shuffle-key skew pre-flight: top-10 heaviest l_orderkey values "
    "with integer-basis-point share — the query you run BEFORE keying "
    "a 100 TB join, instead of discovering the hot key as a straggler. "
    "Partial-agg groupBy + broadcast total + TakeOrdered.",
    tags=("stats", "skew", "diagnostics"),
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import skew_report

    return skew_report(load_table(spark, sf_dir, "lineitem"), "l_orderkey")


@register(
    "q_skew_salted_join",
    sql="""
    SELECT s.s_nationkey,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_quantity), 2) AS sum_qty
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey
    """,
    doc="Salted skew join result-equivalence: the salt spreads each hot "
    "key over n_salts partitions (big side gains a random salt, small "
    "side replicates once per salt) but the OUTPUT is provably the "
    "plain join — the salt pairs each big row with exactly one replica "
    "— so the oracle is the unsalted join. Upgrades salted_join from "
    "tests-only to the hash gate.",
    tags=("join", "skew"),
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    joined = salted_join(li, supp, on="suppkey", n_salts=8)
    return joined.groupBy("s_nationkey").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )
