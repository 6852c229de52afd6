"""LLM-corpus operators, round-10 wave: stored-artifact lifecycles
(the train-once/serve-many shape VERDICT r9 asked for — persisted
IVF-PQ vector index and lang-id model), takedown/deletion for the
three stored index families, Iceberg-style column-identity schema
evolution (rename/drop), and the privacy release gate.

The reference has no equivalents (its store is one CSV it rewrites
per merge, scrappy.py:350); these close the production loop on the
round-9 extension families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .registry import register


def _tmp_root(spark: SparkSession, sf_dir: str, tag: str) -> str:
    """Session-unique scratch dir (the schema_evolution pattern):
    keyed by sf_dir + applicationId so driver reruns inside one
    session resume idempotently and a fresh session starts clean."""
    import hashlib
    import os
    import tempfile

    h = hashlib.md5(
        f"{tag}|{sf_dir}|{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"{tag}_{h}")


# ---------------------------------------------------------------------------
# Column-identity schema evolution: rename / drop / re-add
# ---------------------------------------------------------------------------


@register(
    "q_snapshot_schema_rename",
    sql="""
    WITH v0 AS (
        SELECT 'v0' AS snap, doc_id, lang AS language,
               CAST(NULL AS VARCHAR) AS source,
               CAST(n_chars AS BIGINT) AS n_chars,
               'doc_id,lang,n_chars' AS schema_sig
        FROM documents WHERE doc_id < 300),
    v4 AS (
        SELECT 'v4' AS snap, doc_id, lang AS language,
               CASE WHEN doc_id >= 300 THEN source END AS source,
               CAST(CASE WHEN doc_id >= 400 THEN n_chars END AS BIGINT)
                   AS n_chars,
               'doc_id,language,source,n_chars' AS schema_sig
        FROM documents WHERE doc_id < 450)
    SELECT snap, doc_id, language,
           coalesce(source, '~') AS source,
           CAST(coalesce(n_chars, -1) AS BIGINT) AS n_chars,
           schema_sig
    FROM (SELECT * FROM v0 UNION ALL SELECT * FROM v4)
    """,
    doc="Column-identity schema evolution (VERDICT r9 #5, the Iceberg "
    "second notch): v0 lands (doc_id, lang, n_chars); v1 RENAMES lang "
    "-> language (metadata-only — same files, column keeps its id); "
    "v2 appends rows under the new name plus a fresh source column; "
    "v3 DROPS n_chars; v4 re-adds n_chars via append — the re-added "
    "name gets a FRESH id, so v0's old n_chars values are NOT "
    "resurrected (old files read NULL under the new id). Output reads "
    "v0 (pre-rename names, proven by the schema_sig column built from "
    "the ACTUAL read's df.columns) and v4 (post-everything), row "
    "grain; the oracle reconstructs both directly from documents. "
    "Engine path sources/snapshots.py::rename_column/drop_column/"
    "_read_mapped (files matched to columns BY ID through the "
    "per-file write-schema registry).",
    tags=("storage", "snapshot", "schema"),
)
def q_snapshot_schema_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents")
    root = _tmp_root(spark, sf_dir, "schema_rename")
    table = SnapshotTable(spark, os.path.join(root, "table"))

    head = table.current_version()
    if head is None:
        table.commit(
            docs.filter(F.col("doc_id") < 300)
            .select("doc_id", "lang", "n_chars")
            .coalesce(1)
        )
        head = 0
    if head == 0:
        table.rename_column("lang", "language")
        head = 1
    if head == 1:
        table.commit(
            docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
            .select("doc_id", F.col("lang").alias("language"), "source")
            .coalesce(1),
            append=True,
        )
        head = 2
    if head == 2:
        table.drop_column("n_chars")
        head = 3
    if head == 3:
        table.commit(
            docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 450))
            .select(
                "doc_id", F.col("lang").alias("language"), "source", "n_chars"
            )
            .coalesce(1),
            append=True,
        )

    v0 = table.read(0)
    v4 = table.read(4)
    # schema_sig comes from the ACTUAL reads — wrong per-version names
    # would fail the value hash, not just a pytest assert
    part0 = v0.select(
        F.lit("v0").alias("snap"),
        "doc_id",
        F.col("lang").alias("language"),
        F.lit("~").alias("source"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.lit(",".join(v0.columns)).alias("schema_sig"),
    )
    part4 = v4.select(
        F.lit("v4").alias("snap"),
        "doc_id",
        "language",
        F.coalesce("source", F.lit("~")).alias("source"),
        F.coalesce(F.col("n_chars").cast("long"), F.lit(-1)).alias("n_chars"),
        F.lit(",".join(v4.columns)).alias("schema_sig"),
    )
    return part0.unionByName(part4)


# ---------------------------------------------------------------------------
# Stored IVF-PQ index: search from persisted artifacts (no in-query train)
# ---------------------------------------------------------------------------


@register(
    "q_ivf_pq_search_stored",
    sql="""
    SELECT vec_id AS query_id,
           CAST(1 AS BIGINT) AS n_results,
           CAST(1 AS BIGINT) AS self_found,
           CAST(1 AS BIGINT) AS recall_ok,
           CAST(1 AS BIGINT) AS stored_eq_fresh
    FROM embeddings WHERE vec_id < 5
    """,
    doc="Stored IVF-PQ index lifecycle (VERDICT r9 #1 / r10 #1): the "
    "train-once/serve-many path. operators/ann_index.py::IvfPqIndex."
    "build persists cells / shared residual codebook / codes as "
    "snapshot tables (meta lands last, so a crash leaves no readable "
    "index); search then runs pure ADC over the STORED artifacts — no "
    "training, no corpus embeddings read. Declared through the same "
    "banded-flag recall audit as q_ivf_pq_ann_topk (full-k, "
    "self-retrieval, recall >= 1 of the true top-10; approx by "
    "design) PLUS the persistence identity promoted from "
    "tests/test_ann_index.py to the hash gate: stored_eq_fresh pins "
    "per query that the stored-artifact search returns EXACTLY the "
    "in-query ivf_pq_search rows — (vec_id, score) multiset equality "
    "via full-outer join with the per-row verdict coalesced before "
    "the min, scores BIGINT-snapped so the comparison is "
    "shuffle-order-proof. Build runs once per session at a "
    "deterministic temp path and is skipped on rerun; the fresh side "
    "re-derives the same model (pq_train is deterministic), so "
    "equality proves the round-trip loses nothing. Append/delete/"
    "vacuum equivalences stay pinned in tests/test_ann_index.py.",
    tags=("llm", "similarity", "approx", "storage"),
)
def q_ivf_pq_search_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators import pq as PQ
    from ..operators import similarity as SIM
    from ..operators.ann_audit import topk_recall_audit
    from ..operators.ann_index import IvfPqIndex

    e = load_table(spark, sf_dir, "embeddings")
    cents = (
        SIM.label_centroids(e)
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))),
                lambda s: s.centroid_val,
            ).alias("centroid")
        )
    )
    path = os.path.join(_tmp_root(spark, sf_dir, "ivfpq_idx"), "idx")
    idx = IvfPqIndex(spark, path)
    if not idx.exists():
        idx = IvfPqIndex.build(spark, path, e, cents)

    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    stored = idx.search(queries, k=10, n_probe=2)
    fresh = PQ.ivf_pq_search(e, queries, cents, k=10, n_probe=2)
    exact = SIM.cosine_topk(e, queries, k=10)
    audit = topk_recall_audit(stored, exact, k=10, min_hits=1)

    a = stored.withColumn("__a", F.lit(1))
    b = fresh.withColumn("__b", F.lit(1))
    eq = (
        a.join(b, list(stored.columns), "full_outer")
        .select(
            "query_id",
            F.coalesce(
                (F.col("__a").isNotNull() & F.col("__b").isNotNull()),
                F.lit(False),
            )
            .cast("long")
            .alias("__ok"),
        )
        .groupBy("query_id")
        .agg(F.min("__ok").alias("stored_eq_fresh"))
    )
    return audit.join(eq, "query_id")


# ---------------------------------------------------------------------------
# Stored lang-id model: score from persisted artifacts (no in-query train)
# ---------------------------------------------------------------------------


def _langid_scored_sql() -> str:
    from .llmdata14 import _langid_sql

    return f"""
    SELECT doc_id, n_grams, bucket_checksum, pred_in_set, margin_ok,
           CAST(0 AS BIGINT) AS model_version,
           CAST(1 AS BIGINT) AS model_complete
    FROM ({_langid_sql()})
    """


@register(
    "q_lang_id_scored",
    sql=_langid_scored_sql(),
    doc="Stored lang-id model (VERDICT r9 #3 / r10 #3): the NB micro "
    "weight/intercept tables persisted once as snapshot artifacts "
    "(ml/langid.py::LangIdModel.train_and_store — meta lands last, a "
    "crash leaves no readable model), then SCORED from the stored "
    "broadcast tables with no in-query training — the serve-many "
    "path q_lang_id_learned's ~8s closed-form fit is rotated out of. "
    "Same plumbing-audit oracle as q_lang_id_learned (shared SQL "
    "CTEs: exact hashed feature stream per doc — gram count + bucket "
    "checksum — plus pred_in_set / margin_ok pinned 1), extended "
    "with the stored-artifact contract: model_version (the weights "
    "snapshot version every prediction is stamped with — the "
    "train-version audit column; 0 for the first fit) and "
    "model_complete (weights rows == |labels|*buckets and intercept "
    "rows == |labels| — the Laplace-dense artifact arrived whole), "
    "both oracle-pinned. Stored==fresh-retrain model equality and "
    "segment_scorer reuse are pinned in tests/test_llm_ops5.py.",
    tags=("llm", "textstats", "ml", "storage"),
)
def q_lang_id_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..ml.langid import LangIdModel

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = os.path.join(_tmp_root(spark, sf_dir, "langid_model"), "model")
    model = LangIdModel(spark, path)
    if not model.exists():
        model = LangIdModel.train_and_store(spark, path)

    meta = model.meta
    labels = set(meta["labels"])
    n_w = model.weights().count()  # bounded: |labels| * buckets rows
    n_i = model.intercepts().count()  # bounded: |labels| rows
    complete = int(
        n_w == len(labels) * meta["buckets"] and n_i == len(labels)
    )

    # Optimization r15 (VERDICT r14 #5): the audit checksum used to be
    # a SECOND doc_features pass joined back per doc — two full gram
    # stages per action. ``with_checksum`` folds Σ bucket·cnt into the
    # scoring aggregate itself (the wmap join is lossless: the stored
    # weights table is Laplace-dense, and model_complete pins exactly
    # that), so ONE gram pass produces every output column. 'und' rows
    # come only from the gram-free branch (n_grams/checksum 0 by
    # construction), which is precisely when the old left join produced
    # a null — pred_in_set is the same predicate without the null probe.
    pred = model.score(docs, with_checksum=True)
    return pred.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("bucket_checksum").cast("long").alias("bucket_checksum"),
        (F.col("pred_lang").isin(*labels) | (F.col("pred_lang") == "und"))
        .cast("long")
        .alias("pred_in_set"),
        (F.col("margin_micro") >= 0).cast("long").alias("margin_ok"),
        "model_version",
        F.lit(complete).cast("long").alias("model_complete"),
    )
