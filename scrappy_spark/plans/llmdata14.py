"""LLM-corpus operators, round-9 wave: IVF-PQ composed ANN (the
100 TB vector-index layout), l-diversity release review, compaction
execution through the snapshot table, and the mixture-execution
capstone.

The reference has no equivalents (its similarity surface stops at
substring filters); these deepen the similarity-search and
release-review extension families per VERDICT r8's next-round list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .registry import register


# ---------------------------------------------------------------------------
# IVF-PQ composed ANN (operators/pq.py::ivf_pq_search)
# ---------------------------------------------------------------------------


@register(
    "q_ivf_pq_ann_topk",
    sql="""
    SELECT vec_id AS query_id,
           CAST(1 AS BIGINT) AS n_results,
           CAST(1 AS BIGINT) AS self_found,
           CAST(1 AS BIGINT) AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
    doc="IVF-PQ composed ANN (FAISS IVFPQ layout, Jegou et al. 2011 "
    "SV): label centroids as the coarse quantizer, per-vector PQ codes "
    "of the RESIDUAL (vector - cell centroid) from a shared codebook, "
    "2-probe asymmetric-distance search that stores ~m bytes/vector "
    "and reads no embeddings -- the actual 100 TB vector-index shape "
    "(IVF alone still stores raw vectors; PQ alone scans every code). "
    "Declared through the banded-flag audit (operators/ann_audit.py): "
    "the oracle pins full-k results, self-retrieval, and recall >= 1 "
    "of the true top-10 per query (measured min 2 at both sf0.001 and "
    "sf0.01 -- 2x floor margin; the fixture's hash-projection vectors "
    "are PQ's worst case AND slice true neighbors across cells, the "
    "compounded approximation). Raw top-k and the residual-vs-raw "
    "quantization comparison (full-probe IVF-PQ beats plain PQ at "
    "identical geometry) stay pinned in tests/test_llm_ops5.py.",
    tags=("llm", "similarity", "approx"),
)
def q_ivf_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pq as PQ
    from ..operators import similarity as SIM
    from ..operators.ann_audit import topk_recall_audit

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
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann = PQ.ivf_pq_search(e, queries, cents, k=10, n_probe=2)
    exact = SIM.cosine_topk(e, queries, k=10)
    return topk_recall_audit(ann, exact, k=10, min_hits=1)


# ---------------------------------------------------------------------------
# Compaction execution through the snapshot table
# ---------------------------------------------------------------------------

_CE_TARGET_ROWS = 150  # rows per compacted target file


@register(
    "q_compaction_execute",
    sql=f"""
    WITH lc AS (SELECT lang, CAST(count(*) AS BIGINT) AS rows
                FROM documents GROUP BY lang),
    w AS (SELECT lang, rows,
                 CAST(coalesce(sum(rows) OVER (ORDER BY lang ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS before
          FROM lc),
    b AS (SELECT CAST(before // {_CE_TARGET_ROWS} AS BIGINT) AS target_file,
                 CAST(count(*) AS BIGINT) AS n_input_files,
                 CAST(sum(rows) AS BIGINT) AS n_rows
          FROM w GROUP BY 1)
    SELECT target_file, n_input_files, n_rows,
           CAST(n_input_files = 1 AS BIGINT) AS reused,
           CAST(1 AS BIGINT) AS content_ok,
           CAST(1 AS BIGINT) AS old_head_ok
    FROM b
    """,
    doc="Compaction EXECUTION (VERDICT r8 #4): documents land in a "
    "snapshot table as one append per language (5 small files, the "
    "append-log small-file shape), then operators/layout.py::"
    "compact_snapshot packs them in manifest order at a "
    f"{_CE_TARGET_ROWS}-row target and publishes the rewrite as ONE "
    "atomic commit — multi-file bins rewritten as one fresh file each, "
    "single-file bins REUSED (referenced unchanged, untouched regions "
    "never rewritten), time travel intact across the compaction. "
    "Output: per target bin, its input-file count, rows, and reuse "
    "flag (the oracle recomputes the greedy running-sum bins from "
    "per-lang counts — both supply shapes hash: en over-fills a bin "
    "alone, small langs pack), plus audit flags pinned to 1: "
    "content_ok (row-level pre/post identity via full-outer hash "
    "compare, per-row verdict coalesced before the min) and "
    "old_head_ok (the pre-compaction version still reads back the "
    "full corpus).",
    tags=("layout", "storage", "snapshot", "ops"),
)
def q_compaction_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from ..operators.layout import compact_snapshot, snapshot_file_stats
    from ..operators.layout import compaction_plan
    from ..sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents")
    langs = sorted(
        r["lang"] for r in docs.select("lang").distinct().collect()
    )  # bounded: language cardinality
    tag = hashlib.md5(
        f"{sf_dir}|{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"compact_exec_{tag}")
    table = SnapshotTable(spark, os.path.join(root, "table"))
    head = table.current_version()
    for i, lg in enumerate(langs):
        if head is None or head < i:
            table.commit(
                docs.filter(F.col("lang") == lg).coalesce(1),
                message=f"ingest {lg}",
                append=True,
            )
            head = i
    if table.current_version() == len(langs) - 1:
        compact_snapshot(
            table, _CE_TARGET_ROWS, unit="rows", message="compact"
        )
    v_after = table.current_version()
    v_before = v_after - 1

    # re-derive the plan from the BEFORE manifest (pure metadata,
    # deterministic) so reruns in the same session need no state
    stats = snapshot_file_stats(table, version=v_before)
    plan = compaction_plan(
        stats.select(
            F.lit("t").alias("__tbl"), "idx", "path",
            F.col("rows").alias("__u"),
        ),
        bytes_col="__u",
        partition_cols=["__tbl"],
        order_cols=["idx"],
        target_bytes=_CE_TARGET_ROWS,
        tiebreak_col="path",
    )
    bins = plan.groupBy("target_file").agg(
        F.count("*").cast("long").alias("n_input_files"),
        F.sum("__u").cast("long").alias("n_rows"),
    )

    cols = sorted(docs.columns)
    old = table.read(v_before).select(
        "doc_id", F.xxhash64(F.to_json(F.struct(*cols))).alias("__ha")
    )
    new = table.read(v_after).select(
        "doc_id", F.xxhash64(F.to_json(F.struct(*cols))).alias("__hb")
    )
    content = (
        old.join(new, "doc_id", "full_outer")
        .select(
            F.coalesce(
                (F.col("__ha") == F.col("__hb")).cast("long"), F.lit(0)
            ).alias("__ok")
        )
        .agg(F.min("__ok").alias("content_ok"))
    )
    oc = table.read(v_before).agg(F.count("*").alias("__oc"))
    dc = docs.agg(F.count("*").alias("__dc"))
    flags = (
        content.crossJoin(F.broadcast(oc))
        .crossJoin(F.broadcast(dc))
        .select(
            "content_ok",
            (F.col("__oc") == F.col("__dc")).cast("long").alias("old_head_ok"),
        )
    )
    return bins.crossJoin(F.broadcast(flags)).select(
        "target_file",
        "n_input_files",
        "n_rows",
        (F.col("n_input_files") == 1).cast("long").alias("reused"),
        "content_ok",
        "old_head_ok",
    )


# ---------------------------------------------------------------------------
# Mixture-execution capstone: plan -> execute -> temperature -> shards
# ---------------------------------------------------------------------------

_MX_BUDGET = 100_000
_MX_WEIGHTS = {"en": 0.4, "de": 0.35, "es": 0.25}
_MX_ALPHA = 0.5
_MX_FRAC = 0.5
_MX_SHARD = 64


def _mix_exec_ctes(weights: dict[str, float], budget: int) -> str:
    """Shared w0/a/plan0/px/mix CTE chain (plan -> branch split ->
    executed (doc, epoch) occurrences) parameterized by the weight
    table — used by the execute capstone and the audit so both gates
    pin ONE sampling semantics."""
    values = ", ".join(
        f"('{d}', {int(round(w * 1_000_000))})" for d, w in weights.items()
    )
    tgt = f"(target_weight_ppm::HUGEINT * {budget} // 1000000)"
    return f"""w0 AS (SELECT * FROM (VALUES {values})
                    AS t(lang, target_weight_ppm)),
    a AS (SELECT lang, CAST(coalesce(sum(n_chars), 0) AS BIGINT)
                 AS available_tokens
          FROM documents GROUP BY lang),
    plan0 AS (SELECT w0.lang,
                 CAST({tgt} AS BIGINT) AS target_tokens,
                 CAST(coalesce(a.available_tokens, 0) AS BIGINT)
                     AS available_tokens,
                 CAST(CASE WHEN coalesce(a.available_tokens, 0) = 0 THEN 0
                      WHEN {tgt} >= a.available_tokens THEN 1000000
                      ELSE {tgt} * 1000000 // a.available_tokens
                      END AS BIGINT) AS sample_rate_ppm,
                 CAST(CASE WHEN coalesce(a.available_tokens, 0) = 0 THEN 0
                      ELSE {tgt} * 1000 // a.available_tokens
                      END AS BIGINT) AS epochs_milli,
                 CAST({tgt} > coalesce(a.available_tokens, 0) AS BIGINT)
                     AS under_supplied
          FROM w0 LEFT JOIN a USING (lang)),
    px AS (SELECT lang,
                  CAST(CASE WHEN under_supplied = 1
                       THEN epochs_milli // 1000
                       ELSE 0 END AS BIGINT) AS fullep,
                  CAST(CASE WHEN under_supplied = 1
                       THEN (epochs_milli % 1000) * 1000
                       ELSE sample_rate_ppm END AS BIGINT) AS part_ppm
           FROM plan0),
    mix AS (SELECT d.doc_id, d.lang, d.n_chars, CAST(u.e AS BIGINT) AS epoch
            FROM documents d JOIN px USING (lang),
                 unnest(generate_series(0, px.fullep)) AS u(e)
            WHERE u.e < px.fullep
               OR CAST(('0x' || substr(md5('mixex|' ||
                        CAST(u.e AS VARCHAR) || '|' ||
                        CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  < part_ppm * 4294967296 // 1000000)"""


def _mixture_execute_sql() -> str:
    return f"""
    WITH {_mix_exec_ctes(_MX_WEIGHTS, _MX_BUDGET)},
    c AS (SELECT lang, CAST(count(*) AS BIGINT) AS ng FROM mix GROUP BY lang),
    t AS (SELECT CAST(sum(ng) AS BIGINT) AS n FROM c),
    w AS (SELECT lang, ng, n,
                 CAST(round(pow(CAST(ng AS DOUBLE) / n, {_MX_ALPHA})
                      * 1000000) AS BIGINT) AS w
          FROM c CROSS JOIN t),
    s AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM w),
    thr AS (SELECT lang,
                   CAST(floor(least(1.0,
                        CAST(round({_MX_FRAC} * n) * w AS DOUBLE)
                        / CAST(sw * ng AS DOUBLE)) * 4294967296.0)
                        AS BIGINT) AS thr
            FROM w CROSS JOIN s),
    kept AS (SELECT m.doc_id, m.lang, m.n_chars, m.epoch
             FROM mix m JOIN thr USING (lang)
             WHERE CAST(('0x' || substr(md5('temp|' ||
                      CAST(m.doc_id AS VARCHAR) || ':' ||
                      CAST(m.epoch AS VARCHAR)), 1, 8)) AS BIGINT)
                   < thr.thr)
    SELECT doc_id, lang, n_chars, epoch,
           CAST(row_number() OVER (ORDER BY n_chars, doc_id, epoch) - 1
                AS BIGINT) AS rank,
           CAST((row_number() OVER (ORDER BY n_chars, doc_id, epoch) - 1)
                // {_MX_SHARD} AS BIGINT) AS shard_id
    FROM kept
    """


@register(
    "q_mixture_execute",
    sql=_mixture_execute_sql(),
    doc="Mixture-EXECUTION capstone (VERDICT r8 #5): the round-8 "
    "token-budget planner composed with the executors it plans for, "
    "end-to-end. mixture_plan (en 0.4 / de 0.35 / es 0.25 of a 100k-"
    "token budget) -> mixture_execute: en OVER-supplies and is "
    "rate-sampled (the mix_corpora branch, exact planner ppm), de/es "
    "UNDER-supply and get one full epoch plus a partial-rate second "
    "(epoch-repeat branch; both sub-branches live on the fixture), "
    "fr/zh unweighted and excluded -> temperature_sample smooths the "
    "mixed corpus's language shares (alpha 0.5, target half) over "
    "(doc, epoch) occurrences -> curriculum_shards cuts the survivors "
    "into 64-row shards by exact global (n_chars, doc, epoch) rank "
    "via the two-phase distributed ranking. Every stage's sampling is "
    "the deterministic md5-uniform rule, so the entire release path "
    "hash-matches the oracle's direct recomputation. Engine path "
    "operators/curation.py::mixture_execute + temperature_sample, "
    "operators/ranking.py::curriculum_shards.",
    tags=("llm", "curation", "mixing", "capstone"),
)
def q_mixture_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import mixture_execute, temperature_sample
    from ..operators.ranking import curriculum_shards

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    mixed = mixture_execute(
        docs, _MX_WEIGHTS, _MX_BUDGET, domain_col="lang",
        tokens_col="n_chars",
    ).withColumn(
        "__mix_key",
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("epoch").cast("string")
        ),
    )
    kept = temperature_sample(
        mixed, alpha=_MX_ALPHA, target_frac=_MX_FRAC, group_col="lang",
        id_col="__mix_key",
    ).drop("__mix_key")
    return curriculum_shards(
        kept, ["n_chars", "doc_id", "epoch"], shard_size=_MX_SHARD
    )


# ---------------------------------------------------------------------------
# l-diversity + generalization advice (release-review privacy)
# ---------------------------------------------------------------------------

_LD_K = 10
_LD_L = 3
_LD_BUCKET = 50  # n_chars bucket width used as the sensitive class


@register(
    "q_l_diversity",
    sql=f"""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT n_chars // {_LD_BUCKET}) AS BIGINT)
               AS n_sensitive,
           CAST(count(*) < {_LD_K} AS BIGINT) AS k_at_risk,
           CAST(count(DISTINCT n_chars // {_LD_BUCKET}) < {_LD_L} AS BIGINT)
               AS l_at_risk
    FROM documents GROUP BY lang, source
    """,
    doc="l-diversity audit (Machanavajjhala et al. 2007), the "
    "sensitive-attribute companion to q_k_anonymity: per (lang, "
    "source) quasi-identifier group, its size AND the count of "
    f"distinct sensitive classes (the n_chars div {_LD_BUCKET} length "
    "bucket), with both flags — k_at_risk (small group) and l_at_risk "
    "(homogeneous group: k-anonymous but every member shares one "
    "sensitive value, the homogeneity attack). Both flags exercise "
    "both branches on the fixture (14 clear / 53 k-only / 30 k+l "
    "groups at sf0.01; the big-but-homogeneous combination does not "
    "arise there — large fixture groups are length-diverse). One partial-agg groupBy at QI "
    "cardinality with per-group exact distinct counts. Engine path "
    "operators/profile.py::l_diversity_profile.",
    tags=("quality", "privacy", "profile"),
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import l_diversity_profile

    docs = load_table(spark, sf_dir, "documents")
    return l_diversity_profile(
        docs,
        ["lang", "source"],
        F.expr(f"n_chars div {_LD_BUCKET}"),
        k=_LD_K,
        l=_LD_L,
    )


@register(
    "q_generalization_advice",
    sql=f"""
    WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY source),
    b AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY lang)
    SELECT 'lang' AS generalize_col,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(coalesce(sum(CASE WHEN n < {_LD_K} THEN 1 END), 0)
                AS BIGINT) AS n_at_risk_groups,
           CAST(coalesce(sum(CASE WHEN n < {_LD_K} THEN n END), 0)
                AS BIGINT) AS at_risk_rows,
           CAST(min(n) AS BIGINT) AS min_group_size
    FROM a
    UNION ALL
    SELECT 'source', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN n < {_LD_K} THEN 1 END), 0)
                AS BIGINT),
           CAST(coalesce(sum(CASE WHEN n < {_LD_K} THEN n END), 0)
                AS BIGINT),
           CAST(min(n) AS BIGINT)
    FROM b
    """,
    doc="Generalization decision table for the k-anonymity review: for "
    "each quasi-identifier column of the (lang, source) QI set, the "
    "residual risk if THAT column were generalized away — remaining "
    "groups, groups still under k, rows still exposed, smallest "
    "surviving group. On the fixture, dropping source clears all risk "
    "(languages are big) while dropping lang does not — the table "
    "that turns 'suppress or generalize?' into a one-line decision. "
    "One reduced-QI partial agg per candidate, unioned. Engine path "
    "operators/profile.py::generalization_candidates.",
    tags=("quality", "privacy", "profile"),
)
def q_generalization_advice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import generalization_candidates

    docs = load_table(spark, sf_dir, "documents")
    return generalization_candidates(docs, ["lang", "source"], k=_LD_K)


# ---------------------------------------------------------------------------
# Learned language ID (ml/langid.py)
# ---------------------------------------------------------------------------


def _langid_sql() -> str:
    from ..ml.langid import LANGID_BUCKETS, LANGID_NS

    legs = "\n        UNION ALL\n".join(
        f"""        SELECT doc_id,
               CAST(('0x' || substr(md5(substr(lower(text),
                    CAST(u.q AS INT), {n})), 1, 8)) AS BIGINT)
                    % {LANGID_BUCKETS} AS bucket
        FROM documents,
             unnest(generate_series(1, length(text) - {n} + 1)) AS u(q)
        WHERE length(text) >= {n}"""
        for n in LANGID_NS
    )
    return f"""
    WITH g AS (
{legs}
    ),
    per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(bucket) AS BIGINT) AS bucket_checksum
            FROM g GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(per.n_grams, 0) AS n_grams,
           coalesce(per.bucket_checksum, 0) AS bucket_checksum,
           CAST(1 AS BIGINT) AS pred_in_set,
           CAST(1 AS BIGINT) AS margin_ok
    FROM documents d LEFT JOIN per USING (doc_id)
    """


@register(
    "q_lang_id_learned",
    sql=_langid_sql(),
    doc="Learned language ID (ml/langid.py): hashed char-{1,2}-gram "
    "multinomial Naive Bayes trained on the in-repo sentence corpus "
    "(bounded driver-side closed-form fit, the pq_train precedent), "
    "scored scan-side through BROADCAST integer micro log-prob weights "
    "— no UDF, BIGINT-exact sums, deterministic argmax. Declared "
    "through the plumbing-audit pattern (the learned weights have no "
    "SQL twin, the contract does): the oracle recomputes the EXACT "
    "hashed feature stream per document (gram count + bucket-id "
    "checksum — proves the md5-bucket feature expression bit-for-bit) "
    "and pins pred_in_set (prediction is a trained label, or 'und' "
    "exactly for gram-free docs) and margin_ok (integer top1-top2 "
    "margin >= 0) to 1. Model QUALITY (1.0 held-out accuracy vs 0.8 "
    "for the marker heuristic, which cannot see zh at all) is pinned "
    "in tests/test_llm_ops5.py.",
    tags=("llm", "textstats", "ml", "curation"),
)
def q_lang_id_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.langid import doc_features, lang_id_learned, train_lang_id

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    weights, intercepts = train_lang_id(spark)
    labels = {r["lang"] for r in intercepts.collect()}  # bounded: 5 rows
    pred = lang_id_learned(docs, weights, intercepts).drop("n_grams")
    sums = doc_features(docs).groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.sum(F.col("bucket") * F.col("cnt")).cast("long").alias(
            "bucket_checksum"
        ),
    )
    return (
        pred.join(sums, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("bucket_checksum", F.lit(0))
            .cast("long")
            .alias("bucket_checksum"),
            (
                F.col("pred_lang").isin(*labels)
                | ((F.col("pred_lang") == "und") & (F.col("n_grams").isNull()))
            )
            .cast("long")
            .alias("pred_in_set"),
            (F.col("margin_micro") >= 0).cast("long").alias("margin_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Mixture audit: executed mix vs plan (the release gate)
# ---------------------------------------------------------------------------

#: audit weights include 'code' — weighted but ABSENT from the corpus,
#: so the gate's failure branch is live (target > 0, achieved 0).
_MXA_WEIGHTS = {"en": 0.38, "de": 0.33, "es": 0.24, "code": 0.05}
_MXA_TOL_PPM = 100_000


def _mixture_audit_sql() -> str:
    return f"""
    WITH {_mix_exec_ctes(_MXA_WEIGHTS, _MX_BUDGET)},
    ach AS (SELECT lang, CAST(coalesce(sum(n_chars), 0) AS BIGINT)
                   AS achieved_tokens
            FROM mix GROUP BY lang)
    SELECT p.lang, p.target_tokens,
           CAST(coalesce(ach.achieved_tokens, 0) AS BIGINT)
               AS achieved_tokens,
           CAST(CASE WHEN p.target_tokens = 0 THEN
                  CASE WHEN coalesce(ach.achieved_tokens, 0) > 0
                       THEN 1000000 ELSE 0 END
                ELSE abs(coalesce(ach.achieved_tokens, 0)
                         - p.target_tokens)::HUGEINT
                     * 1000000 // p.target_tokens END AS BIGINT)
               AS deviation_ppm,
           CAST((CASE WHEN p.target_tokens = 0 THEN
                  CASE WHEN coalesce(ach.achieved_tokens, 0) > 0
                       THEN 1000000 ELSE 0 END
                ELSE abs(coalesce(ach.achieved_tokens, 0)
                         - p.target_tokens)::HUGEINT
                     * 1000000 // p.target_tokens END)
                <= {_MXA_TOL_PPM} AS BIGINT) AS within_tolerance
    FROM plan0 p LEFT JOIN ach USING (lang)
    """


@register(
    "q_mixture_audit",
    sql=_mixture_audit_sql(),
    doc="Mixture release gate: the executed mix audited against its "
    "own plan — per planned domain, achieved (doc, epoch) token mass, "
    "absolute deviation from target in exact integer ppm, and a "
    f"{_MXA_TOL_PPM // 10000}% tolerance flag. The md5-uniform "
    "sampling makes achieved mass deterministic, so the gate "
    "hash-matches; doc-granular quotas land within binomial noise of "
    "their targets (passing branch), while 'code' — weighted but "
    "ABSENT from the corpus — fails at 10^6 ppm (the branch that "
    "catches a mis-declared mix before a training run). DECIMAL/"
    "HUGEINT deviation products stay exact past BIGINT budgets (the "
    "mixture_plan overflow contract). Engine path "
    "operators/curation.py::mixture_audit over mixture_execute + "
    "mixture_plan.",
    tags=("llm", "curation", "mixing", "ops"),
)
def q_mixture_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import (
        mixture_audit,
        mixture_execute,
        mixture_plan,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    plan = mixture_plan(
        docs, _MXA_WEIGHTS, _MX_BUDGET, domain_col="lang",
        tokens_col="n_chars",
    ).filter(F.col("target_weight_ppm") > 0)
    mixed = mixture_execute(
        docs, _MXA_WEIGHTS, _MX_BUDGET, domain_col="lang",
        tokens_col="n_chars",
    )
    return mixture_audit(
        mixed, plan, domain_col="lang", tokens_col="n_chars",
        tol_ppm=_MXA_TOL_PPM,
    )


# ---------------------------------------------------------------------------
# Snapshot schema evolution
# ---------------------------------------------------------------------------

_SE_NEW_MAX_ID = 50       # appended slice: documents below this id
_SE_ID_OFFSET = 1_000_000  # re-keyed so appended rows are NEW rows


@register(
    "q_snapshot_schema_evolution",
    sql=f"""
    SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source
    FROM documents
    UNION ALL
    SELECT doc_id + {_SE_ID_OFFSET} AS doc_id, lang, source
    FROM documents WHERE doc_id < {_SE_NEW_MAX_ID}
    """,
    doc="Snapshot-table schema evolution: v0 lands documents as "
    "(doc_id, lang); a later append WIDENS the table with a source "
    "column (re-keyed slice, so rows are new). Every manifest records "
    "its version's unified all-nullable schema, and read() applies the "
    "RECORDED schema — v0's files read NULL for the added column with "
    "no per-read footer merge, time travel shows each version with the "
    "schema it had, and a same-name type conflict raises instead of "
    "coercing (pytest). The oracle recomputes the expected union "
    "directly (old rows NULL-backfilled, appended rows valued) — the "
    "hash proves the recorded-schema read end-to-end. Engine path "
    "sources/snapshots.py::commit/_unify_schemas/read.",
    tags=("storage", "snapshot", "schema"),
)
def q_snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from ..sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents")
    tag = hashlib.md5(
        f"{sf_dir}|{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"schema_evo_{tag}")
    table = SnapshotTable(spark, os.path.join(root, "table"))
    head = table.current_version()
    if head is None:
        table.commit(docs.select("doc_id", "lang").coalesce(1))
        head = 0
    if head == 0:
        widened = (
            docs.filter(F.col("doc_id") < _SE_NEW_MAX_ID)
            .select(
                (F.col("doc_id") + _SE_ID_OFFSET).alias("doc_id"),
                "lang",
                "source",
            )
            .coalesce(1)
        )
        table.commit(widened, append=True)
    return table.read(1).select("doc_id", "lang", "source")
