"""LLM-corpus operators, round-11 wave: takedown for the gram and
MinHash stored indexes (VERDICT r9 #4 / r10 #4 — the two legs the
round-10 ANN takedown left open) and the privacy release-gate
capstone (r9 #8 / r10 #6).

The reference has no equivalents (its store is one CSV it rewrites
per merge, scrappy.py:350); these close the production takedown loop
on every stored index family the engine serves incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.localrel import local_relation
from ..io import load_table
from .llmdata import _sig_sql_for
from .llmdata11 import (
    _XS_L,
    exact_substring_coverage_ctes,
    exact_substring_dup_cte,
    exact_substring_gram_ctes,
)
from .llmdata15 import _tmp_root
from .registry import register

# Synthetic takedown markers: pure literals (identical Python/SQL), so
# both deletion branches are pinned DETERMINISTICALLY, independent of
# fixture content — a gram whose only holder is deleted goes dead; a
# gram shared with a surviving doc stays live.
_TD_ALPHA = "TAKEDOWN ALPHA MARKER " * 3  # 66 chars >= L
_TD_BRAVO = "TAKEDOWN BRAVO MARKER " * 3

_GRAM_TD_SQL = f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        WHERE (doc_id < 300 AND doc_id NOT BETWEEN 100 AND 149)
           OR (doc_id >= 300 AND doc_id < 450)
        UNION ALL
        SELECT * FROM (VALUES
            (900001, repeat('TAKEDOWN ALPHA MARKER ', 3)),
            (900101, repeat('TAKEDOWN ALPHA MARKER ', 3)),
            (900102, repeat('TAKEDOWN BRAVO MARKER ', 3))
        ) AS s(doc_id, text)),
    d AS (SELECT doc_id, text, length(text) AS n FROM corpus),
    {exact_substring_gram_ctes(_XS_L)},
    {exact_substring_dup_cte()},
    {exact_substring_coverage_ctes(
        _XS_L,
        "(doc_id BETWEEN 300 AND 449 OR doc_id IN (900101, 900102))",
    )},
    liveg AS (SELECT CAST(count(DISTINCT gram) AS BIGINT) AS n_live_grams
              FROM g WHERE doc_id < 300 OR doc_id = 900001)
    SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_chars,
           coalesce(agg.n_dropped, 0) AS n_dropped,
           coalesce(agg.cleaned_text, '') AS cleaned_text,
           liveg.n_live_grams,
           CAST(1 AS BIGINT) AS grams_eq_rebuild
    FROM d LEFT JOIN agg USING (doc_id) CROSS JOIN liveg
    WHERE d.doc_id BETWEEN 300 AND 449 OR d.doc_id IN (900101, 900102)
"""


@register(
    "q_gram_index_takedown",
    sql=_GRAM_TD_SQL,
    doc="Takedown for the stored ExactSubstr gram index (VERDICT r9 "
    "#4 / r10 #4): operators/stored_indexes.py::GramIndex persists "
    "the index as an append-only SIGNED LEDGER of per-gram distinct-"
    "doc refcount deltas plus per-doc membership rows — delete(docs) "
    "is one O(request) append of the exact negation of what indexing "
    "added, so a gram shared with surviving documents stays live "
    "(refcount, not blind retraction) and every mutation is a single "
    "atomic snapshot commit (no multi-table crash seam). The query "
    "builds the index over base docs (<300, plus two synthetic "
    "marker docs sharing one text), takes down docs 100-149 plus one "
    "of the two marker holders and the sole BRAVO holder, then "
    "cleans a batch through the LIVE index: the batch ALPHA copy is "
    "still dropped (shared gram survived one holder's deletion), the "
    "batch BRAVO copy is kept (sole holder deleted) — both branches "
    "deterministic by construction. Oracle = the full ExactSubstr "
    "rerun over corpus-minus-deleted (the delete-vs-rebuild identity "
    "through the consumer), n_live_grams recomputed from ground "
    "truth (DuckDB count of distinct grams over the live base — a "
    "direct check of the ledger's refcount algebra), and "
    "grams_eq_rebuild pins the engine-side full-outer identity "
    "grams() == exact_substring_index(base minus deleted). Ledger "
    "scale shape: append-only, gram-keyed partial-agg groupBy to "
    "materialize the live set — the same key the dedup join shuffles "
    "on anyway.",
    tags=("llm", "dedup", "curation", "storage", "takedown"),
)
def q_gram_index_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.curation import exact_substring_index
    from ..operators.stored_indexes import GramIndex

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    synth_base = local_relation(
        spark,
        [(900001, _TD_ALPHA), (900002, _TD_ALPHA), (900003, _TD_BRAVO)],
        "doc_id long, text string",
    )
    base = docs.filter(F.col("doc_id") < 300).unionByName(synth_base)
    deleted = base.filter(
        F.col("doc_id").between(100, 149) | F.col("doc_id").isin(900002, 900003)
    )
    live_base = base.join(deleted.select("doc_id"), "doc_id", "left_anti")

    path = os.path.join(_tmp_root(spark, sf_dir, "gram_idx"), "idx")
    idx = GramIndex(spark, path)
    if not idx.exists():
        idx = GramIndex.build(spark, path, base, min_len=_XS_L)
    if idx.ledger.current_version() == 0:
        idx.delete(deleted)

    synth_batch = local_relation(
        spark,
        [(900101, _TD_ALPHA), (900102, _TD_BRAVO)],
        "doc_id long, text string",
    )
    batch = (
        docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 450))
        .unionByName(synth_batch)
    )
    cleaned = idx.clean_batch(batch)

    rebuilt = exact_substring_index(live_base, min_len=_XS_L)
    a = idx.grams().withColumn("__a", F.lit(1))
    b = rebuilt.withColumn("__b", F.lit(1))
    audit = (
        a.join(b, "gram", "full_outer")
        .agg(
            F.min(
                (F.col("__a").isNotNull() & F.col("__b").isNotNull()).cast(
                    "long"
                )
            ).alias("grams_eq_rebuild"),
            F.count("*").cast("long").alias("n_live_grams"),
        )
        # count("*") over the full-outer join counts the UNION of the
        # two gram sets; when eq holds it IS the live-gram count, and
        # when it does not the flag already fails the hash
        .select("n_live_grams", "grams_eq_rebuild")
    )
    return cleaned.crossJoin(F.broadcast(audit)).select(
        "doc_id",
        "n_chars",
        "n_dropped",
        "cleaned_text",
        "n_live_grams",
        "grams_eq_rebuild",
    )


_MH_TD_SQL = f"""
    WITH src AS (SELECT doc_id, text FROM documents
                 WHERE doc_id < 450 AND doc_id NOT BETWEEN 100 AND 149),
    {_sig_sql_for("src")}
    SELECT doc_id, CAST(seed AS BIGINT) AS seed, minhash,
           CAST(1 AS BIGINT) AS vacuum_eq_live
    FROM sig
"""


@register(
    "q_minhash_index_takedown",
    sql=_MH_TD_SQL,
    doc="Takedown for the stored MinHash signature index (VERDICT r9 "
    "#4 / r10 #4): operators/stored_indexes.py::MinHashIndex is the "
    "IvfPqIndex lifecycle applied to the near-dup signature table "
    "dedup_corpus_incremental serves batches from — build persists "
    "the corpus signatures (meta lands last), append signs a new "
    "batch with the STORED parameters (O(batch), id-clash guard, "
    "stale-tombstone heal), delete is a tombstone append (O(request), "
    "no rewrite; signatures() anti-joins the broadcast tombstone "
    "list), vacuum physically recommits the live rows. The query "
    "builds over docs <300, appends 300-449, tombstones 100-149, then "
    "returns the LIVE signature rows — the oracle recomputes the "
    "signatures of corpus-minus-deleted directly from text (the "
    "delete-vs-rebuild identity as ground truth, same shared "
    "MINHASH_ABC constants as q_minhash_signatures), so a tombstone "
    "that leaked into (or over-pruned) the live view fails the value "
    "hash. vacuum_eq_live additionally promotes the vacuum identity "
    "to the hash gate: the pre-vacuum live view and the post-vacuum "
    "stored table are compared full-outer per (doc_id, seed) row and "
    "the min verdict must be 1 — vacuum reclaims bytes without "
    "changing a single visible row.",
    tags=("llm", "dedup", "approx", "storage", "takedown"),
)
def q_minhash_index_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.stored_indexes import MinHashIndex

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = os.path.join(_tmp_root(spark, sf_dir, "mh_idx"), "idx")
    idx = MinHashIndex(spark, path)
    if not idx.exists():
        idx = MinHashIndex.build(spark, path, docs.filter(F.col("doc_id") < 300))
    if idx.sigs.current_version() == 0:
        idx.append(
            docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 450))
        )
    if (
        idx.sigs.current_version() == 1
        and idx.tombstones.current_version() == 0
    ):
        idx.delete(list(range(100, 150)))

    pre = idx.signatures()  # binds the pre-vacuum version's files
    idx.vacuum()
    post = idx.signatures()
    key = ["doc_id", "seed", "minhash"]
    eq = (
        pre.withColumn("__a", F.lit(1))
        .join(post.withColumn("__b", F.lit(1)), key, "full_outer")
        .agg(
            F.min(
                (F.col("__a").isNotNull() & F.col("__b").isNotNull()).cast(
                    "long"
                )
            ).alias("vacuum_eq_live")
        )
    )
    return post.crossJoin(F.broadcast(eq)).select(
        "doc_id",
        F.col("seed").cast("long").alias("seed"),
        "minhash",
        "vacuum_eq_live",
    )


# ---------------------------------------------------------------------------
# Privacy release gate (capstone over k-anonymity / l-diversity /
# generalization advice)
# ---------------------------------------------------------------------------

_PRG_K = 10
_PRG_L = 3
_PRG_BUCKET = 50


_PRG_SQL = f"""
    WITH ld AS (SELECT lang, source, count(*) AS gs,
                       count(DISTINCT n_chars // {_PRG_BUCKET}) AS ns
                FROM documents GROUP BY lang, source),
    ksum AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
                    CAST(coalesce(sum(CASE WHEN gs < {_PRG_K} THEN 1 END), 0)
                         AS BIGINT) AS ar,
                    CAST(coalesce(sum(CASE WHEN gs < {_PRG_K} THEN gs END), 0)
                         AS BIGINT) AS arr,
                    CAST(min(gs) AS BIGINT) AS mn
             FROM ld),
    lsum AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
                    CAST(coalesce(sum(CASE WHEN ns < {_PRG_L} THEN 1 END), 0)
                         AS BIGINT) AS ar,
                    CAST(coalesce(sum(CASE WHEN ns < {_PRG_L} THEN gs END), 0)
                         AS BIGINT) AS arr,
                    CAST(min(ns) AS BIGINT) AS mn
             FROM ld),
    esum AS (SELECT CAST(coalesce(sum(CASE WHEN gs < {_PRG_K}
                                        OR ns < {_PRG_L} THEN 1 END), 0)
                         AS BIGINT) AS ar,
                    CAST(coalesce(sum(CASE WHEN gs < {_PRG_K}
                                        OR ns < {_PRG_L} THEN gs END), 0)
                         AS BIGINT) AS arr
             FROM ld),
    ga AS (
        SELECT 'lang' AS gc, CAST(count(*) AS BIGINT) AS n_groups,
               CAST(coalesce(sum(CASE WHEN n < {_PRG_K} THEN 1 END), 0)
                    AS BIGINT) AS nar,
               CAST(coalesce(sum(CASE WHEN n < {_PRG_K} THEN n END), 0)
                    AS BIGINT) AS arr,
               CAST(min(n) AS BIGINT) AS mn
        FROM (SELECT source, count(*) AS n FROM documents GROUP BY source)
        UNION ALL
        SELECT 'source', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(CASE WHEN n < {_PRG_K} THEN 1 END), 0)
                    AS BIGINT),
               CAST(coalesce(sum(CASE WHEN n < {_PRG_K} THEN n END), 0)
                    AS BIGINT),
               CAST(min(n) AS BIGINT)
        FROM (SELECT lang, count(*) AS n FROM documents GROUP BY lang)),
    best AS (SELECT gc FROM ga WHERE nar = 0
             ORDER BY n_groups DESC, gc LIMIT 1)
    SELECT 'k_anonymity' AS gate_check, 'k={_PRG_K}' AS detail, n_groups,
           ar AS n_at_risk_groups, arr AS at_risk_rows, mn AS min_stat,
           CAST(ar = 0 AS BIGINT) AS passed
    FROM ksum
    UNION ALL
    SELECT 'l_diversity', 'l={_PRG_L}', n_groups, ar, arr, mn,
           CAST(ar = 0 AS BIGINT)
    FROM lsum
    UNION ALL
    SELECT 'generalize', gc, n_groups, nar, arr, mn,
           CAST(nar = 0 AS BIGINT)
    FROM ga
    UNION ALL
    SELECT 'release',
           CASE WHEN k.ar = 0 AND l.ar = 0 THEN 'release'
                WHEN (SELECT count(*) FROM best) > 0
                    THEN 'generalize:' || (SELECT gc FROM best)
                ELSE 'block' END,
           k.n_groups, e.ar, e.arr, k.mn,
           CAST(k.ar = 0 AND l.ar = 0 AS BIGINT)
    FROM ksum k, lsum l, esum e
"""


@register(
    "q_privacy_release_gate",
    sql=_PRG_SQL,
    doc="Privacy release-gate capstone (VERDICT r9 #8 / r10 #6): one "
    "verdict table composing the three release-review audits over the "
    "(lang, source) QI set with the n_chars-bucket sensitive class — "
    "a k-anonymity row (groups under k, rows exposed, smallest "
    "group), an l-diversity row (homogeneous groups; min_stat is the "
    "smallest distinct-sensitive count), one generalization row per "
    "QI column (residual risk if THAT column were coarsened away), "
    "and the release row whose detail IS the decision: 'release' when "
    "both audits pass, else 'generalize:<col>' naming the best "
    "zero-residue candidate (most groups retained, ties by name), "
    "else 'block'. On the fixture k and l both fail (at-risk branch) "
    "while dropping source clears all risk (passing branch), so the "
    "verdict lands on 'generalize:source' with both passed branches "
    "live. All legs are QI-cardinality partial aggs composed with "
    "broadcast one-row cross-joins — the verdict string is computed "
    "in-plan, nothing reaches the driver. Engine path "
    "operators/profile.py::privacy_release_gate.",
    tags=("quality", "privacy", "profile", "capstone"),
)
def q_privacy_release_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import privacy_release_gate

    docs = load_table(spark, sf_dir, "documents")
    return privacy_release_gate(
        docs,
        ["lang", "source"],
        F.expr(f"n_chars div {_PRG_BUCKET}"),
        k=_PRG_K,
        l=_PRG_L,
    )


# ---------------------------------------------------------------------------
# Manifest-level file pruning for snapshot reads (VERDICT r10 #7)
# ---------------------------------------------------------------------------


@register(
    "q_snapshot_pruned_read",
    sql="""
    SELECT 'mid' AS leg, doc_id, lang AS language,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(4 AS BIGINT) AS n_files_total,
           CAST(1 AS BIGINT) AS n_files_read
    FROM documents WHERE doc_id BETWEEN 120 AND 179
    UNION ALL
    SELECT 'span', doc_id, lang, CAST(n_chars AS BIGINT),
           CAST(4 AS BIGINT), CAST(2 AS BIGINT)
    FROM documents WHERE doc_id BETWEEN 250 AND 320
    """,
    doc="Manifest-level file pruning for SnapshotTable reads (VERDICT "
    "r10 #7 — at 100 TB a selective read that lists every file of a "
    "version scans the world; Iceberg's answer is per-file column "
    "stats in the manifest, and this is that move): "
    "commit(stats_cols=['doc_id']) records each data file's [min, "
    "max] from its parquet FOOTER (metadata reads, no row scanned), "
    "appends inherit the designation, and read(where=...) drops "
    "provably row-free files BEFORE any scan, then re-applies the "
    "real filter to survivors — stats are keyed by COLUMN ID so they "
    "survive renames (the query renames lang->language between write "
    "and read to pin exactly that). Four range-disjoint single-file "
    "appends; the 'mid' leg's predicate lands inside one file and "
    "the 'span' leg straddles two — n_files_read pins per leg, as "
    "oracle literals 1 and 2 of 4, that pruning ACTUALLY happened "
    "(a conservative keep-everything implementation would read 4 "
    "and fail the hash), while the row payload pins that it never "
    "drops a matching row. Engine path sources/snapshots.py::"
    "commit(stats_cols)/read(where)/prune_report.",
    tags=("storage", "snapshot", "pruning"),
)
def q_snapshot_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )
    root = _tmp_root(spark, sf_dir, "pruned_read")
    table = SnapshotTable(spark, os.path.join(root, "t"))

    head = table.current_version()
    bounds = [(0, 100), (100, 200), (200, 300), (300, 450)]
    for i, (lo, hi) in enumerate(bounds):
        if head is None or head < i:
            table.commit(
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ).coalesce(1),
                append=i > 0,
                stats_cols=["doc_id"] if i == 0 else None,
            )
            head = i
    if head == 3:
        table.rename_column("lang", "language")

    legs = [("mid", (120, 179), 1), ("span", (250, 320), 2)]
    out = None
    for leg, (lo, hi), want_read in legs:
        where = ("doc_id", "between", (lo, hi))
        rep = table.prune_report(where)
        if rep["n_read"] != want_read:  # loud-fail: pruning regressed
            raise ValueError(
                f"pruned read {leg!r}: expected {want_read} of "
                f"{rep['n_files']} files, got {rep['n_read']}"
            )
        part = table.read(where=where).select(
            F.lit(leg).alias("leg"),
            "doc_id",
            "language",
            "n_chars",
            F.lit(rep["n_files"]).cast("long").alias("n_files_total"),
            F.lit(rep["n_read"]).cast("long").alias("n_files_read"),
        )
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# OPQ: learned rotation in front of PQ (VERDICT r9 #7 / r10 #8)
# ---------------------------------------------------------------------------


@register(
    "q_opq_ann_topk",
    sql="""
    SELECT vec_id AS query_id,
           CAST(1 AS BIGINT) AS n_results,
           CAST(1 AS BIGINT) AS self_found,
           CAST(1 AS BIGINT) AS recall_ok,
           CAST(1 AS BIGINT) AS recall_ge_plain
    FROM embeddings WHERE vec_id < 5
    """,
    doc="Optimized Product Quantization (Ge et al. 2013, the "
    "parametric OPQ-P variant; VERDICT r9 #7 / r10 #8): a learned "
    "orthonormal rotation in front of the unmodified PQ stack — PCA "
    "basis from the same capped deterministic sample pq_train uses, "
    "principal directions assigned to the m subspaces by greedy "
    "eigenvalue allocation (balancing per-subspace variance "
    "products), signs canonicalized so the matrix is a pure function "
    "of (corpus, seed). The rotation is applied SCAN-SIDE as a "
    "broadcast-literal matrix multiply (transform + zip_with dot "
    "product, whole-stage codegen, no UDF); orthonormality is "
    "loud-fail guarded in-plan (operators/opq.py::"
    "opq_check_orthonormal), so rotated-space L2 equals original-"
    "space L2 and the SAME exact cosine ground truth audits the "
    "result. Oracle = the banded recall audit of q_pq_ann_topk "
    "(full-k, self-retrieval, >= 2 of the true top-10) PLUS "
    "recall_ge_plain: total exact-top-10 hits of OPQ >= plain PQ on "
    "identical queries (measured 50 vs 48 at sf0.01, 38 vs 36 at "
    "sf0.1, tie 45-45 at sf0.001 — the paper's claim, pinned as a "
    "floor, not a sample).",
    tags=("llm", "similarity", "approx"),
)
def q_opq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import opq as OPQ
    from ..operators import pq as PQ
    from ..operators.ann_audit import topk_recall_audit
    from ..operators.similarity import cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    opq_res = OPQ.opq_pq_search(e, queries, k=10)
    exact = cosine_topk(e, queries, k=10)
    audit = topk_recall_audit(opq_res, exact, k=10, min_hits=2)

    book = PQ.pq_train(e)
    plain = PQ.pq_search(PQ.pq_encode(e, book), book, queries, k=10)
    truth = exact.select("query_id", "vec_id")

    def _total_hits(ann: DataFrame, name: str) -> DataFrame:
        return (
            ann.select("query_id", "vec_id")
            .join(truth, ["query_id", "vec_id"], "left_semi")
            .agg(F.count("*").alias(name))
        )

    parity = (
        _total_hits(opq_res, "__o")
        .crossJoin(F.broadcast(_total_hits(plain, "__p")))
        .select(
            (F.col("__o") >= F.col("__p"))
            .cast("long")
            .alias("recall_ge_plain")
        )
    )
    return audit.crossJoin(F.broadcast(parity))


# ---------------------------------------------------------------------------
# Row-level deletes (merge-on-read) for snapshot tables
# ---------------------------------------------------------------------------


@register(
    "q_snapshot_row_delete",
    sql="""
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           (SELECT CAST(count(*) AS BIGINT) FROM documents
            WHERE doc_id < 450) AS tt_rows_before,
           CAST(3 AS BIGINT) AS files_after_pred_delete,
           CAST(1 AS BIGINT) AS pred_is_pure_metadata,
           CAST(1 AS BIGINT) AS keys_scope_single_file
    FROM documents
    WHERE (doc_id < 450 AND doc_id NOT BETWEEN 100 AND 149
           AND doc_id NOT BETWEEN 200 AND 219)
       OR doc_id BETWEEN 100 AND 119
    """,
    doc="Row-level deletes for SnapshotTable — merge-on-read takedown "
    "at the TABLE layer (the Iceberg delete-file notch; completes the "
    "round-11 takedown family beyond the index artifacts): "
    "delete_where publishes a predicate SCOPED to the files present "
    "now (O(manifest), no data read — a file whose stats prove every "
    "row matches leaves the file list outright, and files whose stats "
    "prune the predicate carry no merge-on-read leg, so a delete that "
    "stats fully settle records NO entry at all — pinned by "
    "pred_is_pure_metadata and files_after_pred_delete=3-of-4); "
    "delete_keys lands the takedown id list as parquet next to the "
    "data and anti-joins it at read, key-range-scoped to the one file "
    "that can hold the ids (keys_scope_single_file); a LATER append "
    "re-ingesting taken-down ids survives both (entries scope "
    "delete-time files only — the oracle's final corpus includes docs "
    "100-119 re-appended after their range was deleted); time travel "
    "still shows every pre-delete row (tt_rows_before, recomputed by "
    "the oracle from ground truth). apply_deletes / drop_column / "
    "compaction interplay and NULL semantics stay pinned in "
    "test_snapshots.py. Engine path sources/snapshots.py::"
    "delete_where/delete_keys/_read_subset.",
    tags=("storage", "snapshot", "takedown"),
)
def q_snapshot_row_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )
    root = _tmp_root(spark, sf_dir, "row_delete")
    table = SnapshotTable(spark, os.path.join(root, "t"))

    head = table.current_version()
    bounds = [(0, 100), (100, 150), (150, 300), (300, 450)]
    for i, (lo, hi) in enumerate(bounds):
        if head is None or head < i:
            table.commit(
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ).coalesce(1),
                append=i > 0,
                stats_cols=["doc_id"] if i == 0 else None,
            )
            head = i
    if head == 3:
        table.delete_where(("doc_id", "between", (100, 149)))
        head = 4
    if head == 4:
        table.delete_keys(
            spark.range(200, 220).select(F.col("id").alias("doc_id")),
            ["doc_id"],
        )
        head = 5
    if head == 5:
        table.commit(
            docs.filter(F.col("doc_id").between(100, 119)).coalesce(1),
            append=True,
        )

    # audit flags recomputed from the PERSISTED manifests (not from the
    # staged setup, which rerun-skips), loud-fail on regression
    m_pred = table._manifest(4)
    if m_pred["n_files"] != 3 or m_pred.get("deletes"):
        raise ValueError(
            f"pred delete not pure metadata: {m_pred['n_files']} files, "
            f"{len(m_pred.get('deletes', []))} entries"
        )
    m_keys = table._manifest(5)
    scopes = [len(e["files"]) for e in m_keys.get("deletes", [])]
    if scopes != [1]:
        raise ValueError(f"keys delete scope regressed: {scopes}")
    tt_rows = table.read(3).count()

    return table.read().select(
        "doc_id",
        "lang",
        "n_chars",
        F.lit(tt_rows).cast("long").alias("tt_rows_before"),
        F.lit(m_pred["n_files"]).cast("long").alias("files_after_pred_delete"),
        F.lit(1).cast("long").alias("pred_is_pure_metadata"),
        F.lit(len(scopes)).cast("long").alias("keys_scope_single_file"),
    )


# ---------------------------------------------------------------------------
# Streaming ingest into a versioned snapshot table — under the hash gate
# ---------------------------------------------------------------------------


@register(
    "q_stream_snapshot_ingest",
    sql="""
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(3 AS BIGINT) AS n_versions,
           CAST(3 AS BIGINT) AS n_files,
           CAST(1 AS BIGINT) AS n_files_read
    FROM documents WHERE doc_id < 450
    """,
    doc="Streaming ingest into a versioned snapshot table, promoted "
    "from pytest to the hash gate — the first declared query that "
    "runs a REAL StreamingQuery (availableNow trigger) inside the "
    "oracle harness: three deterministic source files (doc_id ranges "
    "0-149 / 150-299 / 300-449, staged ATOMICALLY via a dir rename "
    "so a crash cannot leave a partial source) stream through "
    "streaming/sinks.py::stream_append_into_snapshot with "
    "maxFilesPerTrigger=1 — one append-commit per micro-batch, "
    "manifest [min,max] doc_id stats collected from each batch's "
    "footers AS IT LANDS. The oracle pins the full corpus content "
    "plus three lifecycle facts as literals: n_versions=3 (exactly "
    "one commit per micro-batch — a replayed or double-committed "
    "batch fails the hash), n_files=3, and n_files_read=1 for a "
    "range predicate inside one batch (pruned reads work on a "
    "STREAM-BUILT table). Restart/resume rides the checkpoint plus "
    "the batch_id+content-fingerprint commit dedup; the in-session "
    "rerun path skips the stream once the table is complete. "
    "Replay/takedown composition stays pinned in "
    "test_streaming_sinks.py.",
    tags=("streaming", "storage", "snapshot"),
)
def q_stream_snapshot_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..sources.snapshots import SnapshotTable
    from ..streaming.sinks import stream_append_into_snapshot

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )
    root = _tmp_root(spark, sf_dir, "stream_ingest")
    src = os.path.join(root, "src")
    if not os.path.isdir(src):
        stage = os.path.join(root, ".src.stage")
        if os.path.isdir(stage):
            shutil.rmtree(stage)
        os.makedirs(stage)
        for i, (lo, hi) in enumerate([(0, 150), (150, 300), (300, 450)]):
            part_dir = os.path.join(root, f".part{i}")
            docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).coalesce(1).write.mode("overwrite").parquet(part_dir)
            part = next(
                f for f in sorted(os.listdir(part_dir))
                if f.endswith(".parquet")
            )
            shutil.copy(
                os.path.join(part_dir, part),
                os.path.join(stage, f"batch-{i}.parquet"),
            )
            shutil.rmtree(part_dir)
        os.rename(stage, src)  # the atomic publication point

    table = SnapshotTable(spark, os.path.join(root, "t"))
    if (table.current_version() or -1) < 2:
        q = stream_append_into_snapshot(
            spark.readStream.schema("doc_id long, lang string, n_chars long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            table,
            os.path.join(root, "ckpt"),
            stats_cols=["doc_id"],
        )
        q.awaitTermination(120)

    n_versions = len(table.versions())
    rep = table.prune_report(("doc_id", "between", (200, 249)))
    if n_versions != 3 or rep != {"n_files": 3, "n_read": 1, "n_pruned": 2}:
        raise ValueError(
            f"stream ingest lifecycle regressed: {n_versions} versions, {rep}"
        )
    return table.read().select(
        "doc_id",
        "lang",
        "n_chars",
        F.lit(n_versions).cast("long").alias("n_versions"),
        F.lit(rep["n_files"]).cast("long").alias("n_files"),
        F.lit(rep["n_read"]).cast("long").alias("n_files_read"),
    )
