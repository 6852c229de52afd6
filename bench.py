"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...}. Timing excludes session
startup; each query is forced with a noop write so nothing is
collected to the driver.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scrappy_spark.plans import registry
from scrappy_spark.session import get_spark

# CORE = the 25-query set benched every round since r4 — the
# round-over-round comparable subtotal. Queries added later go in
# EXTENSIONS so a growing headliner list can't masquerade as a
# regression (VERDICT r5, Next #8).
CORE = [
    "q_groupby_sum_avg",
    "q_join_lineitem_part_supp",
    "q_join_orders_customer",
    "q_topk_per_group",
    "q_window_rank",
    "q_dedup_keep_first",
    "q_ngram_topk",
    "q_session_window_agg",
    "q_tumbling_window_agg",
    "q_doc_stats",
    "q_minhash_pairs",
    "q_simhash",
    "q_embedding_cosine_topk",
    "q_tpch_q1_shape",
    "q_tpch_q6_shape",
    "q_dedup_corpus",
    "q_decontaminate",
    "q_remove_boilerplate",
    "q_remove_repeated_spans",
    "q_pack_sequences",
    "q_tpch_q9_shape",
    "q_tpch_q21_shape",
    "q_pagerank_pages",
    "q_semantic_decontaminate",
    "q_profile_columns",
]

EXTENSIONS = [
    "q_bloom_decontaminate",
    "q_doc_perplexity",
    "q_dsir_weights",
    "q_curriculum_shards",
    "q_image_near_dups",
    "q_web_ingest",
    "q_ngram_novelty",
    "q_domain_link_rank",
    "q_exact_substring_dedup",  # round-7 addition (ExactSubstr family)
    "q_hybrid_retrieve",  # round-7 wave 2 (BM25 + trigram RRF fusion)
    "q_dup_corpus_profile",  # round-7 wave 2 (stratum duplication ppm)
    "q_substring_provenance_sampled",  # round-8 (rate-scaled lineage)
    "q_exact_substring_incremental",  # round-8 (stored-gram-index dedup)
    "q_exact_substring_longdoc",  # round-9 (chunk-mode dedup, 1M-char book)
    "q_mixture_execute",  # round-9 (plan->execute->temperature->shards)
    "q_ivf_pq_ann_topk",  # round-9 (residual-PQ probed search + audit)
    # round-11: the stored-artifact serve paths (train-once/serve-many)
    # and the privacy capstone. Honest-number caveat: min-of-3 keeps
    # the one-time index/model BUILD out (charged to run 1), but
    # q_ivf_pq_search_stored's stored_eq_fresh oracle flag reruns the
    # FRESH in-query ivf_pq_search every run — its wall is fresh-side
    # train + both searches, NOT the stored serve path (which probes at
    # ~0.8s, ARCHITECTURE.md). The two takedown lifecycle queries stay
    # OUT: their wall is snapshot-commit constant cost by design
    # (probes in ARCHITECTURE.md), not a data-scaling number a
    # round-over-round bench should track.
    "q_ivf_pq_search_stored",
    "q_lang_id_scored",
    "q_privacy_release_gate",
]

HEADLINE = CORE + EXTENSIONS


def calibration(spark) -> dict[str, float]:
    """Fixed synthetic machine-speed probe (VERDICT r12 #4): the
    round-11→12 bench moved a uniform ~1.4× with ZERO code change on
    the core set — an ambient host shift that a raw-seconds comparison
    cannot distinguish from a plan regression. This probe never
    changes, so ALL of its round-over-round movement is ambient by
    construction; read ``core_sec / calib_sec`` across rounds to see
    plan-attributable drift with the host factored out. Two legs, each
    min-of-3 after a warm-up run:

    - ``calib_shuffle``: a 50M-row range → mod-key shuffle + agg
      (exchange + partial/final agg — the engine-side cost shape);
    - ``calib_scan``: parquet scan + agg over a 20M-row constant frame
      written once per run (scan + codegen arithmetic — the IO shape).
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    def shuffle_leg():
        return (
            spark.range(50_000_000)
            .select(
                (F.col("id") % 9973).alias("k"),
                (F.col("id") * 31).alias("v"),
            )
            .groupBy("k")
            .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        )

    tmp = tempfile.mkdtemp(prefix="bench_calib_")
    scan_path = os.path.join(tmp, "calib.parquet")
    (
        spark.range(20_000_000)
        .select(
            "id",
            (F.col("id") % 1_000).alias("g"),
            (F.col("id") % 7919).cast("double").alias("x"),
        )
        .write.mode("overwrite")
        .parquet(scan_path)
    )

    def scan_leg():
        return (
            spark.read.parquet(scan_path)
            .groupBy("g")
            .agg(F.sum("x").alias("sx"), F.max("id").alias("m"))
        )

    out: dict[str, float] = {}
    for name, fn in (("calib_shuffle", shuffle_leg), ("calib_scan", scan_leg)):
        fn().write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    shutil.rmtree(tmp, ignore_errors=True)
    out["calib_sec"] = round(out["calib_shuffle"] + out["calib_scan"], 3)
    return out


def serve_timings(spark, sf_dir: str) -> dict[str, float]:
    """Serve-path honesty split (VERDICT r11 #3): the two stored-
    artifact HEADLINE entries are equality/plumbing AUDITS — the
    q_ivf_pq_search_stored wall deliberately re-runs the fresh
    in-query search (constant-cost train) every run, and
    q_lang_id_scored recomputes the hashed feature stream a second
    time for its checksum columns — so their bench numbers mix audit
    cost into the product cost (measured: ~10-15x for the ANN entry;
    roughly parity for lang-id, whose serve scan dominates either way
    — see PLANS.md 'Audit vs serve'). This times the PRODUCT paths
    alone:
    ``IvfPqIndex.search`` over a warm stored index (no train, no
    corpus-embedding read) and ``LangIdModel.score`` from the stored
    broadcast tables (no fit), min-of-3 after a one-time build that is
    charged to nothing. Round-over-round serve comparisons read these;
    the audit entries keep guarding correctness."""
    import tempfile

    from pyspark.sql import functions as F

    from scrappy_spark.io import load_table
    from scrappy_spark.ml.langid import LangIdModel
    from scrappy_spark.operators import similarity as SIM
    from scrappy_spark.operators.ann_index import IvfPqIndex

    root = tempfile.mkdtemp(prefix="bench_serve_")
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
    idx = IvfPqIndex.build(spark, os.path.join(root, "idx"), e, cents)
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    model = LangIdModel.train_and_store(spark, os.path.join(root, "model"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # snapshot point-read serve: the storage layer's product path —
    # a stats+bloom-pruned single-key read against a committed table
    # (build charged to nothing, like the other stored artifacts)
    from scrappy_spark.sources.snapshots import SnapshotTable

    snap = SnapshotTable(spark, os.path.join(root, "snap"))
    snap.commit(docs, stats_cols=["doc_id"], bloom_cols=["doc_id"])

    legs = {
        "ivf_pq_search_stored": lambda: idx.search(queries, k=10, n_probe=2),
        "lang_id_scored": lambda: model.score(docs),
        "snapshot_point_read": lambda: snap.read(
            where=("doc_id", "=", 42)
        ),
    }
    out: dict[str, float] = {}
    for name, fn in legs.items():
        fn().write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    # ref serve: fork + promote are metadata-grain commits — the wall
    # for create_branch plus a fast_forward back, min-of-3 (fresh
    # branch name per iteration; force because main advances). The
    # number that proves promotion stays O(manifest) at any size.
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        snap.create_branch(f"bench{i}")
        snap.fast_forward(f"bench{i}", force=True)
        best = min(best, time.time() - t0)
    out["snapshot_branch_promote"] = round(best, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("scrappy_spark_bench")
    qs = registry.queries()

    # Warm-up: run every headline query once at the smallest sf so
    # whole-stage-codegen compilation, parquet-reader init, and JIT are
    # not charged to the timed runs — we measure steady-state
    # data-processing time, not per-plan compile time.
    #
    # A warm-up failure means the timed loop would crash on the same
    # query 20 lines later with the diagnosis buried in a py4j trace
    # (that is exactly how BENCH_r03 died): name the query and fail
    # fast instead of spending the timed loop on a known-broken plan.
    spark.range(1).count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        failed: list[tuple[str, str]] = []
        for name in HEADLINE:
            try:
                qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:
                first_line = str(exc).strip().splitlines()[0] if str(exc).strip() else repr(exc)
                print(f"bench warm-up FAILED: {name}: {first_line}", file=sys.stderr)
                failed.append((name, first_line))
        if failed:
            print(
                f"bench aborting before timed loop: {len(failed)} headline "
                f"queries failed warm-up: {[n for n, _ in failed]}",
                file=sys.stderr,
            )
            sys.exit(2)

    # Three timed runs, keep the min: single-run local-mode numbers
    # carry ±20-35% GC/scheduling noise (ARCHITECTURE.md §Measured-
    # scaling documents q_dedup_corpus spanning 4.7-6.5 s across warm
    # runs), and the min is the standard low-noise estimator for a
    # deterministic workload (mean would re-admit the noise being
    # filtered).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    serve = serve_timings(spark, sf_dir)
    calib = calibration(spark)

    total = round(sum(timings.values()), 3)
    core_total = round(sum(timings[n] for n in CORE), 3)
    ext_total = round(sum(timings[n] for n in EXTENSIONS), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                # round-over-round comparable subtotal (the fixed
                # 25-query set benched since r4) vs later additions —
                # compare core_sec across rounds, not value.
                "core_sec": core_total,
                "ext_sec": ext_total,
                "queries": timings,
                # PRODUCT-path timings for the stored-artifact entries
                # whose headline walls are audit costs (VERDICT r11 #3
                # — see serve_timings): compare THESE round-over-round
                # for the serve story.
                "serve": serve,
                # fixed synthetic machine-speed probe (VERDICT r12
                # #4): the probe's code never changes, so its movement
                # is ambient by construction — read core_per_calib
                # across rounds for host-normalized plan drift.
                "calib_sec": calib["calib_sec"],
                "calib": calib,
                "core_per_calib": (
                    round(core_total / calib["calib_sec"], 2)
                    if calib["calib_sec"] > 0
                    else None
                ),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
