"""Scale probe: replicate sf0.1 10× into a multi-file layout (~6M
lineitem rows) and measure wall-time slope vs sf0.1 for heavy queries.

Replication duplicates keys, so join OUTPUTS grow quadratically in the
replication factor (lineitem⋈orders emits 100× rows at 10×) — slopes
must be read against work done, not rows scanned. The point of the
probe: with a multi-file layout the engine's scan/shuffle parallelism
absorbs 10× input with ≈1× wall for scan-bound plans.

Usage: python tools/scale_probe.py  (writes/reuses /tmp/scale10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scrappy_spark.io import load_table
from scrappy_spark.plans import registry
from scrappy_spark.session import get_spark

BASE = "/tmp/scale10"
PROBES = [
    "q_groupby_sum_avg",
    "q_join_lineitem_part_supp",
    "q_ngram_topk",
    "q_minhash_pairs",
    "q_tpch_q5_shape",
    "q_session_window_agg",
    "q_tpch_q1_shape",
    "q_dedup_corpus",
    "q_decontaminate",
    "q_remove_boilerplate",
    "q_pack_sequences",
    "q_pagerank_pages",
    "q_semantic_decontaminate",
    "q_profile_columns",
    "q_tpch_q21_shape",
    "q_unigram_surprisal",
    "q_remove_repeated_spans",
    "q_dup_clusters",
    "q_bloom_decontaminate",
    "q_doc_perplexity",
    "q_incremental_dedup_pairs",
    "q_temperature_sample",
    "q_quality_floor",
    "q_dsir_weights",
    "q_curriculum_shards",
    "q_image_near_dups",
    "q_web_ingest",
    "q_ngram_novelty",
    "q_dedup_best_keeper",
    "q_token_drift",
    "q_containment_verified",
    "q_extract_links",
    "q_domain_link_rank",
    "q_copurchase_triangles",
    "q_copurchase_butterflies",
    "q_bm25_retrieve",
    "q_kcore_copurchase",
    "q_dedup_fragments",
    "q_multimodal_curation",
    "q_exact_substring_dedup",
    "q_minhash_bucket_hits",
    "q_substring_provenance",
    "q_hybrid_retrieve",
    "q_dup_corpus_profile",
    "q_reconcile_tables",
    "q_retrieval_eval",
    "q_cusum_shift",
    "q_ks_drift",
    "q_substring_provenance_sampled",
    "q_expectations_snapshot_log",
    "q_k_anonymity",
    "q_quality_floor_sweep",
    "q_compaction_plan",
    "q_exact_substring_incremental",
    "q_mixture_plan",
    "q_segment_lang_profile",
    "q_xs_gram_hits",
    "q_embedding_bucket_hits",
    "q_exact_substring_longdoc",
    "q_mixture_execute",
    "q_ivf_pq_ann_topk",
    "q_compaction_execute",
    "q_l_diversity",
    "q_generalization_advice",
    "q_lang_id_learned",
    "q_gram_index_takedown",
    "q_minhash_index_takedown",
    "q_privacy_release_gate",
    "q_snapshot_pruned_read",
    "q_opq_ann_topk",
    "q_snapshot_row_delete",
    "q_ivf_pq_search_stored",
    "q_lang_id_scored",
    "q_stream_snapshot_ingest",
    "q_snapshot_merge_upsert",
    "q_snapshot_partitioned_read",
    "q_snapshot_spec_evolution",
    "q_snapshot_merge_conditional",
    "q_snapshot_datasource_read",
    "q_snapshot_bloom_pruned_read",
    "q_snapshot_multifield_partition",
    "q_snapshot_branch_lifecycle",
    "q_snapshot_datasource_mor",
    "q_snapshot_bloom_backfill",
    "q_snapshot_metadata_tables",
    "q_snapshot_incremental_read",
]


def build(spark) -> None:
    os.makedirs(BASE)
    reps = spark.range(10).select(F.col("id").alias("__rep"))
    for t in ["lineitem", "orders", "customer", "supplier", "part",
              "region", "nation", "documents", "embeddings", "events"]:
        df = load_table(spark, "/root/testdata/sf0.1", t)
        if t in ("lineitem", "orders", "documents", "events"):
            df = df.crossJoin(reps)
            # Re-key per-row ids so replicated rows are NEW rows, not
            # id collisions. For documents the texts stay identical —
            # the replicated corpus is 90% exact duplicates, which is
            # precisely the web-scale shape the collapse-before-LSH
            # path exists for.
            for idc in ("doc_id", "event_id"):
                if idc in df.columns:
                    df = df.withColumn(idc, F.col(idc) * 10 + F.col("__rep"))
            df = df.drop("__rep").repartition(32)
        df.write.mode("overwrite").parquet(f"{BASE}/{t}.parquet")


def main() -> None:
    spark = get_spark("scale_probe")
    if not os.path.exists(BASE):
        build(spark)
    qs = registry.queries()
    global PROBES
    if len(sys.argv) > 1:  # probe only the named queries
        unknown = sorted(set(sys.argv[1:]) - set(PROBES))
        if unknown:
            sys.exit(
                f"unknown probe name(s) {unknown}; add to PROBES first "
                "(silently probing nothing would read as a clean run)"
            )
        PROBES = [n for n in PROBES if n in sys.argv[1:]]
    for n in PROBES:  # warm codegen
        qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    for n in PROBES:
        t0 = time.time()
        qs[n](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        small = time.time() - t0
        t0 = time.time()
        qs[n](spark, BASE).write.format("noop").mode("overwrite").save()
        big = time.time() - t0
        print(f"{n:28s} sf0.1={small:5.2f}s 10x={big:6.2f}s slope={big / max(small, 0.01):.1f}x")


if __name__ == "__main__":
    main()
