"""Declared-query registry.

Every engine capability from SURVEY.md §2 is declared here as a
``QuerySpec``: a named Spark DataFrame builder plus (when the semantics
are SQL-expressible) an equivalent DuckDB oracle SQL string. The driver
runs both at sf=0.01 and hash-compares row count + schema +
order-insensitive values; specs without SQL get a rows-only check.

Parity rules (so the hash compare is about semantics, not float dust):
- alias every computed column identically on both sides;
- round floating aggregates (sum/avg over doubles are associativity-
  sensitive; rounding to a few decimals removes the last-ulp noise);
- cast derived integers explicitly (DuckDB ``count``/``year`` return
  BIGINT; Spark's ``year`` returns INT — unify on BIGINT);
- order-insensitive hash means no ORDER BY is needed, but any LIMIT
  must be preceded by a total order on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str, sql: str | None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    # import plan modules lazily so registration happens on first use
    from . import (  # noqa: F401
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        mining,
        events,
        llmdata,
        llmdata2,
        llmdata3,
        llmdata4,
        llmdata5,
        llmdata6,
        llmdata7,
        llmdata8,
        llmdata9,
        llmdata10,
        llmdata11,
        llmdata12,
        llmdata13,
        llmdata14,
        llmdata15,
        llmdata16,
        llmdata17,
        llmdata18,
        audit,
        timeseries,
        sketches,
        extras,
        webingest,
        graphs,
        capstones,
    )

    # Deterministic enumeration, independent of module import order
    # (round-1 left 24 late-registered queries out of the driver's
    # correctness file, which also capped at 50 entries).  The driver
    # checks a prefix of this dict, so order by verification priority:
    # queries NOT yet driver-verified come first (led by q_map_funcs,
    # round 1's one harness failure, now canonicalizer-safe), then the
    # 49 queries already green in CORRECTNESS_r01.json.  Within each
    # group, sorted by name.  tools/verify_oracle.py still covers every
    # query locally regardless of the driver's cap.
    # Within the unchecked group, oracle-backed specs outrank
    # rows-only ones: a driver slot spent on a no-oracle query records
    # a weaker check than the local replica already provides.
    # _NEVER_RUN_PIN outranks everything: those specs have missed the
    # 50-slot cap in EVERY round so far (rows-only specs sort last, and
    # each round's new queries kept pushing them out), so they get the
    # front of the prefix until a CORRECTNESS file finally records them.
    # Among already-verified queries, STALEST green first (the round of
    # the last driver check, from the _R0N_VERIFIED ledgers): with 224
    # queries and a 50-slot gate, the left-over slots should refresh the
    # oldest greens rather than the alphabetical head — stale-green rot
    # is the main verification hazard now that coverage is total.
    unchecked_first = sorted(
        _REGISTRY,
        key=lambda n: (
            n not in _NEVER_RUN_PIN,
            n not in _RECHECK_PIN,
            n in _DRIVER_VERIFIED,
            _REGISTRY[n].sql is None,
            _last_green_round(n),
            n,
        ),
    )
    return {name: _REGISTRY[name] for name in unchecked_first}


def _last_green_round(name: str) -> int:
    """Round of the most recent driver green for ``name`` (0 if never):
    later ledgers override earlier ones, so membership is checked
    newest-first."""
    for rnd, ledger in (
        (13, _R13_VERIFIED),
        (12, _R12_VERIFIED), (12, _R12_JUDGE_VERIFIED),
        (11, _R11_VERIFIED), (11, _R11_JUDGE_VERIFIED),
        (10, _R10_VERIFIED), (10, _R10_JUDGE_VERIFIED), (9, _R09_VERIFIED),
        (8, _R08_VERIFIED),
        (7, _R07_VERIFIED), (6, _R06_VERIFIED), (5, _R05_VERIFIED),
        (4, _R04_VERIFIED), (3, _R03_VERIFIED), (1, _R01_VERIFIED),
    ):
        if name in ledger:
            return rnd
    return 0


#: Round-6 closed the never-run backlog (every registered query now has
#: a CORRECTNESS record), so this tier is empty; it stays as the
#: mechanism for any future late additions that miss the 50-slot cap.
_NEVER_RUN_PIN: frozenset[str] = frozenset()

#: Pin tier — driver verification VOIDED or UPGRADED by a round-14
#: change (the registry rule: a verification from before an
#: implementation change is void). Front of the prefix so
#: CORRECTNESS_r14 records the new forms. (All 15 round-13 pins came
#: back hash-green in CORRECTNESS_r13 and rotated into _R13_VERIFIED.)
#: tools/repin_lint.py enforces membership mechanically: it diffs
#: the tree against the last round-boundary commit and fails when a
#: _DRIVER_VERIFIED query's plan depends on changed code without a pin.
_RECHECK_PIN: frozenset[str] = frozenset({
    # round 14 added branches/tags to the snapshot layer: __init__ is
    # branch-scoped, _publish's advisory-HEAD leg is factored out, and
    # expire's retention/reachability is ref-aware (tag-pinned
    # manifests kept, cross-branch file references live). Every query
    # riding snapshot read/publish/expire — and the stored-index
    # lifecycles whose GC passes through expire — re-checks against
    # the new code.
    "q_compaction_plan", "q_compaction_execute",
    "q_expectations_snapshot_log", "q_incremental_ingest",
    "q_gram_index_takedown", "q_minhash_index_takedown",
    "q_ivf_pq_search_stored", "q_lang_id_scored",
    "q_snapshot_bloom_pruned_read", "q_snapshot_datasource_read",
    "q_snapshot_merge_conditional", "q_snapshot_merge_upsert",
    "q_snapshot_multifield_partition", "q_snapshot_partitioned_read",
    "q_snapshot_pruned_read", "q_snapshot_row_delete",
    "q_snapshot_schema_evolution", "q_snapshot_schema_rename",
    "q_snapshot_spec_evolution", "q_stream_snapshot_ingest",
    # round-14 OPTIMIZATION changes (this round is perf-only; every
    # entry below was hash-verified against the DuckDB oracle at
    # sf0.001 — most also at sf0.01/sf0.1 — when its change landed,
    # see OPTIMIZATION_r14.md's verification log; the pins route the
    # driver's own re-check at the new code):
    # - local_relation / lang-id restructure / IVF-PQ residual reuse
    #   (Changes 1-4, 10)
    "q_anti_terms", "q_bm25_retrieve", "q_bpe_merges_textbook",
    "q_classifier_predict", "q_config_pipeline", "q_context_examples",
    "q_curate_corpus", "q_ivf_pq_ann_topk", "q_lang_id_learned",
    "q_leakage_safe_split", "q_mixture_audit", "q_opq_ann_topk",
    "q_pq_ann_topk", "q_rag_retrieve", "q_retrieval_eval",
    "q_topic_lookup", "q_web_ingest", "q_psl_domain",
    "q_url_normalize_psl", "q_footer_stats", "q_multimodal_curation",
    "q_entity_resolution",
    # - binary grams / provenance single-agg / window keep-first
    #   (Changes 5, 6, 8)
    "q_exact_substring_dedup", "q_exact_substring_incremental",
    "q_exact_substring_longdoc", "q_substring_provenance",
    "q_substring_provenance_longdoc", "q_substring_provenance_sampled",
    "q_dup_corpus_profile", "q_xs_gram_hits",
    # - PageRank node reuse / DSIR pre-agg / BM25 postings dlen /
    #   CC fused rounds / release-gate checkpoint (Changes 7, 9, 11-13)
    "q_pagerank_pages", "q_domain_link_rank", "q_dsir_weights",
    "q_dsir_resample", "q_hybrid_retrieve", "q_dedup_corpus",
    "q_dedup_best_keeper", "q_dup_clusters", "q_incremental_dedup_corpus",
    "q_privacy_release_gate",
    # - spans window flag / mixture+temperature checkpoint /
    #   perplexity type tables / Q21 aggregate fold (Changes 14, 15,
    #   17, 18)
    "q_remove_repeated_spans", "q_mixture_plan", "q_mixture_execute",
    "q_temperature_sample", "q_doc_perplexity", "q_tpch_q21_shape",
    # - ANN vector math: unrolled subvector L2 + norms hoisted out of
    #   the assignment/top-k crossJoins (Change 20; outputs verified
    #   bit-identical, scores same IEEE operation sequence). The other
    #   riders (q_ivf_pq_*, q_pq/q_opq_ann_topk,
    #   q_minhash_index_takedown) are pinned above.
    "q_embedding_cosine_topk", "q_ann_lsh_topk", "q_ivf_ann_topk",
})


# Queries already driver-verified (green in CORRECTNESS_r01.json); kept
# out of the driver-checked prefix so its 50-entry cap lands on queries
# that have not been through the driver gate yet.
_R01_VERIFIED = frozenset({
    "q_anti_customer_without_orders", "q_anti_new_titles", "q_anti_terms",
    "q_array_funcs", "q_asof_join",
    # q_approx_count_distinct deliberately absent: r1 checked it rows-only,
    # round 5 promoted it to a banded-flag oracle — re-checked via _RECHECK_PIN.
    "q_context_examples", "q_count_distinct", "q_cross_join_count",
    "q_cube_rollup", "q_date_funcs", "q_dedup_keep_first", "q_dedup_title",
    "q_doc_stats", "q_except_titles", "q_filter_term", "q_filter_year",
    "q_flatten_institutions", "q_full_outer_join", "q_groupby_sum_avg",
    "q_grouped_map_zscore", "q_grouping_sets", "q_intersect_langs",
    "q_join_lineitem_part_supp", "q_join_orders_customer", "q_json_extract",
    "q_levenshtein", "q_merge_simulation", "q_ngram_topk", "q_normalize",
    "q_percentiles", "q_pivot", "q_project", "q_range_join",
    "q_regexp_extract", "q_semi_orders_with_lineitem", "q_session_window_agg",
    "q_sliding_window_agg", "q_string_funcs", "q_token_subset",
    "q_topic_lookup", "q_topk_per_group", "q_tpch_q3_shape", "q_tpch_q5_shape",
    "q_tumbling_window_agg", "q_udtf_split", "q_union_sources",
    "q_window_rank", "q_word_weights",
})

# Green in CORRECTNESS_r02.json AND CORRECTNESS_r03.json (identical key
# sets); excluded from the prefix so round 4's driver slots land on
# queries the driver has never checked. Round-4 REIMPLEMENTATIONS are
# deliberately absent even though they were r3-green — a verification
# from before an implementation change is void, so the driver must
# re-check them: q_minhash_signatures / q_minhash_pairs /
# q_dup_clusters / q_dedup_corpus (new universal hash family) and
# q_semantic_decontaminate (BLAS kernel).
_R03_VERIFIED = frozenset({
    "q_agg_increment", "q_arrow_udf_score", "q_chunk_documents",
    "q_cogroup_asof", "q_corpus_mix", "q_correlated_avg", "q_decontaminate",
    "q_dedup_exact_hash", "q_domain_stats",
    "q_embedding_cosine_topk", "q_embedding_near_dups", "q_embedding_quantize",
    "q_event_transitions", "q_expect_audit", "q_filter_institution",
    "q_fingerprint", "q_funnel_stages", "q_fuzzy_name_pairs", "q_gapfill_locf",
    "q_hash_sample", "q_jaccard_pairs", "q_label_centroids", "q_lang_id",
    "q_length_batches", "q_map_funcs", "q_matryoshka_energy",
    "q_moving_range_window", "q_multimodal_meta",
    "q_pack_sequences", "q_pagerank_pages", "q_pii_scrub", "q_profile_columns",
    "q_quality_score", "q_quantile_normalize", "q_quota_sample",
    "q_remove_boilerplate", "q_repetition_stats", "q_retention_cohorts",
    "q_rolling_hash", "q_safe_cast_quality", "q_scd2_merge",
    "q_shard_manifest", "q_simhash",
    "q_skew_salted_agg", "q_tfidf_topk",
})

# Green in CORRECTNESS_r04.json (40 oracle-green + 10 rows-only, all
# clean). Round-5 REIMPLEMENTATIONS are deliberately absent so the
# driver re-checks them after the change: q_minhash_pairs /
# q_dedup_corpus / q_dup_clusters (default LSH skew cap),
# q_remove_repeated_spans (self-join alias), q_frame_sample (real
# video decode + new oracle), q_hll_union_rollup (new oracle),
# q_semantic_decontaminate (BLAS kernel NaN-masked argmax + NULL-cosine
# contract for degenerate vectors), q_multimodal_decode (upgraded from
# rows-only to a hex-nibble-histogram oracle — the r4 row was the
# weaker check), q_view_click_attribution (interval_join rekeys the
# right side so outer mode keeps the left join key).
_R04_VERIFIED = frozenset({
    "q_ann_lsh_topk", "q_classifier_predict", "q_embed_vectors",
    "q_embedding_near_dups_ann", "q_ivf_ann_topk",
    # q_kll_quantiles deliberately absent: r4 checked it rows-only, but
    # round 5 gave it a banded-flag oracle — re-checked via _RECHECK_PIN.
    # q_minhash_signatures deliberately absent: r4 checked it, but the
    # round-5 Carter-Wegman reimplementation voided that verification —
    # re-checked via _RECHECK_PIN.
    "q_semantic_decontaminate_ann",
    "q_time_weighted_avg", "q_token_count", "q_token_pmi",
    "q_tpch_q1_shape", "q_tpch_q2_shape", "q_tpch_q4_shape",
    "q_tpch_q6_shape", "q_tpch_q7_shape", "q_tpch_q8_shape",
    "q_tpch_q9_shape", "q_tpch_q10_shape", "q_tpch_q11_shape",
    "q_tpch_q12_shape", "q_tpch_q13_shape", "q_tpch_q14_shape",
    "q_tpch_q15_shape", "q_tpch_q16_shape", "q_tpch_q17_shape",
    "q_tpch_q18_shape", "q_tpch_q19_shape", "q_tpch_q20_shape",
    "q_tpch_q21_shape", "q_tpch_q22_shape", "q_train_val_split",
    "q_truncate", "q_unigram_surprisal", "q_unpivot_metrics",
    "q_value_histogram", "q_variant_extract",
    "q_vocab_coverage", "q_weighted_sample", "q_window_lead_lag",
    "q_zorder_key",
})

# Green in CORRECTNESS_r05.json (49 oracle-hash-green; the file's 50th
# entry, q_taxonomy_topics, was rows-only and is deliberately absent —
# its round-6 banded-flag oracle re-enters it via _RECHECK_PIN).
_R05_VERIFIED = frozenset({
    "q_anchor_text_profile", "q_approx_count_distinct",
    "q_audio_fingerprint", "q_audio_near_dups", "q_bloom_decontaminate",
    "q_cms_heavy_hitters", "q_config_pipeline",
    # q_containment_pairs / q_containment_verified / q_incremental_novelty
    # deliberately absent: round-6 zero-divisor guards voided their r5
    # verification — re-checked via _RECHECK_PIN.
    "q_contrastive_negatives",
    "q_copurchase_butterflies", "q_copurchase_triangles", "q_curate_corpus",
    "q_curriculum_shards", "q_dataset_card", "q_dedup_best_keeper",
    "q_dedup_corpus", "q_doc_perplexity", "q_domain_link_rank",
    "q_domain_mixture_sample", "q_domain_reweight", "q_dsir_resample",
    "q_dsir_weights", "q_dup_clusters", "q_entity_resolution",
    "q_epoch_shuffle", "q_extract_links", "q_footer_stats",
    "q_fuzzy_name_pairs", "q_hilbert_key", "q_hll_union_rollup",
    "q_html_extract", "q_image_dhash", "q_image_near_dups",
    "q_incremental_dedup_corpus", "q_incremental_dedup_pairs",
    "q_jaccard_join_collapsed",
    "q_jaccard_join_exact", "q_kll_quantiles", "q_leakage_safe_split",
    "q_license_filter", "q_minhash_pairs", "q_theta_sketch_overlap",
    "q_url_normalize", "q_view_click_attribution",
    "q_view_click_attribution_full", "q_view_click_attribution_outer",
    "q_web_ingest",
})

# Green in CORRECTNESS_r06.json (44 oracle-hash-green; its 6 `no_oracle`
# rows-only entries deliberately absent — q_pq_ann_topk / q_rag_retrieve /
# q_semdedup were promoted to hash oracles in round 7 and re-enter via
# _RECHECK_PIN; q_frame_sample was promoted too (frame-grid + decode
# flag audit) and re-enters as unchecked;
# q_bpe_merges / q_bpe_tokenize were retired as declared slots).
# Round-7 REIMPLEMENTATIONS also absent (re-checked via _RECHECK_PIN):
# q_dedup_fragments, q_kcore_copurchase, q_incremental_ingest.
_R06_VERIFIED = frozenset({
    "q_agg_increment", "q_anchor_text_profile",
    "q_anti_customer_without_orders", "q_anti_new_titles", "q_anti_terms",
    "q_approx_count_distinct", "q_array_funcs", "q_arrow_udf_score",
    "q_asof_join", "q_audio_fingerprint", "q_audio_near_dups", "q_bfs_hops",
    "q_bloom_decontaminate", "q_bm25_retrieve", "q_bpe_merges_textbook",
    "q_bpe_tokenize_textbook", "q_containment_pairs",
    "q_containment_verified", "q_incremental_novelty",
    "q_minhash_signatures", "q_multimodal_curation", "q_multimodal_decode",
    "q_ngram_novelty", "q_psl_domain", "q_quality_floor",
    "q_random_projection", "q_remove_repeated_spans", "q_robust_anomalies",
    "q_semantic_decontaminate", "q_session_top_paths", "q_skew_report",
    "q_skew_salted_join", "q_span_corrupt", "q_taxonomy_topics",
    "q_temperature_sample", "q_token_drift", "q_url_normalize_psl",
    "q_url_recrawl_dedup", "q_video_fingerprint", "q_video_near_dups",
    "q_webdataset_roundtrip",
})

# The 50 keys of CORRECTNESS_r07.json — the first all-hash-green file
# (50/50, zero `no_oracle`). Includes the 18 round-7 _RECHECK_PIN
# entries (ANN/semdedup/rag promotions, explode_outer sweep re-pins,
# fragment/k-core/ingest reimplementations, embed/classifier audits) —
# all satisfied. Round-8 REIMPLEMENTATIONS are deliberately absent so
# the driver re-checks them (re-entered via _RECHECK_PIN):
# q_exact_substring_dedup / q_substring_provenance /
# q_dup_corpus_profile (XS_POS_BASE length guard in _lgram_stage +
# mirrored oracle bound), q_hybrid_retrieve (char_ngram_topk single-pass
# index), q_cusum_shift (overflow guard), q_frame_sample (NULL-text
# audit fix).
_R07_VERIFIED = frozenset({
    "q_agg_increment", "q_anchor_text_profile", "q_ann_lsh_topk",
    "q_anti_customer_without_orders", "q_anti_new_titles", "q_anti_terms",
    "q_approx_count_distinct", "q_array_funcs", "q_arrow_udf_score",
    "q_asof_join", "q_audio_fingerprint", "q_audio_near_dups", "q_bfs_hops",
    "q_bloom_decontaminate", "q_bm25_retrieve", "q_bpe_merges_textbook",
    "q_bpe_tokenize_textbook", "q_chunk_documents", "q_classifier_predict",
    "q_cms_heavy_hitters", "q_cogroup_asof", "q_config_pipeline",
    "q_containment_pairs",
    "q_dedup_fragments",
    "q_dsir_resample", "q_dsir_weights",
    "q_embed_vectors", "q_embedding_near_dups_ann",
    "q_expectations_report",
    "q_incremental_ingest", "q_ivf_ann_topk",
    "q_join_advisor", "q_kcore_copurchase", "q_ks_drift",
    "q_minhash_bucket_hits", "q_ngram_topk", "q_pq_ann_topk",
    "q_rag_retrieve", "q_reconcile_tables", "q_retrieval_eval",
    "q_semantic_decontaminate_ann", "q_semdedup", "q_simhash",
    "q_token_subset",
})

# The 50 keys of CORRECTNESS_r08.json — all hash-green (the eighth
# consecutive zero-failure round). Round-9 REIMPLEMENTATIONS are
# deliberately absent so the driver re-checks them (re-entered via
# _RECHECK_PIN): q_mixture_plan / q_quality_floor_sweep (BIGINT
# overflow-safe ppm arithmetic, ADVICE r8 #1/#2),
# q_expectations_snapshot_log (content-fingerprint replay dedup +
# deterministic per-day inputs, ADVICE r8 #3/#4), q_compaction_plan
# (deterministic packing tiebreaker, ADVICE r8 #5).
_R08_VERIFIED = frozenset({
    "q_config_pipeline", "q_context_examples", "q_count_distinct",
    "q_cross_join_count", "q_cube_rollup", "q_cusum_shift", "q_date_funcs",
    "q_dedup_keep_first", "q_dedup_title", "q_doc_stats",
    "q_dup_corpus_profile", "q_embedding_bucket_hits",
    "q_exact_substring_dedup", "q_exact_substring_incremental",
    "q_except_titles", "q_filter_term", "q_filter_year",
    "q_flatten_institutions", "q_frame_sample", "q_full_outer_join",
    "q_groupby_sum_avg", "q_grouped_map_zscore", "q_grouping_sets",
    "q_hybrid_retrieve", "q_intersect_langs", "q_join_lineitem_part_supp",
    "q_join_orders_customer", "q_json_extract", "q_k_anonymity",
    "q_levenshtein", "q_merge_simulation", "q_normalize", "q_percentiles",
    "q_pivot", "q_project", "q_range_join", "q_regexp_extract",
    "q_segment_lang_profile", "q_semi_orders_with_lineitem",
    "q_session_window_agg", "q_sliding_window_agg", "q_string_funcs",
    "q_substring_provenance", "q_substring_provenance_sampled",
    "q_topic_lookup", "q_xs_gram_hits",
})

# The 50 keys of CORRECTNESS_r09.json — all hash-green (the ninth
# consecutive zero-failure round). Includes all 13 round-9
# _RECHECK_PIN entries (overflow-contract fixes, long_doc dispatch
# re-pins, snapshot _publish refactor) — all satisfied. Unlike the
# earlier ledgers, the 8 round-10 reimplementations were NOT removed
# from this set: their re-check was enforced solely via _RECHECK_PIN,
# which outranks the verified tier in the sort key (ADVICE r10 #1 —
# the convention going forward: pins are the re-check mechanism;
# ledger membership only feeds staleness ordering, and all 8 rotated
# into _R10_VERIFIED green anyway).
_R09_VERIFIED = frozenset({
    "q_compaction_execute", "q_compaction_plan", "q_config_pipeline",
    "q_corpus_mix", "q_correlated_avg", "q_decontaminate",
    "q_dedup_exact_hash", "q_domain_stats", "q_dup_corpus_profile",
    "q_embedding_cosine_topk", "q_embedding_near_dups",
    "q_embedding_quantize", "q_event_transitions",
    "q_exact_substring_dedup", "q_exact_substring_incremental",
    "q_exact_substring_longdoc", "q_expect_audit",
    "q_expectations_snapshot_log", "q_filter_institution", "q_fingerprint",
    "q_funnel_stages", "q_gapfill_locf", "q_generalization_advice",
    "q_hash_sample", "q_incremental_ingest", "q_ivf_ann_topk",
    "q_ivf_pq_ann_topk", "q_jaccard_pairs", "q_l_diversity",
    "q_label_centroids", "q_lang_id", "q_lang_id_learned",
    "q_length_batches", "q_map_funcs", "q_mixture_audit",
    "q_mixture_execute", "q_mixture_plan", "q_quality_floor_sweep",
    "q_segment_lang_profile", "q_snapshot_schema_evolution",
    "q_substring_provenance", "q_substring_provenance_longdoc",
    "q_topk_per_group", "q_tpch_q3_shape", "q_tpch_q5_shape",
    "q_tumbling_window_agg", "q_udtf_split", "q_union_sources",
    "q_window_rank", "q_word_weights",
})

# The 50 keys of CORRECTNESS_r10.json — all hash-green (the tenth
# consecutive zero-failure round). Includes all 9 round-10
# _RECHECK_PIN entries (mixture equality boundary, file-stats URL
# decode, BIGINT ADC snap, snapshot column-identity work) plus the
# new q_snapshot_schema_rename and 22 TPC-H shape refreshes — the r4
# cohort is no longer the stalest; r5 is.
_R10_VERIFIED = frozenset({
    "q_compaction_execute", "q_compaction_plan", "q_contrastive_negatives",
    "q_copurchase_butterflies", "q_copurchase_triangles", "q_curate_corpus",
    "q_curriculum_shards", "q_dataset_card", "q_dedup_best_keeper",
    "q_expectations_snapshot_log", "q_incremental_ingest", "q_ivf_pq_ann_topk",
    "q_mixture_audit", "q_mixture_execute", "q_pq_ann_topk",
    "q_snapshot_schema_evolution", "q_snapshot_schema_rename",
    "q_time_weighted_avg", "q_token_count", "q_token_pmi", "q_tpch_q10_shape",
    "q_tpch_q11_shape", "q_tpch_q12_shape", "q_tpch_q13_shape",
    "q_tpch_q14_shape", "q_tpch_q15_shape", "q_tpch_q16_shape",
    "q_tpch_q17_shape", "q_tpch_q18_shape", "q_tpch_q19_shape",
    "q_tpch_q1_shape", "q_tpch_q20_shape", "q_tpch_q21_shape",
    "q_tpch_q22_shape", "q_tpch_q2_shape", "q_tpch_q4_shape",
    "q_tpch_q6_shape",
    "q_tpch_q7_shape", "q_tpch_q8_shape", "q_tpch_q9_shape",
    "q_train_val_split", "q_truncate", "q_unigram_surprisal",
    "q_unpivot_metrics", "q_value_histogram", "q_variant_extract",
    "q_vocab_coverage", "q_weighted_sample", "q_window_lead_lag",
    "q_zorder_key",
})

# The 19 round-3 greens the ROUND-10 JUDGE independently re-certified
# against round-10 code (VERDICT r10: "judge-run tools/verify_oracle.py
# re-check at sf0.01 of all 19 queries whose latest driver green is
# round 3 ... 19/19 PASS" — the same cohort the r9 judge certified,
# re-run because curation.py changed in round 10). Counted as
# round-10-fresh for slot prioritization only (they are not in a
# driver CORRECTNESS file), so the driver's leftover slots refresh the
# genuinely stalest cohort — the r5 greens — per VERDICT r10 #5.
_R10_JUDGE_VERIFIED = frozenset({
    "q_matryoshka_energy", "q_moving_range_window", "q_multimodal_meta",
    "q_pack_sequences", "q_pagerank_pages", "q_pii_scrub",
    "q_profile_columns", "q_quality_score", "q_quantile_normalize",
    "q_quota_sample", "q_remove_boilerplate", "q_repetition_stats",
    "q_retention_cohorts", "q_rolling_hash", "q_safe_cast_quality",
    "q_scd2_merge", "q_shard_manifest", "q_skew_salted_agg",
    "q_tfidf_topk",
})

# The 50 keys of CORRECTNESS_r11.json — all hash-green (the eleventh
# consecutive zero-failure round). Includes all 8 round-11
# _RECHECK_PIN entries (compaction file-stats URL decode, snapshot
# stats plumbing, pq train_sample refactor) plus the 9 new round-11
# queries and 33 stale-cohort refreshes. Round-12 re-checks (snapshot
# concurrency + stats contracts + index build staging) are enforced
# via _RECHECK_PIN, which outranks this tier in the sort key.
_R11_VERIFIED = frozenset({
    "q_compaction_execute", "q_compaction_plan", "q_containment_verified",
    "q_dedup_corpus", "q_doc_perplexity", "q_domain_link_rank",
    "q_domain_mixture_sample", "q_domain_reweight", "q_dup_clusters",
    "q_entity_resolution", "q_epoch_shuffle", "q_expectations_snapshot_log",
    "q_extract_links", "q_footer_stats", "q_fuzzy_name_pairs",
    "q_gram_index_takedown", "q_hilbert_key", "q_hll_union_rollup",
    "q_html_extract", "q_image_dhash", "q_image_near_dups",
    "q_incremental_dedup_corpus", "q_incremental_dedup_pairs",
    "q_incremental_ingest", "q_incremental_novelty", "q_ivf_pq_ann_topk",
    "q_ivf_pq_search_stored", "q_jaccard_join_collapsed",
    "q_jaccard_join_exact", "q_kll_quantiles", "q_lang_id_scored",
    "q_leakage_safe_split", "q_license_filter", "q_minhash_index_takedown",
    "q_minhash_pairs", "q_minhash_signatures", "q_opq_ann_topk",
    "q_pq_ann_topk", "q_privacy_release_gate", "q_snapshot_pruned_read",
    "q_snapshot_row_delete", "q_snapshot_schema_evolution",
    "q_snapshot_schema_rename", "q_stream_snapshot_ingest",
    "q_theta_sketch_overlap", "q_url_normalize", "q_view_click_attribution",
    "q_view_click_attribution_full", "q_view_click_attribution_outer",
    "q_web_ingest",
})

# The 23 queries the ROUND-11 JUDGE independently re-certified against
# round-11 code (VERDICT r11: "tools/verify_oracle.py at sf0.01 over
# the entire round-6-stale cohort ... 23/23 PASS" — the 21 queries
# whose latest driver green was r6, plus q_bfs_hops and
# q_bm25_retrieve). Counted as round-11-fresh for slot prioritization
# only (not in a driver CORRECTNESS file), so the driver's leftover
# slots refresh the genuinely stalest cohort — the r7 greens — per
# VERDICT r11 #2.
_R11_JUDGE_VERIFIED = frozenset({
    "q_bfs_hops", "q_bm25_retrieve", "q_multimodal_curation",
    "q_multimodal_decode", "q_ngram_novelty", "q_psl_domain",
    "q_quality_floor", "q_random_projection", "q_remove_repeated_spans",
    "q_robust_anomalies", "q_semantic_decontaminate",
    "q_session_top_paths", "q_skew_report", "q_skew_salted_join",
    "q_span_corrupt", "q_taxonomy_topics", "q_temperature_sample",
    "q_token_drift", "q_url_normalize_psl", "q_url_recrawl_dedup",
    "q_video_fingerprint", "q_video_near_dups", "q_webdataset_roundtrip",
})

# The 50 keys of CORRECTNESS_r12.json — all hash-green (the twelfth
# consecutive zero-failure round). Includes all 13 round-12
# _RECHECK_PIN entries (snapshot concurrency spine, stats contracts,
# index build staging) plus the 2 new round-12 queries and 35
# r7-cohort refreshes. Round-13 re-checks (spec evolution, bucket
# probe guard, expire grace) are enforced via _RECHECK_PIN, which
# outranks this tier in the sort key.
_R12_VERIFIED = frozenset({
    "q_agg_increment", "q_anchor_text_profile", "q_ann_lsh_topk",
    "q_anti_customer_without_orders", "q_anti_new_titles", "q_anti_terms",
    "q_approx_count_distinct", "q_array_funcs", "q_arrow_udf_score",
    "q_asof_join", "q_audio_fingerprint", "q_audio_near_dups",
    "q_bloom_decontaminate", "q_bpe_merges_textbook",
    "q_bpe_tokenize_textbook", "q_chunk_documents", "q_classifier_predict",
    "q_cms_heavy_hitters", "q_cogroup_asof", "q_compaction_execute",
    "q_compaction_plan", "q_containment_pairs", "q_dedup_fragments",
    "q_dsir_resample", "q_dsir_weights", "q_embed_vectors",
    "q_embedding_near_dups_ann", "q_expectations_report",
    "q_expectations_snapshot_log", "q_gram_index_takedown",
    "q_incremental_ingest", "q_ivf_pq_search_stored", "q_join_advisor",
    "q_kcore_copurchase", "q_ks_drift", "q_lang_id_scored",
    "q_minhash_bucket_hits", "q_minhash_index_takedown", "q_ngram_topk",
    "q_rag_retrieve", "q_reconcile_tables", "q_retrieval_eval",
    "q_semantic_decontaminate_ann", "q_snapshot_merge_upsert",
    "q_snapshot_partitioned_read", "q_snapshot_pruned_read",
    "q_snapshot_row_delete", "q_snapshot_schema_evolution",
    "q_snapshot_schema_rename", "q_stream_snapshot_ingest",
})

# The 43 queries the ROUND-12 JUDGE independently re-certified against
# round-12 code (VERDICT r12: "tools/verify_oracle.py at sf0.01 over
# the ENTIRE r7/r8-stale cohort ... 43/43 PASS" — the 3 r7 stragglers
# plus all 40 r8 greens not refreshed by the r12 driver). Counted as
# round-12-fresh for slot prioritization only (not in a driver
# CORRECTNESS file), so the driver's leftover slots refresh the
# genuinely stalest cohort — the r9 greens — per VERDICT r12 #2.
_R12_JUDGE_VERIFIED = frozenset({
    "q_context_examples", "q_count_distinct", "q_cross_join_count",
    "q_cube_rollup", "q_cusum_shift", "q_date_funcs", "q_dedup_keep_first",
    "q_dedup_title", "q_doc_stats", "q_embedding_bucket_hits",
    "q_except_titles", "q_filter_term", "q_filter_year",
    "q_flatten_institutions", "q_frame_sample", "q_full_outer_join",
    "q_groupby_sum_avg", "q_grouped_map_zscore", "q_grouping_sets",
    "q_hybrid_retrieve", "q_intersect_langs", "q_join_lineitem_part_supp",
    "q_join_orders_customer", "q_json_extract", "q_k_anonymity",
    "q_levenshtein", "q_merge_simulation", "q_normalize", "q_percentiles",
    "q_pivot", "q_project", "q_range_join", "q_regexp_extract",
    "q_semdedup", "q_semi_orders_with_lineitem", "q_session_window_agg",
    "q_simhash", "q_sliding_window_agg", "q_string_funcs",
    "q_substring_provenance_sampled", "q_token_subset", "q_topic_lookup",
    "q_xs_gram_hits",
})

# The 50 queries hash-green in CORRECTNESS_r13.json (thirteenth
# consecutive zero-failure round). Includes all 15 round-13
# _RECHECK_PIN entries (spec evolution, bucket-probe guard, expire
# grace, index build staging) plus the 4 new round-13 queries
# (spec evolution, conditional merge, DataSource read, bloom /
# multi-field partition reads) and the r9-cohort refreshes.
_R13_VERIFIED = frozenset({
    "q_compaction_execute", "q_compaction_plan", "q_config_pipeline",
    "q_corpus_mix", "q_correlated_avg", "q_decontaminate",
    "q_dedup_exact_hash", "q_domain_stats", "q_dup_corpus_profile",
    "q_embedding_cosine_topk", "q_embedding_near_dups",
    "q_embedding_quantize", "q_event_transitions",
    "q_exact_substring_dedup", "q_exact_substring_incremental",
    "q_exact_substring_longdoc", "q_expect_audit",
    "q_expectations_snapshot_log", "q_filter_institution",
    "q_fingerprint", "q_funnel_stages", "q_gapfill_locf",
    "q_generalization_advice", "q_gram_index_takedown", "q_hash_sample",
    "q_incremental_ingest", "q_ivf_ann_topk", "q_ivf_pq_search_stored",
    "q_jaccard_pairs", "q_l_diversity", "q_label_centroids",
    "q_lang_id", "q_lang_id_learned", "q_lang_id_scored",
    "q_length_batches", "q_map_funcs", "q_minhash_index_takedown",
    "q_mixture_plan", "q_snapshot_bloom_pruned_read",
    "q_snapshot_datasource_read", "q_snapshot_merge_conditional",
    "q_snapshot_merge_upsert", "q_snapshot_multifield_partition",
    "q_snapshot_partitioned_read", "q_snapshot_pruned_read",
    "q_snapshot_row_delete", "q_snapshot_schema_evolution",
    "q_snapshot_schema_rename", "q_snapshot_spec_evolution",
    "q_stream_snapshot_ingest",
})

_DRIVER_VERIFIED = (
    _R01_VERIFIED | _R03_VERIFIED | _R04_VERIFIED | _R05_VERIFIED
    | _R06_VERIFIED | _R07_VERIFIED | _R08_VERIFIED | _R09_VERIFIED
    | _R10_VERIFIED | _R11_VERIFIED | _R12_VERIFIED | _R13_VERIFIED
)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in all_specs().items() if spec.sql is not None}
