"""Physical-plan audits: the optimizations ARCHITECTURE.md claims must
actually appear in the executed plans — pushdown, pruning, broadcast,
partial aggregation, TakeOrderedAndProject — so a regression in plan
shape fails CI, not just the benchmark."""

import pytest

from scrappy_spark.plans import registry

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = registry.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "q_groupby_sum_avg")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 6 needed columns reach the scan
    read_schema = plan.split("ReadSchema: ")[1]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_partial_aggregation(spark):
    plan = _plan(spark, "q_groupby_sum_avg")
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_multiway_join_broadcasts_dims(spark):
    plan = _plan(spark, "q_join_lineitem_part_supp")
    assert plan.count("BroadcastHashJoin") >= 2  # part AND supplier
    assert "SortMergeJoin" not in plan  # fact table never shuffles to join


def test_topk_is_take_ordered(spark):
    plan = _plan(spark, "q_ngram_topk")
    assert "TakeOrderedAndProject" in plan  # orderBy+limit, no full sort


def test_semi_and_anti_join_operators(spark):
    assert "LeftSemi" in _plan(spark, "q_semi_orders_with_lineitem")
    assert "LeftAnti" in _plan(spark, "q_anti_new_titles")


def test_context_join_broadcasts_terms(spark):
    plan = _plan(spark, "q_context_examples")
    assert "BroadcastNestedLoopJoin" in plan  # theta join, terms side broadcast


def test_q6_all_predicates_pushed(spark):
    """TPC-H Q6 is the pushdown litmus: every range predicate reaches
    the parquet scan, and the scan reads only the 4 needed columns."""
    plan = _plan(spark, "q_tpch_q6_shape")
    pushed = plan.split("PushedFilters: ")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    read_schema = plan.split("ReadSchema: ")[1]
    assert "l_returnflag" not in read_schema and "l_partkey" not in read_schema


def test_q1_partial_agg_single_scan(spark):
    plan = _plan(spark, "q_tpch_q1_shape")
    assert "partial_sum" in plan  # map-side combine
    assert plan.count("FileScan") == 1  # one pass over lineitem
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_window_lead_lag_single_sort_shuffle(spark):
    """All four analytic functions share one window frame → one
    Exchange on the partition key and one Window operator."""
    plan = _plan(spark, "q_window_lead_lag")
    assert plan.count("Exchange") == 1
    assert plan.count("Window") >= 1


def test_decontaminate_broadcasts_benchmark(spark):
    """The corpus must never shuffle on gram — the benchmark gram set
    rides a broadcast. The hit-id flag join is deliberately NOT
    force-broadcast (corpus-derived cardinality; AQE decides), so only
    the gram semi-join is asserted broadcast."""
    plan = _plan(spark, "q_decontaminate")
    # the corpus-side gram semi-join is a broadcast join (the benchmark
    # side's own distinct may shuffle its tiny gram set; that's fine)
    assert "LeftSemi, BuildRight" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin LeftSemi" not in plan


def test_boilerplate_common_set_broadcast(spark):
    plan = _plan(spark, "q_remove_boilerplate")
    assert "SortMergeJoin" not in plan  # common-fragment set is broadcast


def test_pack_sequences_single_window_shuffle(spark):
    """Packing is one hash shuffle on the stream key and one Window —
    no global sort, no extra exchange."""
    plan = _plan(spark, "q_pack_sequences")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan  # not a global sort


def test_hash_sample_scan_only(spark):
    plan = _plan(spark, "q_hash_sample")
    assert "Exchange" not in plan  # pure filter, zero shuffle
    read_schema = plan.split("ReadSchema: ")[1]
    assert "text" not in read_schema  # pruned: only doc_id, source read


def test_limit_query_prunes_projection(spark):
    plan = _plan(spark, "q_project")
    read_schema = plan.split("ReadSchema: ")[1]
    assert "p_brand" not in read_schema and "p_type" not in read_schema
    assert "PushedFilters: [IsNotNull(p_size), GreaterThan(p_size,40)]" in plan


def test_q4_semi_join_with_residual(spark):
    """EXISTS with a correlated non-equi predicate compiles to a semi
    join (no orders-row duplication) and the date range pushes into the
    orders scan."""
    plan = _plan(spark, "q_tpch_q4_shape")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # pushed date filter


def test_q19_brand_filter_reaches_part_scan(spark):
    """The disjunction's common factor (brand IN) must prune the part
    scan; the join stays broadcast."""
    plan = _plan(spark, "q_tpch_q19_shape")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "In(p_brand, [Brand#1,Brand#2,Brand#3])" in plan  # part scan
    # Catalyst also derives the per-side quantity disjunction for the
    # lineitem scan — both sides prune before the join.
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan


def test_correlated_avg_single_exchange(spark):
    """Decorrelated window avg: one hash exchange on o_custkey shared
    by the window and the filter — the naive correlated form would
    re-aggregate per row."""
    plan = _plan(spark, "q_correlated_avg")
    assert plan.count("Exchange hashpartitioning") == 1


def test_q22_anti_join_and_broadcast_scalar(spark):
    plan = _plan(spark, "q_tpch_q22_shape")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q2_single_window_over_join_output(spark):
    """Q2 shape: the correlated per-part min is ONE window over the
    joined rows (no second scan/self-join of the derived cost table),
    every dim side a broadcast, and the ordered limit is top-k."""
    plan = _plan(spark, "q_tpch_q2_shape")
    assert plan.count("BroadcastHashJoin") >= 4  # part, supplier, nation, region
    assert "SortMergeJoin" not in plan
    assert plan.count("Window") == 1
    assert "TakeOrderedAndProject" in plan


def test_q9_star_join_no_fact_shuffle_for_dims(spark):
    plan = _plan(spark, "q_tpch_q9_shape")
    assert plan.count("BroadcastHashJoin") >= 3  # part, supplier, nation
    assert "partial_sum" in plan  # map-side combine on the profit rollup


def test_q11_scalar_total_is_broadcast(spark):
    """The global-total threshold joins back as a broadcast of a
    1-row aggregate (BNLJ BuildRight), and the shared derived-cost
    aggregate is computed once: AQE's exchange reuse kicks in on the
    executed plan rather than re-scanning lineitem for the total."""
    df = registry.queries()["q_tpch_q11_shape"](spark, SF_DIR)
    static = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin BuildRight" in static
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final


def test_q16_not_in_is_broadcast_anti(spark):
    plan = _plan(spark, "q_tpch_q16_shape")
    assert "LeftAnti, BuildRight" in plan


def test_q21_window_folds_not_exists(spark):
    """r14: the NOT-EXISTS anti self-join over the late set is folded
    into a min=max window over l_orderkey (one late-set evaluation, no
    inequality-residual join); the EXISTS side is a semi join against
    the per-order supplier-spread aggregate."""
    plan = _plan(spark, "q_tpch_q21_shape")
    assert "LeftSemi" in plan
    assert "LeftAnti" not in plan
    assert "Window" in plan
    assert "TakeOrderedAndProject" in plan


def test_bloom_probe_broadcasts_bank(spark):
    """The bank side of the probe must broadcast — the operator's whole
    point is never shuffling the corpus on the key."""
    plan = _plan(spark, "q_bloom_decontaminate")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_perplexity_broadcasts_model_tables(spark):
    """Probability tables (Heaps-law-bounded) broadcast back onto the
    exploded stream; the corpus never shuffles on a model key."""
    plan = _plan(spark, "q_doc_perplexity")
    assert plan.count("BroadcastExchange") >= 3  # ctx, uni, total
    assert "CartesianProduct" not in plan


def test_capped_lsh_single_signature_consumption(spark):
    """The capped pair plan consumes the signature pipeline ONCE: one
    shingle explode feeds one groupBy(seed, minhash); no self-join of
    the signature frame remains."""
    plan = _plan(spark, "q_minhash_pairs")
    # the bucket-collect aggregate exists...
    assert "collect_list" in plan or "sort_array" in plan
    # ...and the signature aggregation appears exactly once (the old
    # shape re-derived it for the size filter and both join sides)
    assert plan.count("Generate explode") <= 2  # shingles + pair explode


def test_incremental_pairs_prunes_base_with_broadcast(spark):
    """The base index is semi-joined against the batch's broadcast
    bucket keys before the union-tag aggregate."""
    plan = _plan(spark, "q_incremental_dedup_pairs")
    assert "BroadcastExchange" in plan
    assert "LeftSemi" in plan


def test_temperature_sample_is_scan_side(spark):
    """The corpus is filtered via a broadcast of the |groups|-row
    threshold table — no shuffle of the data itself."""
    plan = _plan(spark, "q_temperature_sample")
    assert "BroadcastExchange" in plan
    # the only exchanges are broadcasts of the tiny derived tables
    import re

    shuffle_exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert all(c in ("lang",) or c.startswith("_") for c in shuffle_exchanges), shuffle_exchanges


def test_dsir_ratio_join_broadcasts_and_scan_prunes(spark):
    plan = _plan(spark, "q_dsir_weights")
    # the <=256-row log-ratio table must come in as a broadcast, and
    # the documents scan must read only the 3 needed columns
    assert "BroadcastHashJoin" in plan
    read_schema = plan.split("ReadSchema: ")[1]
    assert "source" not in read_schema and "n_chars" not in read_schema


def test_curriculum_rank_is_range_partitioned(spark):
    plan = _plan(spark, "q_curriculum_shards")
    assert "rangepartitioning" in plan.lower()  # two-phase rank, phase 1
    assert "BroadcastHashJoin" in plan  # prefix offsets join back broadcast


def test_image_near_dups_has_no_product_join(spark):
    plan = _plan(spark, "q_image_near_dups")
    # banded bucket machinery, never an all-pairs product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_runtime_bloom_filter_injects_on_selective_dim_join(spark):
    """Spark's runtime row-level filtering: a selective filter on the
    dim side of a shuffle join grows a bloom_filter_agg subquery whose
    might_contain() is pushed onto the fact side's scan — rows that
    can't join are dropped BEFORE the shuffle. The size thresholds are
    tuned for clusters (application side >= 10 GB), so the test scopes
    them down to fixture scale; at 100 TB the defaults fire on exactly
    this join shape with zero configuration."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        orders = spark.read.parquet(
            "/root/testdata/sf0.001/orders.parquet"
        ).filter("o_totalprice > 500000")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy()
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt and "bloom_filter_agg" in opt
        # and the filtered count is unaffected by the bloom (no false negatives)
        expected = (
            li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey).count()
        )
        assert j.collect()[0]["count"] == expected
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
