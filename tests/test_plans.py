"""Physical-plan assertions: the plan we want, not just one that passes.

These are the scale guarantees — a regression here means a query still
returns correct rows at sf0.01 but would fall over at 100 TB.
"""

from __future__ import annotations

import re

from twitter_hashtag_sentiment_analysis_spark.plans import plan_of


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_broadcast")
    assert "BroadcastHashJoin" in plan, plan


def test_pruned_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "scan_pruned")
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan, plan
    # only the 4 referenced columns survive into the parquet ReadSchema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" in read_schema and "l_quantity" not in read_schema, read_schema


def test_global_topk_avoids_full_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "limit_topk")
    assert "TakeOrderedAndProject" in plan, plan


def test_group_topk_uses_window_group_limit(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "win_topk_group")
    assert "WindowGroupLimit" in plan, plan


def test_cosine_topk_truncates_before_shuffle(spark, sf_dir):
    """sim_cosine_topk must be two-stage: a PARTIAL WindowGroupLimit
    below the probe-key Exchange caps shuffled rows at partitions x
    probes x 5, and the pair kernel must be a single dot product —
    norms precomputed once per side BELOW the join, never recomputed
    per (probe, candidate) pair."""
    from twitter_hashtag_sentiment_analysis_spark.plans import explain_str
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    # simple mode: one tree with expressions inline, so text position
    # tracks plan position (formatted mode splits tree from details)
    df = load_all()["sim_cosine_topk"].fn(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "row_number(), 5, Partial" in plan, plan
    assert "row_number(), 5, Final" in plan, plan
    # exactly one HOF aggregate kernel (the dot) above the join; the
    # two norm kernels live in projections below it
    above_join = plan.split("BroadcastNestedLoopJoin")[0]
    assert above_join.count("aggregate(") == 1, above_join


def test_semi_join_stays_semi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_semi")
    assert "LeftSemi" in plan, plan


def test_theta_range_join_broadcasts_interval_side(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_theta_range")
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_whole_stage_codegen_on_sentiment_hot_path(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sentiment_expr")
    # expression-form sentiment must not leave the JVM (higher-order
    # array lambdas aren't codegen-eligible, but they evaluate JVM-side;
    # the '*' marker confirms codegen on the surrounding stages)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "* ColumnarToRow" in plan, plan


def test_asof_join_has_no_pairwise_join(spark, sf_dir):
    # the as-of is a window carry-forward: exactly zero join operators
    plan = plan_of(spark, sf_dir, "join_asof")
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_quota_sample_uses_window_group_limit(spark, sf_dir):
    # the per-source cap must push below the shuffle (map-side K rows
    # per source), or quota sampling scans 100 TB into one window sort
    plan = plan_of(spark, sf_dir, "sample_quota_per_source")
    assert "WindowGroupLimit" in plan, plan


def test_hash_split_is_shuffle_free(spark, sf_dir):
    # split assignment is a pure function of doc_id: narrow map only
    plan = plan_of(spark, sf_dir, "sample_hash_split")
    assert "Exchange" not in plan, plan


def test_pack_sequences_single_shuffle(spark, sf_dir):
    # the running-sum window and the per-pack agg share the `source`
    # hash partitioning => exactly one Exchange in the whole plan
    plan = plan_of(spark, sf_dir, "pack_sequences")
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))
    assert n_exchanges == 1, plan


def test_correlated_exists_decorrelates_to_semi_join(spark, sf_dir):
    # per-outer-row re-execution must never appear: Catalyst rewrites
    # the EXISTS into one (broadcast) left-semi hash join
    plan = plan_of(spark, sf_dir, "sub_exists_correlated")
    assert "LeftSemi" in plan, plan


def test_in_agg_subquery_decorrelates_to_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sub_in_agg")
    assert "LeftSemi" in plan, plan


def test_curation_pipeline_two_shuffles(spark, sf_dir):
    # quality filter + hash + split are narrow; only the content-hash
    # dedup window and the (split, source) packing window shuffle
    import re

    plan = plan_of(spark, sf_dir, "corpus_curation_pipeline")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))
    assert n_exchanges == 2, plan


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    # with broadcast disabled, bucketed sides sort-merge with NO shuffle:
    # the property that kills the workload's biggest Exchange at 100 TB
    # (at fixture scale AQE rightly prefers broadcast, so disable it to
    # observe the bucketing contract itself)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, sf_dir, "sink_bucketed")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan
    # formatted mode splits node headers from their arguments, so the
    # old "Exchange hashpartitioning" substring could never appear and
    # the assertion was vacuous — count actual Exchange nodes instead
    assert _n_exchanges(plan) == 0, plan


def test_composite_queries_broadcast_dims_and_bound_topk(spark, sf_dir):
    # the TPC-H-shaped composites must broadcast every dimension side
    # and finish in TakeOrderedAndProject — no global sort of the agg
    for q in ("q_shipping_priority", "q_local_supplier_volume", "q_returned_items"):
        plan = plan_of(spark, sf_dir, q)
        assert "BroadcastHashJoin" in plan, (q, plan)
        assert "TakeOrderedAndProject" in plan, (q, plan)
        assert "SortMergeJoin" not in plan or q == "q_shipping_priority", (q, plan)


def test_keep_latest_uses_window_group_limit(spark, sf_dir):
    # top-1-per-key must keep a single-row heap per key, not sort the
    # whole partition
    plan = plan_of(spark, sf_dir, "dedup_keep_latest")
    assert "WindowGroupLimit" in plan, plan


def test_chunk_udtf_expands_without_shuffle(spark, sf_dir):
    # the lateral UDTF expansion is partition-local: no Exchange at all
    import re

    plan = plan_of(spark, sf_dir, "udtf_chunk_text")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))
    assert n_exchanges == 0, plan


def test_forecast_revenue_pushes_every_filter(spark, sf_dir):
    # Q6's predicates must reach the parquet scan — at 100 TB this is
    # the difference between reading 2% and 100% of row groups
    plan = plan_of(spark, sf_dir, "q_forecast_revenue")
    assert "PushedFilters" in plan, plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed


def test_pricing_summary_partial_aggregates(spark, sf_dir):
    # Q1 must map-side combine: two HashAggregate nodes around one
    # Exchange, so the shuffle carries groups, not 600k fact rows
    plan = plan_of(spark, sf_dir, "q_pricing_summary")
    assert plan.count("HashAggregate") >= 2, plan


def test_fixed_k_sample_is_take_ordered(spark, sf_dir):
    # reservoir-equivalent sampling must not globally sort the corpus
    plan = plan_of(spark, sf_dir, "sample_fixed_k")
    assert "TakeOrderedAndProject" in plan, plan


def test_null_safe_join_stays_hash_join(spark, sf_dir):
    # EqualNullSafe is a hashable key: a naive OR-of-equals predicate
    # would degrade to BroadcastNestedLoopJoin (quadratic at scale)
    plan = plan_of(spark, sf_dir, "join_null_safe")
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoop" not in plan, plan


def test_partition_pruned_scan_prunes_directories(spark, sf_dir):
    # the partition-column filter must become a PartitionFilters entry
    # (directory pruning), NOT a data filter evaluated per row
    plan = plan_of(spark, sf_dir, "scan_partition_pruned")
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "event_type" in pf[0], plan


def test_cache_reuse_reads_in_memory(spark, sf_dir):
    # the second consumer must scan the columnar cache, not re-scan
    # parquet: InMemoryTableScan appears in the executed plan
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    df = load_all()["cache_reuse"].fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "InMemoryTableScan" in plan, plan


def test_expanded_composites_broadcast_all_dims(spark, sf_dir):
    # Q7/Q8/Q14/Q19/Q17/Q21: every dimension side must broadcast; the
    # only sort-merge pair allowed is the lineitem-orders fact join
    for q in ("q_volume_shipping", "q_market_share", "q_promo_revenue",
              "q_discounted_revenue", "q_small_qty_revenue",
              "q_waiting_suppliers"):
        plan = plan_of(spark, sf_dir, q)
        assert "BroadcastHashJoin" in plan, (q, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (q, plan)


def test_partsupp_derived_composites_broadcast_all_dims(spark, sf_dir):
    # Q2/Q9/Q12/Q16/Q20 (supply catalog derived from lineitem): every
    # dimension side broadcasts; no nested-loop join anywhere (the only
    # sanctioned BNLJ in the family is Q11's 1-row scalar broadcast,
    # asserted separately below)
    for q in ("q_min_cost_supplier", "q_product_type_profit",
              "q_late_shipment_priority", "q_parts_supplier_relation",
              "q_potential_promotion"):
        plan = plan_of(spark, sf_dir, q)
        assert "BroadcastHashJoin" in plan, (q, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (q, plan)


def test_min_cost_supplier_two_shuffles_and_bound_topk(spark, sf_dir):
    # Q2's plan budget: one (partkey, suppkey) pair aggregate, one
    # partkey window repartition of the already-aggregated pairs; the
    # final ranking is TakeOrderedAndProject, never a global sort
    import re

    plan = plan_of(spark, sf_dir, "q_min_cost_supplier")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))
    assert n_exchanges == 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_important_stock_scalar_cut_is_one_row_broadcast(spark, sf_dir):
    # Q11's threshold subquery must be a broadcast of the 1-row global
    # aggregate (BNLJ against one row = a residual filter), and the
    # per-part value aggregate must partial-aggregate map-side
    plan = plan_of(spark, sf_dir, "q_important_stock")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_bloom_runtime_filter_reaches_fact_scan(spark, sf_dir):
    # the injected runtime bloom filter must appear as a
    # BloomFilterMightContain predicate on the fact side (pre-shuffle
    # row kill), and survive into the executed plan
    plan = plan_of(spark, sf_dir, "join_bloom_runtime")
    assert "bloom" in plan.lower(), plan


def test_customer_distribution_keeps_zero_count(spark):
    # Q13's defining semantic: the priority filter lives in the JOIN
    # condition, so a customer with no qualifying orders appears with
    # c_count = 0 instead of vanishing (what a WHERE would do).
    # sf0.01 is the smallest fixture containing a zero-count customer.
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    sf01 = "/root/testdata/sf0.01"
    rows = {
        r["c_count"]: r["custdist"]
        for r in load_all()["q_customer_distribution"].fn(spark, sf01).collect()
    }
    n_cust = spark.read.parquet(f"{sf01}/customer.parquet").count()
    assert sum(rows.values()) == n_cust  # every customer exactly once
    assert 0 in rows  # zero-order customers survive the left join


def test_perplexity_scans_corpus_once(spark, sf_dir):
    """The bigram LM trains AND scores from ONE corpus explode: the
    (lang, w1, w2) counts are localCheckpoint-materialized, so the
    serving plan's three consumers (bigram model, unigram model, score
    join) all read the bounded checkpointed relation — no explode (and
    no parquet re-scan) may appear downstream. An explode in this plan
    = the corpus is being re-scanned per consumer, the 3x-scan
    regression this query was rewritten to remove."""
    plan = plan_of(spark, sf_dir, "text_perplexity_proxy")
    assert "explode" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan
    assert "Scan parquet" not in plan, plan


def test_decontaminate_broadcasts_benchmark_shingles(spark, sf_dir):
    """The benchmark shingle set must broadcast (eval suites are MBs
    against a 100 TB corpus): a shuffle join here would shuffle the
    full corpus shingle explode."""
    plan = plan_of(spark, sf_dir, "text_decontaminate")
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_outlier_iqr_broadcasts_fences(spark, sf_dir):
    """The per-lang fence table (a handful of rows) must broadcast into
    the counting pass — a shuffle join here would re-shuffle the whole
    corpus to join against 5 rows."""
    plan = plan_of(spark, sf_dir, "quality_outlier_iqr")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_downweight_dups_has_no_join_back(spark, sf_dir):
    """Cluster size is a COUNT window over the content hash, NOT a
    groupBy + join-back: the plan must carry exactly one Window and
    zero joins (three exchanges total: hash window + the exact
    (source, csize) integer pre-aggregate + the tiny source-level
    fold aggregate — the last over #sources x #csizes rows only)."""
    import re

    plan = plan_of(spark, sf_dir, "sample_downweight_dups")
    assert "Window" in plan, plan
    assert "Join" not in plan, plan
    # formatted plans list each operator once as "(n) Exchange"
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 3, plan


def test_rfm_scoring_is_broadcast_not_global_sort(spark, sf_dir):
    """customer_rfm must score via broadcast quartile boundaries — a
    global NTILE would funnel every customer through one partition."""
    plan = plan_of(spark, sf_dir, "customer_rfm")
    assert "percentile_disc" in plan, plan
    assert plan.count("BroadcastExchange") >= 2, plan  # ref date + bounds
    assert "Window" not in plan, plan  # no rank-based scoring anywhere


def test_streaks_top1_is_window_group_limit(spark, sf_dir):
    """event_streaks' per-user longest pick must be WindowGroupLimit,
    and the whole query must reuse ONE user-keyed exchange."""
    plan = plan_of(spark, sf_dir, "event_streaks")
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("hashpartitioning(") == 1, plan


def test_attribution_is_one_window_not_self_join(spark, sf_dir):
    """event_attribution must be the single-sort carry-forward form —
    an as-of self-join would shuffle the event log twice."""
    plan = plan_of(spark, sf_dir, "event_attribution")
    assert "Join" not in plan, plan
    # exactly one Window node (tree line "+- Window (n)" / root "* Window")
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan


def test_retention_cohort_broadcasts_sizes(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "event_retention_cohort")
    assert "BroadcastHashJoin" in plan, plan


def test_ewma_is_single_sort_per_key(spark, sf_dir):
    """All EWMA_DEPTH lags must ride one Window over one sort."""
    plan = plan_of(spark, sf_dir, "ts_ewma")
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan
    assert "Join" not in plan, plan


def test_readability_is_pure_projection(spark, sf_dir):
    """text_readability is per-row regex counting: no shuffle at all."""
    plan = plan_of(spark, sf_dir, "text_readability")
    assert "Exchange" not in plan, plan


def test_basket_pairs_expand_without_self_join(spark, sf_dir):
    """agg_basket_lift must build pairs from per-order collected
    baskets (HOF expansion) — the fact table is shuffled ONCE; the
    support joins are broadcast; the report is TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "agg_basket_lift")
    assert "SortMergeJoin" not in plan, plan
    assert "collect_set" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_markov_normalizer_runs_on_counts_relation(spark, sf_dir):
    """event_markov: one data-sized window (lead), one aggregate; the
    probability normalizer windows the tiny counts relation."""
    plan = plan_of(spark, sf_dir, "event_markov")
    assert "Join" not in plan, plan


def test_zipf_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "text_zipf")
    assert "TakeOrderedAndProject" in plan, plan


def test_pareto_share_broadcasts_dims(spark, sf_dir):
    """win_pareto_share: customer + nation sides must broadcast; the
    per-nation window is partitioned (never a global sort)."""
    plan = plan_of(spark, sf_dir, "win_pareto_share")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_lag_correlation_broadcasts_lag_spine(spark, sf_dir):
    """ts_lag_correlation: the lag spine and series join stay broadcast
    — no sort-merge join of grid-sized relations."""
    plan = plan_of(spark, sf_dir, "ts_lag_correlation")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_rolling_median_single_window_no_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "win_rolling_median")
    assert "Join" not in plan, plan
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan


def test_cusum_broadcasts_stats(spark, sf_dir):
    """ts_cusum_changepoint: per-type stats come back as a broadcast,
    and the walk is one window."""
    plan = plan_of(spark, sf_dir, "ts_cusum_changepoint")
    assert "BroadcastHashJoin" in plan, plan
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan


def test_gini_is_partitioned_integer_rank_form(spark, sf_dir):
    """agg_gini_nation: dims broadcast; the rank window is partitioned
    by nation (no global sort)."""
    plan = plan_of(spark, sf_dir, "agg_gini_nation")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_join_hint_flips_strategy_to_shuffled_hash(spark, sf_dir):
    """sql_join_hints: the SHUFFLE_HASH hint must override the
    broadcast choice AQE would make at fixture scale."""
    plan = plan_of(spark, sf_dir, "sql_join_hints")
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_hard_negatives_two_stage_topk(spark, sf_dir):
    """sim_hard_negatives: per-probe top-1 must truncate partial below
    the shuffle, same contract as sim_cosine_topk."""
    from twitter_hashtag_sentiment_analysis_spark.plans import explain_str
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    df = load_all()["sim_hard_negatives"].fn(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "row_number(), 1, Partial" in plan, plan
    assert "row_number(), 1, Final" in plan, plan


def test_column_profile_single_scan(spark, sf_dir):
    """stat_column_profile: one parquet scan feeds every metric."""
    plan = plan_of(spark, sf_dir, "stat_column_profile")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_paths_topk_is_take_ordered_single_data_window(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "event_paths_top")
    assert "TakeOrderedAndProject" in plan, plan
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan


def test_python_source_pushdown_reaches_reader(spark, sf_dir):
    """source_python_pushdown: the EqualTo filter must appear as a
    PushedFilter on the Python scan — the reader generates only the
    matching congruence class, it does not post-filter the world."""
    plan = plan_of(spark, sf_dir, "source_python_pushdown")
    assert "PushedFilters: [EqualTo(lang,en)]" in plan, plan


def test_gopher_rules_plan_is_narrow(spark, sf_dir):
    """The quality gate is per-row HOF expressions only: no Python,
    no KEYED shuffle — at 100 TB it must stay a map over the scan.
    The one allowed Exchange is spread()'s ROUND-ROBIN re-split of a
    sub-row-group fixture scan (r15: the x100 corpus arrived as a
    2-split file and ran the HOF kernels on 2 of 32 cores); round
    robin moves no data by key and disappears at real scale where the
    input has thousands of row groups."""
    plan = plan_of(spark, sf_dir, "quality_gopher_rules")
    assert _n_exchanges(plan) <= 1, plan
    assert "hashpartitioning" not in plan, plan
    assert "Python" not in plan, plan


def test_substring_corpus_join_is_equi_and_aggs_are_partial(spark, sf_dir):
    """The gram-df join-back must be an equi join (1:1 per position),
    never a nested-loop pair blowup, and the gram-df aggregate must
    have a map-side partial phase."""
    plan = plan_of(spark, sf_dir, "dedup_substring_corpus")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan  # partial+final x2 aggs


def test_weighted_quantile_preaggregates_before_sort(spark, sf_dir):
    """agg_weighted_quantile must collapse to the distinct-value
    relation (partial+final hash agg) BEFORE the per-group window
    sort — the property that keeps the sort bounded at 100 TB."""
    from twitter_hashtag_sentiment_analysis_spark.plans import explain_str
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    df = load_all()["agg_weighted_quantile"].fn(spark, sf_dir)
    plan = explain_str(df, "simple")
    # the window must sit ABOVE the value-collapsing aggregate
    win_pos = plan.index("Window")
    agg_pos = plan.rindex("HashAggregate")
    assert agg_pos > win_pos, plan


def test_mmr_shortlist_is_take_ordered(spark, sf_dir):
    """The distributed stage of the MMR re-rank (corpus -> MMR_C
    shortlist) must compile to TakeOrderedAndProject — per-partition
    heaps, no global sort of the scored corpus."""
    from twitter_hashtag_sentiment_analysis_spark.plans import explain_str
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all
    from twitter_hashtag_sentiment_analysis_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = F.transform(
        F.sequence(F.lit(1), F.lit(sim.DIM)),
        lambda i: ((i * 37 % 19) - 9) / F.lit(10.0),
    )
    scored = e.select(
        "vec_id", "embedding", F.round(sim.cosine(q, F.col("embedding")), 6).alias("rel")
    )
    shortlist = scored.orderBy(F.desc("rel"), "vec_id").limit(sim.MMR_C)
    assert "TakeOrderedAndProject" in explain_str(shortlist, "simple")


def test_weighted_reservoir_pushes_rank_limit(spark, sf_dir):
    """The per-language K-sample must compile to WindowGroupLimit
    (partial local top-K heaps below the shuffle) — the distributed
    reservoir property; without it the exchange carries the corpus."""
    plan = plan_of(spark, sf_dir, "sample_weighted_reservoir")
    assert "WindowGroupLimit" in plan, plan


def test_skew_hotcold_join_splits_paths(spark, sf_dir):
    """The skew-split join must keep its two physical paths: hot keys
    through a broadcast hash join, the cold remainder through a
    shuffled hash join (hint pinned), unioned before the aggregate."""
    plan = plan_of(spark, sf_dir, "join_skew_hotcold")
    assert "BroadcastHashJoin" in plan, plan
    assert "ShuffledHashJoin" in plan, plan
    assert "Union" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_share_of_parent_broadcasts_all_dims(spark, sf_dir):
    """All three dimension joins (customer, nation, region) must
    broadcast — the only data-sized exchange is the one aggregate
    shuffle, as the docstring promises."""
    plan = plan_of(spark, sf_dir, "q_share_of_parent")
    assert plan.count("BroadcastHashJoin Inner") == 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_percentile_within_group_preaggregates_before_sort(spark, sf_dir):
    """agg_percentile_within_group must collapse to the distinct-value
    relation (partial+final hash agg) BEFORE the per-group window sort
    — per-group state bounded by distinct values, not rows — and must
    not compile to Spark's buffering percentile_cont aggregate."""
    from twitter_hashtag_sentiment_analysis_spark.plans import explain_str
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    df = load_all()["agg_percentile_within_group"].fn(spark, sf_dir)
    plan = explain_str(df, "simple")
    win_pos = plan.index("Window")
    agg_pos = plan.rindex("HashAggregate")
    assert agg_pos > win_pos, plan  # collapse sits below the window
    assert "percentile_cont" not in plan, plan


def test_bpe_tokens_plan_is_narrow(spark, sf_dir):
    """The unrolled merge chain must stay JVM expressions (no Python)
    and run once per distinct content: the exact-dup pre-collapse shows
    up as a sha2 hash aggregate feeding the merge arithmetic, and the
    only join back to member doc_ids is a 1:1 equi-join."""
    plan = plan_of(spark, sf_dir, "text_bpe_tokens")
    assert "Python" not in plan, plan
    assert "sha2" in plan, plan
    assert "Aggregate" in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_global_rank_by_range_is_distributed_and_exact(spark, sf_dir):
    """The sql_scripting customer rank must never be a single-task
    global sort: the helper range-partitions the relation, ranks per
    partition, and offsets — and agrees row-for-row with the naive
    unpartitioned window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from twitter_hashtag_sentiment_analysis_spark.io import table
    from twitter_hashtag_sentiment_analysis_spark.operators.analytics import (
        _global_rank_by_range,
    )
    from twitter_hashtag_sentiment_analysis_spark.plans import explain_str

    per = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    order = [F.desc("rev"), F.asc("o_custkey")]
    ranked = _global_rank_by_range(per, order)
    plan = explain_str(ranked)
    # the range exchange itself is frozen behind the localCheckpoint
    # (Scan ExistingRDD); what must hold downstream: the corpus-sized
    # window is partitioned by _pid, the only single-partition exchange
    # is the one-row-per-partition offset relation (post-aggregate),
    # and the offsets come back via broadcast
    assert "Scan ExistingRDD" in plan, plan
    assert "windowspecdefinition(_pid" in plan, plan
    assert plan.count("SinglePartition") <= 1, plan
    assert "BroadcastHashJoin" in plan, plan
    naive = per.select(
        "o_custkey", F.row_number().over(Window.orderBy(*order)).alias("rk")
    )
    got = {r.o_custkey: r.rk for r in ranked.select("o_custkey", "rk").collect()}
    want = {r.o_custkey: r.rk for r in naive.collect()}
    assert got == want


def test_decontaminate_bloom_semis_are_broadcast(spark, sf_dir):
    """One broadcast LEFT SEMI per Bloom probe plus the broadcast
    verify join — the corpus side must never shuffle before its
    per-doc aggregate."""
    plan = plan_of(spark, sf_dir, "text_decontaminate_bloom")
    assert plan.count("LeftSemi") >= 3, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pq_quantize_broadcasts_codebook_and_group_limits(spark, sf_dir):
    """The sub-codebook must broadcast and the per-(vector, subspace)
    argmin must run as WindowGroupLimit, not a full sort."""
    plan = plan_of(spark, sf_dir, "embed_pq_quantize")
    assert "BroadcastHashJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_bloom_scan_pushes_both_predicates(spark, sf_dir):
    """Both the source equality (the Bloom/stats target) and the
    n_chars range must reach the rewritten parquet scan."""
    plan = plan_of(spark, sf_dir, "scan_parquet_bloom")
    assert "EqualTo(source,src7)" in plan, plan
    assert "GreaterThanOrEqual(n_chars,300" in plan, plan


def test_interval_overlap_join_is_equi(spark, sf_dir):
    """The binned rewrite must run as a hash/merge equi join on
    (user, bin) — never a per-user nested loop."""
    plan = plan_of(spark, sf_dir, "join_interval_overlap")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_poisson_repeat_plan_is_narrow(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sample_poisson_repeat")
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_token_budget_windows_run_over_the_slice_relation(spark, sf_dir):
    """The share/cumsum windows must sit ABOVE the per-slice hash
    aggregate — the property that bounds the single-partition cumsum
    by recipe cardinality, not corpus size."""
    from twitter_hashtag_sentiment_analysis_spark.plans import explain_str
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    df = load_all()["corpus_token_budget"].fn(spark, sf_dir)
    plan = explain_str(df, "simple")
    win_pos = plan.index("Window")
    agg_pos = plan.rindex("HashAggregate")
    assert agg_pos > win_pos, plan


def test_asof_nearest_shares_one_sort(spark, sf_dir):
    """Both directional frames must run over ONE user-partitioned
    exchange+sort — the linear as-of shape, not two shuffles."""
    plan = plan_of(spark, sf_dir, "join_asof_nearest")
    n_exchanges = len(re.findall(r"^\s*\(\d+\) Exchange", plan, flags=re.M))
    assert n_exchanges == 1, plan


def test_multi_distinct_expands_once(spark, sf_dir):
    """Three distinct aggregates must compile to ONE Expand-based
    aggregation pipeline, not one job per DISTINCT."""
    plan = plan_of(spark, sf_dir, "agg_multi_distinct")
    assert "Expand" in plan, plan


def test_regr_trend_broadcasts_dims_and_aggregates_twice(spark, sf_dir):
    """Both dimension joins must be broadcast (no fact-sized shuffle
    before the monthly aggregate), and the OLS moments must compile to
    plain two-phase hash aggregation — no Sort, no SortMergeJoin."""
    plan = plan_of(spark, sf_dir, "stat_regr_trend")
    assert plan.count("BroadcastHashJoin Inner") == 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "partial_sum" in plan, plan  # map-side combine on the moments


def test_scd2_pit_join_is_joinless(spark, sf_dir):
    """The point-in-time lookup must compile to the union-sort shape —
    two Exchanges (dimension versioning, union fill) and NO join node:
    an interval theta-join here would cross facts x versions per key."""
    plan = plan_of(spark, sf_dir, "join_scd2_pit")
    n_exchanges = len(re.findall(r"^\s*\(\d+\) Exchange", plan, flags=re.M))
    assert n_exchanges == 2, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,signup)]" in plan, plan


def test_gram_matrix_combines_map_side_and_broadcasts_marginals(spark, sf_dir):
    """The O(d^2) pair expansion must collapse to moment cells BEFORE
    the shuffle (partial_sum), and both marginal joins must broadcast —
    shuffle volume stays partitions x d(d+1)/2 at any vector count."""
    plan = plan_of(spark, sf_dir, "embed_gram_matrix")
    assert "partial_sum" in plan, plan
    assert plan.count("BroadcastHashJoin Inner") == 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_triangle_count_closure_is_semi_and_scalars_broadcast(spark, sf_dir):
    """The closure check must be a LeftSemi on the (u, w) pair (an
    inner join would duplicate wedges per closing edge), and the only
    cross joins are the four 1-row scalar combiners — broadcast
    nested-loop, never a partitioned CartesianProduct."""
    plan = plan_of(spark, sf_dir, "graph_triangle_count")
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dynamic_partition_pruning_subquery_in_scan(spark, sf_dir):
    """The partitioned fact scan must carry a dynamicpruningexpression
    PartitionFilters entry fed by the dimension broadcast — without it
    the join reads all 25 nation dirs instead of region 2's five."""
    plan = plan_of(spark, sf_dir, "join_partition_pruning_dynamic")
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "dynamicpruning" in pf[0], plan


def test_mv_incremental_delta_filter_is_pushed(spark, sf_dir):
    """Both MV branches must push their o_orderdate cut into the
    parquet scan (refresh latency = delta scan, not history scan) and
    partial-aggregate before the key shuffle."""
    plan = plan_of(spark, sf_dir, "sql_mv_incremental")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("GreaterThanOrEqual(o_orderdate" in l for l in pushed), plan
    assert any("LessThan(o_orderdate" in l for l in pushed), plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_dsir_model_join_is_broadcast(spark, sf_dir):
    """DSIR's whole scale story: the B-row model joins map-side. The
    scoring join against the bucket model must be a BroadcastHashJoin
    (the model is a dictionary, never a shuffled relation)."""
    plan = plan_of(spark, sf_dir, "quality_dsir_importance")
    assert "BroadcastHashJoin" in plan, plan


def test_holt_linear_is_one_window_pass(spark, sf_dir):
    """The unrolled Holt chain must stay ONE per-key window sort (all
    8 lags share the same window spec) with no extra shuffle beyond
    the hourly aggregate + window partitioning."""
    plan = plan_of(spark, sf_dir, "ts_holt_linear")
    import re as _re

    assert len(_re.findall(r"\(\d+\) Window", plan)) == 1, plan


def test_zorder_bucket_scan_prunes_directories(spark, sf_dir):
    """A point filter on zbucket over the z-ordered layout must prune
    partition DIRECTORIES (the layout's pruning contract)."""
    import twitter_hashtag_sentiment_analysis_spark.sources.sinks as sk
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    load_all()["sink_zorder_layout"].fn(spark, sf_dir)  # ensure written
    back = spark.read.parquet(sk._zorder_cache[sf_dir]).filter("zbucket = 3")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "zbucket" in pf[0], plan


def test_ks_prefix_sum_windows_are_bucket_partitioned(spark, sf_dir):
    """stat_ks_test must run the distributed prefix-sum: the per-price
    cumulative window partitions by (segment, bucket) — never by
    segment alone, which would serialize ~all distinct prices into 5
    window tasks."""
    from twitter_hashtag_sentiment_analysis_spark.plans import explain_str
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    df = load_all()["stat_ks_test"].fn(spark, sf_dir)
    plan = explain_str(df, "simple")
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    per_price = [s for s in specs if "cents" in s]
    assert per_price and all("bucket" in s for s in per_price), specs


def test_collocation_topk_avoids_full_sort(spark, sf_dir):
    from twitter_hashtag_sentiment_analysis_spark.plans import plan_of

    plan = plan_of(spark, sf_dir, "text_collocation_pmi")
    assert "TakeOrderedAndProject" in plan, plan


def test_ccnet_bucket_never_sorts_the_corpus(spark, sf_dir):
    """text_ccnet_bucket's threshold scan must run over the collapsed
    distinct-score relation: no global (empty-partitioning) Sort over
    a corpus-grain relation. The only unpartitioned window is the
    cumulative count over DISTINCT score_milli values, and bucket
    assignment joins two broadcast scalars."""
    plan = plan_of(spark, sf_dir, "text_ccnet_bucket")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    # the thresholds reach the docs side as a broadcast, never a shuffle
    assert "SortMergeJoin" not in plan.split("Window")[0], plan


def test_gaps_islands_single_customer_shuffle(spark, sf_dir):
    """The window and both aggregates share the o_custkey partitioning:
    exactly two exchanges total (the distinct's, then the customer
    key's), no join."""
    plan = plan_of(spark, sf_dir, "win_gaps_islands")
    assert "Join" not in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan


def test_knn_graph_has_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sim_knn_graph_mutual")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_lifecycle_windows_share_one_sort(spark, sf_dir):
    """min/lag/lead all partition by user_id: the plan carries exactly
    one Window subtree chain over one user-key exchange."""
    plan = plan_of(spark, sf_dir, "event_user_lifecycle")
    assert "Join" not in plan, plan
    # one exchange for the distinct, one for the user-partitioned sort,
    # one for the final week aggregate
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3, plan


def test_binary_quantize_broadcasts_probes(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "embed_binary_quantize")
    assert "BroadcastNestedLoopJoin" in plan, plan  # theta self-pair on !=
    assert "CartesianProduct" not in plan, plan


def test_epoch_shuffle_is_one_aggregate(spark, sf_dir):
    """Narrow map + one (epoch, chunk) hash aggregate: exactly one
    exchange, partial aggregation map-side."""
    plan = plan_of(spark, sf_dir, "sample_epoch_shuffle")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_star_except_prunes_excluded_columns(spark, sf_dir):
    """* EXCEPT must not read the excluded columns: ReadSchema carries
    4 of 6 order columns."""
    plan = plan_of(spark, sf_dir, "sql_star_except")
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "o_orderpriority" not in read_schema, read_schema
    assert "o_orderstatus" not in read_schema, read_schema
    assert "o_totalprice" in read_schema, read_schema


def test_lateral_alias_stays_in_one_codegen_stage(spark, sf_dir):
    """The alias chain lowers to stacked Projects FUSED into a single
    WholeStageCodegen span over the scan — no exchange, no subquery
    boundary; the filter still pushes to parquet."""
    plan = plan_of(spark, sf_dir, "sql_lateral_column_alias")
    assert "Exchange" not in plan, plan
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey" in plan, plan
    # every Project carries the same codegen id (one fused stage)
    ids = set(re.findall(r"Project \[codegen id : (\d+)\]", plan))
    assert len(ids) == 1, plan


def test_nested_pruning_reads_only_selected_leaves(spark, sf_dir):
    """ReadSchema must carry only the selected struct LEAVES: meta
    keeps source+chars but NOT lang; stats keeps tokens but NOT
    first_token."""
    plan = plan_of(spark, sf_dir, "scan_nested_pruning")
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][-1]
    assert "source" in read_schema and "chars" in read_schema, read_schema
    assert "lang" not in read_schema, read_schema
    assert "first_token" not in read_schema, read_schema


def test_dau_wau_no_corpus_grain_shuffle(spark, sf_dir):
    """The 7x contribution explosion must run on the collapsed
    (user, day) relation: no window, joins only on the day key."""
    plan = plan_of(spark, sf_dir, "event_dau_wau")
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def _n_exchanges(plan: str) -> int:
    """Count physical Exchange nodes in a FORMATTED plan (node header
    lines '(n) Exchange'); ReusedExchange does not count — it is the
    reuse we want."""
    return len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))


def _n_hash_exchanges(plan: str) -> int:
    """Count only DATA shuffles (hashpartitioning Exchanges) in a
    FORMATTED plan — io.spread()'s defensive round-robin re-split of a
    sub-row-group fixture file is parallelism repair, not a semantic
    shuffle, and disappears on any real multi-row-group input."""
    return len(re.findall(r"^Arguments: hashpartitioning", plan, re.M))


def test_kfold_assign_is_shuffle_free_narrow_map(spark, sf_dir):
    """Content-keyed fold assignment must be a pure narrow map: no
    Exchange anywhere — the property that makes it free at 100 TB."""
    plan = plan_of(spark, sf_dir, "sample_kfold_assign")
    assert "Exchange" not in plan, plan


def test_tokenizer_fertility_is_one_pass(spark, sf_dir):
    """One corpus scan into one two-phase aggregate: exactly one
    shuffle (partial + final HashAggregate around a single Exchange),
    no join — the merge-chain arithmetic must not force a second
    pass."""
    plan = plan_of(spark, sf_dir, "text_tokenizer_fertility")
    assert _n_hash_exchanges(plan) == 1, plan
    assert "Join" not in plan, plan


def test_paragraph_dedup_has_no_pair_join(spark, sf_dir):
    """Paragraph dedup is shuffle-shaped, never pair-shaped: window on
    chunk content + reassembly groupBy — two hash Exchanges, zero
    joins (a Join would mean candidate-pair generation crept in)."""
    plan = plan_of(spark, sf_dir, "text_paragraph_dedup")
    assert "Join" not in plan, plan
    assert _n_hash_exchanges(plan) == 2, plan


def test_m4_windows_and_agg_share_one_exchange(spark, sf_dir):
    """Both row_number windows and the final aggregate key on
    (event_type, px): Spark must plan ONE data shuffle for all three
    (window partitioning is reused by the agg)."""
    plan = plan_of(spark, sf_dir, "ts_downsample_m4")
    assert _n_hash_exchanges(plan) == 1, plan


def test_regr_multi_is_single_two_phase_aggregate(spark, sf_dir):
    """All ten moment sums fold map-side: one Exchange between partial
    and final HashAggregate; the Cramer assembly is pure projection."""
    plan = plan_of(spark, sf_dir, "stat_regr_multi")
    assert _n_hash_exchanges(plan) == 1, plan
    assert "Join" not in plan, plan


def test_cohort_ltv_broadcasts_sizes_and_windows_small_relation(spark, sf_dir):
    """The cohort-size side joins broadcast (it is cohort-count-sized);
    the cumulative window must run above the (cohort, age) aggregate,
    not over the raw event log."""
    plan = plan_of(spark, sf_dir, "event_cohort_ltv_curve")
    assert "BroadcastHashJoin" in plan, plan


def test_bench_jitter_guard_retry_decision():
    """bench.needs_retry: fire only when the best run exceeds BOTH the
    1.4x ratio and the +0.2 s absolute threshold vs the pinned
    reference, never without a reference, never with a spent budget
    (r12 verdict item 6: single-sample driver rows swung untouched
    keys 3.5x on machine-day jitter)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "thsa_bench",
        os.path.join(os.path.dirname(__file__), os.pardir, "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    assert bench.needs_retry([2.5], 0.7, 60)            # the r12 agg_cube shape
    assert not bench.needs_retry([2.5, 0.72], 0.7, 60)  # best run recovered
    assert not bench.needs_retry([0.9], 0.7, 60)        # within 1.4x
    assert not bench.needs_retry([0.05], 0.01, 60)      # ratio yes, absolute no
    assert not bench.needs_retry([2.5], None, 60)       # no pinned reference
    assert not bench.needs_retry([2.5], 0.7, 0)         # budget spent
    assert bench.needs_retry([1.0], 0.7, 1)             # 1.43x and +0.3 s
    # ref == 0.0 (round(...,3) of a sub-ms key in the pin sweep): the
    # ratio term degenerates and the absolute floor alone would retry
    # on any 0.2 s blip — treated as no reference (r13 advisor)
    assert not bench.needs_retry([0.3], 0.0, 60)
    assert not bench.needs_retry([5.0], -0.1, 60)

    # pin governance (r13 verdict item 8): movers = shared keys that
    # shifted >1.5x either direction AND >0.2 s absolute; zero-valued
    # pins and sub-floor wobbles never count
    ref = {"a": 1.0, "b": 0.5, "c": 0.0, "d": 2.0, "e": 0.05}
    now = {"a": 1.6, "b": 0.31, "c": 3.0, "d": 2.1, "e": 0.09}
    moved, shared = bench.repin_movers(ref, now)
    assert shared == 5
    # a: 1.6x and +0.6s -> moves; b: 1.61x but only 0.19s -> no;
    # c: zero pin -> excluded; d: 1.05x -> no; e: 1.8x but 0.04s -> no
    assert [m[0] for m in moved] == ["a"]
    assert bench.repin_movers({}, now) == ([], 0)

    # reserve pass (r15): keys still tripping the gate after the
    # in-loop spend, worst-pin-ratio first; memo-backed and
    # already-retried keys excluded; gate semantics match needs_retry
    # (ratio AND absolute), so sub-floor wobbles never queue
    t = {"z_tail": 3.0, "a_head": 1.0, "m_mid": 2.1, "memo": 9.0,
         "tried": 5.0, "small": 0.2, "nopin": 7.0}
    r = {"z_tail": 1.0, "a_head": 0.9, "m_mid": 1.0, "memo": 1.0,
         "tried": 1.0, "small": 0.05}
    order = bench.second_pass_order(t, r, skip={"memo", "tried"})
    assert order == ["z_tail", "m_mid"]  # 3.0x before 2.1x; rest gated out
    assert bench.second_pass_order({}, r, skip=set()) == []


def test_bench_retry_rewinds_dir_caches():
    """The jitter-guard retry must re-enter the exact fixture-dir cache
    state run 1 saw (r13 advisor): without the rewind a retry skips the
    one-time fixture build and min-of-runs scores a structurally warmer
    run than the first-run semantics BENCH_REF was pinned with. The
    snapshot/restore pair is the contract bench.py relies on."""
    from twitter_hashtag_sentiment_analysis_spark import io as thsa_io
    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    load_all()  # imports every operator module => registers its caches
    cache = thsa_io.register_dir_cache({})
    try:
        cache["pre"] = "/tmp/built-by-an-earlier-key"
        snap = thsa_io.dir_cache_snapshot()
        cache["run1"] = "/tmp/built-by-run-1"   # what a first run builds
        # a cache registered AFTER the snapshot (lazily imported module
        # mid-sweep, r14 advisor): identity pairing means it cannot
        # shift the alignment, and since it had no pre-run state its
        # snapshot state is empty — restore clears it
        late = thsa_io.register_dir_cache({})
        try:
            late["run1"] = "/tmp/built-mid-run"
            thsa_io.dir_cache_restore(snap)
            assert late == {}
        finally:
            thsa_io._dir_caches.remove(late)
        # inherited warmth preserved, this key's own build dropped
        assert cache == {"pre": "/tmp/built-by-an-earlier-key"}
        # every in-process fixture-dir cache is registered (the two
        # DataFrame memos are covered by the memo_backed contract)
        assert len(thsa_io._dir_caches) >= 17  # 16 package + this one
    finally:
        thsa_io._dir_caches.remove(cache)


def test_bench_stdout_emission_contract():
    """r14 verdict item 2: the driver parses the FINAL stdout JSON line
    into BENCH_rN.json's `parsed` section, so the last line bench
    emits must carry the full per-key map (the compact headline line
    comes first). Pin the contract on the factored emitter."""
    import importlib.util
    import json as _json
    import os

    spec = importlib.util.spec_from_file_location(
        "thsa_bench_emit",
        os.path.join(os.path.dirname(__file__), os.pardir, "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    summary = {
        "metric": "total_query_wall_clock",
        "value": 1.5,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": 2,
    }
    timings = {"agg_global": 0.5, "win_rank": 1.0}
    lines = bench.stdout_lines(summary, timings)
    assert len(lines) == 2
    first, last = (_json.loads(ln) for ln in lines)
    assert "queries" not in first and first["value"] == 1.5
    assert last["queries"] == timings          # every per-key wall
    assert last["n_queries"] == len(timings)   # ...on the LAST line


def test_lsh_topk5_broadcast_bucket_join_both_mask_branches(spark, sf_dir):
    """r14 verdict item 8: the shared `_lsh_topk5` chain must keep the
    bucket join broadcast on BOTH mask branches — the corpus side is
    never shuffled for candidate generation, and the probe-side xor
    expansion (multiprobe's only difference) widens the broadcast
    instead of adding an Exchange. Pin per branch: exactly ONE
    BroadcastHashJoin (the bucket join is the only join), ONE
    BroadcastExchange (probes built/shipped once, masks included), and
    exactly the two irreducible Exchanges (candidate-distinct
    partial/final boundary + the per-probe top-5 window) — identical
    between masks=(0,) and the Hamming-1 flip set, so the multiprobe
    recall knob provably costs zero extra shuffles at 100 TB."""
    import re

    from twitter_hashtag_sentiment_analysis_spark.registry import load_all

    reg = load_all()
    for key in ("sim_ann_lsh", "sim_ann_lsh_multiprobe"):
        plan = plan_of(spark, sf_dir, key)
        nodes = re.findall(r"^\(\d+\) (\w+)", plan, flags=re.M)
        assert nodes.count("BroadcastHashJoin") == 1, (key, plan)
        assert nodes.count("BroadcastExchange") == 1, (key, plan)
        assert not any("Join" in n and n != "BroadcastHashJoin" for n in nodes), (
            key,
            plan,
        )
        assert _n_exchanges(plan) == 2, (key, plan)
        # the top-5 window is group-limited (partial below the
        # exchange + final above), never a full per-probe sort
        assert nodes.count("WindowGroupLimit") == 2, (key, plan)
    # banding parity is structural (one chain), and so is the plan:
    # the multiprobe branch adds only the mask Generate + a Project
    base = re.findall(
        r"^\(\d+\) (\w+)", plan_of(spark, sf_dir, "sim_ann_lsh"), flags=re.M
    )
    multi = re.findall(
        r"^\(\d+\) (\w+)", plan_of(spark, sf_dir, "sim_ann_lsh_multiprobe"), flags=re.M
    )
    from collections import Counter

    diff = Counter(multi) - Counter(base)
    assert set(diff) <= {"Generate", "Project"}, diff


def test_fill_forward_is_generative_no_join_single_scan(spark, sf_dir):
    """r15: ts_fill_forward re-expressed generatively — each observed
    hour emits itself plus the silent hours up to the next observation
    — so the plan must have NO join, exactly ONE events scan (the old
    shape aggregated raw events twice: hourly + bounds), and only the
    two irreducible Exchanges (hourly pre-aggregate + the per-type
    window sort that serves both the carry and the lead)."""
    import re

    plan = plan_of(spark, sf_dir, "ts_fill_forward")
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, flags=re.M)
    assert not any("Join" in n for n in nodes), plan
    assert nodes.count("Scan") == 1, plan
    assert _n_exchanges(plan) == 2, plan


def test_groups_frame_single_shuffle(spark, sf_dir):
    """The GROUPS-frame composition (dense_rank + integer RANGE) must
    share ONE user_id Exchange across both windows — the rank window
    and the frame window repartitioning separately would double the
    only shuffle. The second Sort is an in-partition pass over runs
    the first already ordered (grp_rank order == day order)."""
    plan = plan_of(spark, sf_dir, "win_groups_frame")
    assert _n_exchanges(plan) == 1, plan
    assert len(re.findall(r"\) Window$", plan, re.M)) == 2, plan
