"""Physical-plan audits: the scale properties documented in docs/SCALE.md
must be visible in .explain() output — pushdown, pruning, broadcast,
partial aggregation, TakeOrderedAndProject. Regressions here mean a query
silently fell off its 100 TB plan."""

import pytest

from spark_text_clustering_spark.registry import QUERIES

from .conftest import SF_ORACLE


def plan_of(spark, key: str) -> str:
    df = QUERIES[key](spark, SF_ORACLE)
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_scan_prunes_and_pushes(spark):
    plan = plan_of(spark, "scan_documents")
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,0)]" in plan
    # text column pruned from the scan
    assert "ReadSchema: struct<doc_id:bigint,lang:string,source:string,n_chars:bigint>" in plan


def test_filter_predicate_pushdown(spark):
    plan = plan_of(spark, "filter_predicate")
    assert "GreaterThan(l_quantity,45" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_topk_plans_take_ordered(spark):
    plan = plan_of(spark, "topk_order_limit")
    assert "TakeOrderedAndProject" in plan


def test_groupby_partial_aggregation(spark):
    plan = plan_of(spark, "groupby_two_keys")
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert plan.count("Arguments: hashpartitioning") == 1  # exactly one shuffle


def test_vocab_join_is_broadcast(spark):
    plan = plan_of(spark, "broadcast_join_inner")
    assert "BroadcastHashJoin" in plan


def test_anti_join_is_broadcast(spark):
    plan = plan_of(spark, "broadcast_join_anti")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_whole_stage_codegen_in_flagship(spark):
    df = QUERIES["flagship_top_terms"](spark, SF_ORACLE)
    cg = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
    assert "WholeStageCodegen" in cg  # codegen'd spans present
    # and the flagship's top-k pushes per-partition group limits below the
    # shuffle (partial WindowGroupLimit) — the scale-critical property
    plan = plan_of(spark, "flagship_top_terms")
    assert plan.count("WindowGroupLimit") >= 2  # partial + final


def test_window_rank_group_limit_pushdown(spark):
    plan = plan_of(spark, "window_rank")
    # rank<=10 filter pushes a per-partition group limit below the sort
    assert "WindowGroupLimit" in plan


def test_knn_broadcasts_queries_not_candidates(spark):
    plan = plan_of(spark, "knn_cosine_exact")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_observe_metrics(spark):
    """df.observe(): accumulator-style metrics piggyback on an action with
    no extra pass — the runtime-diagnostics counterpart of the reference's
    corpus summary prints (LDAClustering.scala:29-33)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from spark_text_clustering_spark.catalog import load_table

    obs = Observation("corpus_stats")
    docs = load_table(spark, SF_ORACLE, "documents").observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    docs.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_docs"] == 500
    assert got["total_chars"] > 0


def test_q1_pushdown_and_partial_agg(spark):
    plan = plan_of(spark, "tpch_q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # date filter reaches parquet
    assert "partial_sum" in plan  # map-side combine before the one shuffle


def test_q19_disjunction_pushed_to_both_scans(spark):
    # The classic Q19 optimizer property: column-local parts of the
    # cross-table OR are extracted and pushed below the join to each scan.
    plan = plan_of(spark, "tpch_q19_disjunctive")
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan  # lineitem side
    assert "EqualTo(p_brand,Brand#12)" in plan  # part side
    assert "BroadcastHashJoin" in plan


def test_chunking_is_shuffle_free(spark):
    # Chunk fan-out must stay narrow: no exchange anywhere in the plan.
    plan = plan_of(spark, "chunk_documents")
    assert "Exchange" not in plan


def test_not_in_plans_null_aware_anti_join(spark):
    plan = plan_of(spark, "anti_join_null_aware")
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


def test_q4_exists_plans_semi_join(spark):
    plan = plan_of(spark, "tpch_q4_priority_check")
    assert "LeftSemi" in plan


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """With a selective filter on the build side of a shuffle join,
    Catalyst injects a runtime Bloom filter (bloom_filter_agg on the
    build keys, might_contain on the probe scan) so probe rows that
    cannot join die before the exchange. At 100 TB this is the
    difference between shuffling the whole fact table and shuffling
    the ~matching slice; thresholds are lowered here only because the
    sf0.01 scan is below the production defaults."""
    from pyspark.sql import functions as F

    from spark_text_clustering_spark.catalog import load_table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        li = load_table(spark, SF_ORACLE, "lineitem")
        o = load_table(spark, SF_ORACLE, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("s"))
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        # the membership probe must sit on the fact side, before its exchange
        assert "l_orderkey" in next(
            l for l in plan.splitlines() if "might_contain" in l
        )
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_q8_dimensions_broadcast_facts_shuffle(spark):
    """Q8's 7-relation tree: every dimension (part/supplier/nation/region)
    must broadcast; only the two fact joins (orderkey, custkey) may
    shuffle. A dimension falling off the broadcast path multiplies
    exchange volume ~1000x at 100 TB."""
    plan = plan_of(spark, "tpch_q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 2


def test_q17_avg_subquery_decorrelated(spark):
    """Q17's correlated AVG must run as one per-part aggregate joined back
    (decorrelated), not as a per-row subquery: exactly one partial_avg
    aggregate pair in the plan."""
    plan = plan_of(spark, "tpch_q17_small_quantity")
    assert "partial_avg" in plan
    assert "Subquery" not in plan  # fully decorrelated, no rewrite residue


def test_q2_min_cost_correlation_is_aggregate_join(spark):
    """Q2's correlated MIN becomes aggregate + equality self-join; the
    supplier/nation/region dims broadcast."""
    plan = plan_of(spark, "tpch_q2_min_cost_supplier")
    assert "partial_min" in plan
    assert "BroadcastHashJoin" in plan


def test_q13_priority_filter_stays_in_join_condition(spark):
    """Q13: the o_orderpriority filter must live in the LEFT JOIN condition
    (not a post-filter), preserving customers with zero orders."""
    plan = plan_of(spark, "tpch_q13_customer_distribution")
    assert "LeftOuter" in plan
    # the priority predicate is pushed to the orders scan side of the
    # outer join (safe: it only restricts the preserved side's matches)
    assert "1-URGENT" in plan


def test_join_strategy_hints_honored(spark):
    """Strategy hints must override the planner's default choice: merge
    forces SortMergeJoin and shuffle_hash forces ShuffledHashJoin even on
    broadcastable inputs. At 100 TB hints are the escape hatch when stats
    mislead AQE (e.g. a 'small' side that explodes after a filter)."""
    from spark_text_clustering_spark.catalog import load_table

    li = load_table(spark, SF_ORACLE, "lineitem")
    s = load_table(spark, SF_ORACLE, "supplier")

    merged = li.join(s.hint("merge"), li.l_suppkey == s.s_suppkey)
    plan = spark._jvm.PythonSQLUtils.explainString(
        merged._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan

    hashed = li.join(s.hint("shuffle_hash"), li.l_suppkey == s.s_suppkey)
    plan = spark._jvm.PythonSQLUtils.explainString(
        hashed._jdf.queryExecution(), "formatted"
    )
    assert "ShuffledHashJoin" in plan and "BroadcastHashJoin" not in plan


def test_prepare_corpus_single_shuffle(spark):
    """The composite corpus-prep plan must have exactly ONE exchange (the
    dedup window on sha256(text)); filters, chunk fan-out, and token
    counts are all narrow. A second exchange would mean a stage boundary
    snuck between pipeline steps."""
    plan = plan_of(spark, "pipeline_prepare_corpus")
    assert plan.count("Arguments: hashpartitioning") == 1


def test_shard_assign_is_shuffle_free(spark):
    """Seeded shuffle-sharding must be a narrow map over the scan — the
    whole point vs ORDER BY rand() is that NO exchange happens; writing
    .partitionBy(shard) afterwards is the only data movement."""
    plan = plan_of(spark, "shard_assign_shuffle")
    assert "Exchange" not in plan
    # column pruning: only doc_id read
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_mixture_sample_is_shuffle_free(spark):
    plan = plan_of(spark, "mixture_sample_by_source")
    assert "Exchange" not in plan
    assert "ReadSchema: struct<doc_id:bigint,source:string>" in plan


def test_pack_sequences_single_shuffle(spark):
    """Packing shuffles exactly once (on the shard key, for the per-shard
    running-sum window); the token count and shard derivation are narrow."""
    plan = plan_of(spark, "pack_sequences_budget")
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "Window" in plan


def test_train_ready_two_shuffles(spark):
    """The full train-ready composite (filter → dedup → chunk → shard →
    pack) must plan exactly TWO exchanges: the sha256 dedup window and the
    per-shard packing window. Everything else is narrow."""
    plan = plan_of(spark, "pipeline_train_ready")
    assert plan.count("Arguments: hashpartitioning") == 2


def test_keyless_asof_is_hash_join_on_bucket(spark):
    """The bucket±1 trick must plan as a hash join on the bucket key —
    never a cartesian/broadcast-nested-loop (the key-less naive form)."""
    plan = plan_of(spark, "join_asof_keyless_bucketed")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_heavy_hitters_verify_agg_is_filtered(spark):
    """The exact-verify aggregation must scan with the candidate IN-filter
    applied (only candidate-token rows reach the groupBy shuffle)."""
    from spark_text_clustering_spark.registry import QUERIES as Q

    df = Q["heavy_hitters_cms"](spark, SF_ORACLE)
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "token" in plan and "IN" in plan.upper()


def test_bloom_prune_semi_join_is_broadcast(spark):
    """After the map-side Bloom prefilter, the false-positive-killing semi
    join must broadcast the (tiny, filtered) dim — the probe side is the
    prefiltered stream, and no full-fact shuffle join appears."""
    plan = plan_of(spark, "bloom_semi_join_prune")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_weighted_reservoir_is_take_ordered(spark):
    """A-ES weighted sampling must plan TakeOrderedAndProject (per-
    partition heaps), never a single-partition global window/sort."""
    plan = plan_of(spark, "sample_weighted_reservoir")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_quality_filter_thresholds_broadcast(spark):
    """Round 5: the per-lang percentile thresholds must come back as a
    BROADCAST join (the threshold table is languages-sized), with the
    metric map's partial aggregation feeding the percentile."""
    plan = plan_of(spark, "quality_filter_per_lang")
    assert "BroadcastHashJoin" in plan
    assert "partial_percentile" in plan  # map-side partial for the quantile agg


def test_stream_heavy_hitters_single_count_shuffle(spark):
    """Round 5: the batch form of the windowed heavy-hitters transform is
    counts + a broadcast-joined per-window total — the per-key count
    aggregation must be map-side partial."""
    plan = plan_of(spark, "stream_heavy_hitters")
    assert "partial_count" in plan


def test_duplicate_spans_shuffles_hashes_not_grams(spark):
    """Round 5: the duplicated-span detector's dup-gram aggregate must key
    on the 8-byte xxhash64, not the 30-char gram string — the exchange
    carries (gh, doc_id), never text. Audited on the PRE-checkpoint gram
    plan (the registered query memoizes the materialized frame, which
    hides the expression behind an ExistingRDD scan)."""
    from pyspark.sql import functions as F

    from spark_text_clustering_spark.operators.dedup import _span_grams
    from .conftest import SF_ORACLE

    grams = _span_grams(spark, SF_ORACLE)
    agg = grams.groupBy("gh").agg(F.count_distinct("doc_id").alias("nd"))
    plan = spark._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "formatted"
    )
    assert "xxhash64" in plan
    assert "hashpartitioning(gh" in plan
    assert "gram" not in plan  # no string gram column anywhere in the plan


def test_quality_gate_single_tiny_shuffle(spark):
    """Round 5: the fused quality gate computes every per-doc signal
    in-row (incl. the dup-line fraction via sorted adjacency), so the
    ONLY repartitioning exchange is the languages-keyed percentile agg;
    the thresholds come back broadcast."""
    plan = plan_of(spark, "pipeline_quality_gate")
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan


def test_lang_id_trained_scoring_is_one_pivot_shuffle(spark):
    """Round-6 trained lang-ID: after the model memo, the scoring plan is
    ONE broadcast model join + ONE map-side-combined per-doc pivot
    aggregate — no doc×lang grid, no window, no second data shuffle
    (the raw-text repartition before the amplifying explode is the only
    other exchange)."""
    plan = plan_of(spark, "lang_id_trained")
    assert "BroadcastHashJoin" in plan  # model join is broadcast
    assert "partial_sum" in plan  # pivot agg combines map-side
    assert "Window" not in plan  # argmax is an inline CASE, not row_number
    # exchanges: the pre-explode text spread (round-robin), the per-doc
    # aggregate, and the doc-keyed join of scores back to docs
    assert plan.count("Arguments: hashpartitioning") <= 2


def test_minhash_fast_shuffles_longs_not_shingles(spark):
    """The JVM banding twin's exchanges must carry hashed longs (band
    keys, signature arrays), never shingle strings: no string column in
    any hashpartitioning argument."""
    import re

    plan = plan_of(spark, "dedup_minhash_fast")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    for m in re.finditer(r"Arguments: hashpartitioning\(([^)]*)\)", plan):
        args = m.group(1)
        assert "shingle" not in args and " s#" not in args, args


def test_lm_quality_gate_threshold_broadcast(spark):
    """The perplexity gate's per-lang cuts join back via broadcast — the
    languages-sized threshold frame must never shuffle the score frame
    for the final filter."""
    plan = plan_of(spark, "quality_filter_lm_perplexity")
    assert "BroadcastHashJoin" in plan


def test_kmeans_assign_broadcasts_centroids(spark):
    """Lloyd assignment: the k centroid rows broadcast; the only
    hash-exchange is the per-vector rank."""
    plan = plan_of(spark, "kmeans_assign_exact")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Arguments: hashpartitioning") == 1  # the argmin window


def test_spread_conditional_on_partition_grain(spark):
    """catalog.spread (round 14): a frame whose planned parallelism is
    below the session cores gets repartitioned to them; a frame already
    at/above natural grain is returned UNTOUCHED (no exchange at scale —
    the conditional is the whole point of the idiom)."""
    from spark_text_clustering_spark.catalog import spread

    p = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    widened = spread(spark, narrow)
    assert widened.rdd.getNumPartitions() == p
    assert widened.count() == 1000

    wide = spark.range(1000).repartition(p + 4)
    same = spread(spark, wide)
    assert same is wide  # no-op object identity: no plan node added
