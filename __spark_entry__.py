"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``spark_text_clustering_spark`` (see SURVEY.md §2
for the operator inventory each key maps to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_text_clustering_spark.plans.flagship import flagship_top_terms_per_lang
from spark_text_clustering_spark.registry import ORACLES, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Per-language top-k term frequencies — the reference's vocabulary-build
    semantic core (SURVEY §7 M0) as one declarative plan.
    """
    return flagship_top_terms_per_lang(spark, SF0001)


def _driver_sample_history() -> dict[str, int]:
    """Map key -> highest round number whose committed CORRECTNESS_r*.json
    sampled it (absent = never driver-confirmed).

    The driver samples the first ~50 keys of queries() each round; after
    11 rounds only 81/291 registry keys had ever been driver-confirmed
    (VERDICT r11 "Next round" #2). Rotating never-sampled keys to the
    front of the dict spends each round's 50-key correctness budget on
    fresh keys; once every key has been sampled, least-recently-sampled
    ordering keeps the window cycling instead of re-confirming the same
    front forever.
    """
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            for k in data:
                last[k] = max(last.get(k, 0), rnd)
    return last


# Keys whose semantics/oracle CHANGED this round: re-sample even though a
# prior round already confirmed them (their old confirmation no longer
# evidences the current code). Leads the whole window.
_FORCE_RESAMPLE = [
    # r14: oracle now ranks on the rounded score on both sides (ADVICE r13)
    "search_tfidf_topk",
    "knn_cosine_gemm",
    # r14: oracle states the NULL policy explicitly (ADVICE r13)
    "freq_items_sketch",
    # r14 core-lite triage: plan changed (probe-side repartition /
    # id-only stored index) — re-evidence both under the new plans
    "dedup_fuzzy_levenshtein",
    "knn_cosine_lsh_stored",
    # r14 grain/memo/state-grain batch: results identical by design and
    # parity-verified, but the plans changed — re-evidence under them
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_shingle_containment",
    "dedup_fuzzy_jaro_winkler",
    "dedup_duplicate_spans",
    "dedup_duplicate_spans_strided",
    "udf_scalar_stem",
    "knn_cosine_lsh",
    "assoc_itemsets_fp",
    "heavy_hitters_window_stream",
    "stream_ewma_serving",
    "wordpiece_encode_corpus",
    "lang_id_trained",
    "quality_filter_lm_perplexity",
    # r14 session 2: word-base persistence made opt-in (plan of the
    # shared word table changed: artifact scan -> in-session build) and
    # the incremental replay's final union now threads per-batch frames
    "bpe_train_merges",
    "bpe_encode_corpus",
    "wordpiece_train_merges",
    "incremental_dedup_minhash",
    # r14 session 3: per-session artifact memos (IVF fit, PQ sample,
    # shared graph edge lists, streaming arrival staging) + PQ probe
    # grain — results parity-verified identical on fresh AND memo-hit
    # calls, but re-evidence under the new construct paths
    "knn_cosine_ivf",
    "knn_cosine_pq",
    "knn_cosine_ivfpq",
    "knn_cosine_pq_stored",
    "ann_recall_eval",
    "stream_lang_id_serving",
    "stream_drift_psi",
    "stream_ingest_dedup",
    "graph_pagerank",
    "graph_triangle_count",
    "graph_clustering_coefficient",
    "graph_kcore_peel",
    # r14 session 4: shared cluster-stage pair-graph memos — parity
    # verified fresh AND memo-hit; re-evidence under the new construct
    "dedup_cluster_best_quality",
    "split_assign_cluster_safe",
    "dedup_minhash_clusters",
    "dedup_minhash_clusters_twostar",
    # r14 session 5: the remaining keys whose physical-plan signature
    # moved this round (goldens regen diff — fewer exchanges from the
    # shared assoc/graph scans, 4 -> 2 Python stages from the staged
    # multimodal corpora); parity-verified, re-evidence under the plans
    "graph_degree_histogram",
    "assoc_copurchase_rules",
    "assoc_triple_rules",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_keyframe_select",
    "multimodal_mp4_frames",
    "pipeline_multimodal_stats",
    # r14 session 6: hash-min CC stride fusion (construct-time; labels
    # stride-invariant, parity-verified at sf0.001+sf0.01) and the
    # IVFPQ grouped-closure ADC (probe join removed; outputs verified
    # bit-equal) — re-evidence the consumers under the new paths
    "graph_connected_components",
    "dedup_transitive",
    "knn_cosine_ivfpq_stored",
]

# VERDICT r13 #1: spend the driver's ~50-key correctness budget on the
# largest never-sampled family blocks — graph, streaming, and TPC-H —
# ahead of the generic fresh tail, then the ML/flagship and incremental
# keys. Keys already sampled are filtered out at runtime, so this list
# only steers the never-sampled ordering.
_ROTATION_PRIORITY = [
    # graph family (operators/graph.py)
    "graph_pagerank",
    "graph_pagerank_personalized",
    "graph_label_propagation",
    "graph_triangle_count",
    "graph_kcore_peel",
    "graph_clustering_coefficient",
    "graph_link_prediction_jaccard",
    "graph_degree_histogram",
    "graph_connected_components",
    "graph_connected_components_twostar",
    "graph_bfs_hops",
    # streaming family (streaming/windows.py and friends)
    "stream_tumbling_agg",
    "stream_stream_join",
    "stream_static_join",
    "stream_heavy_hitters",
    "stream_heavy_hitters_sliding",
    "heavy_hitters_window_stream",
    "stream_drift_psi",
    "stream_ewma_serving",
    "stream_ingest_dedup",
    "stream_lang_id_serving",
    # TPC-H keys never yet sampled (operators/tpch_*.py)
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_check",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_quantity",
    "tpch_q19_disjunctive",
    "tpch_q20_dominant_supplier",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales",
    # flagship/ML and incremental keys rounding out the ~50 window
    "flagship_top_terms_sql",
    "tfidf_vectorize",
    "lda_topics",
    "lda_doc_report",
    "incremental_dedup_minhash",
    "dedup_minhash_clusters",
    "dedup_minhash_clusters_twostar",
    "recursive_cte_closure",
    "topk_per_group",
    "map_functions",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so keys never yet sampled by the driver's ~50-key
    correctness window come first (new-this-round and judge-named §2
    text keys leading, then registry order); previously-confirmed keys
    follow, least-recently-sampled first, so the window keeps cycling
    after full coverage is reached. Same key set as the registry either
    way.
    """
    last = _driver_sample_history()
    force = [k for k in _FORCE_RESAMPLE if k in QUERIES]
    prio = [
        k
        for k in _ROTATION_PRIORITY
        if k in QUERIES and k not in last and k not in force
    ]
    fresh = [
        k for k in QUERIES if k not in last and k not in prio and k not in force
    ]
    order = {k: i for i, k in enumerate(QUERIES)}
    rest = sorted(
        (k for k in QUERIES if k in last and k not in force),
        key=lambda k: (last[k], order[k]),
    )
    return {k: QUERIES[k] for k in (*force, *prio, *fresh, *rest)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per SQL-expressible query key."""
    return dict(ORACLES)
