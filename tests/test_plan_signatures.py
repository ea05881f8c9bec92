"""Physical-plan SIGNATURE regression harness (round 6).

test_plans.py asserts hand-picked properties of ~40 plans; this harness
complements it with a broad, automatic tripwire: for a battery of
stable registered keys, extract a structural signature of the physical
plan (join strategies, exchange count, window/codegen presence, Python
stages) and diff it against the committed goldens in
``goldens/plan_signatures.json``.

A signature change is not automatically a bug — Spark upgrades and
deliberate rewrites move plans — but it must be a CONSCIOUS change:
regenerate the goldens with

    python -m tests.test_plan_signatures   # rewrites the goldens file

and commit the diff alongside the code that caused it. What this
catches: a lost broadcast (dim outgrew the threshold estimate), a new
unplanned exchange, a filter that stopped pushing down far enough to
keep codegen fused, a Python stage sneaking into a JVM-only plan.

Keys whose callables RUN work at construction (streaming replays,
iterative trainers) are excluded — their plan is not the interesting
artifact and building it is expensive.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from .conftest import SF_SMALL

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "plan_signatures.json")

# stable, construction-cheap keys spanning every operator family
AUDITED_KEYS = [
    "flagship_top_terms",
    "scan_documents",
    "filter_predicate",
    "groupby_two_keys",
    "topk_order_limit",
    "window_running_sum",
    "rollup_agg",
    "join_inner_shuffle",
    "join_range_theta",
    "join_asof",
    "broadcast_join_inner",
    "broadcast_join_anti",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q17_small_quantity",
    "tpch_q19_disjunctive",
    "json_extract",
    "date_trunc_agg",
    "dedup_exact_hash",
    "dedup_ngram_jaccard",
    "dedup_boilerplate_lines",
    "dedup_semantic_kmeans",
    "knn_cosine_exact",
    "kmeans_assign_exact",
    "embedding_centroid_per_label",
    "quality_filter_per_lang",
    "quality_dup_line_fraction",
    "pipeline_quality_gate",
    "chunk_documents",
    "ngram_bigram_counts",
    "bpe_pair_counts",
    "contamination_ngram_overlap",
    "shard_assign_shuffle",
    "pack_sequences_budget",
    "mixture_sample_by_source",
    "mixture_temperature_weights",
    "layout_zorder_key",
    "sample_weighted_reservoir",
    "ngram_lm_score",
    "search_bm25_scores",
    "funnel_conversion",
    "retention_cohort",
    "time_bucket_15min",
    "merge_full_clauses",
    "window_zscore_sql",
    "multimodal_mp4_meta",
    "multimodal_mp4_frames",
    "multimodal_mp4_avc_meta",
    "multimodal_mp4_hevc_meta",
    "multimodal_audio_spectral",
    "text_stats_agg",
    "lang_id_heuristic",
    "token_count",
    "doc_fingerprint",
    "scd2_point_in_time_join",
]


def plan_signature(plan: str) -> dict:
    """Structural fingerprint of a formatted physical plan. Counts the
    operators whose presence/number encodes the scale design; ignores
    ids, column numbers, and sizes, which churn harmlessly."""
    return {
        "exchanges_hash": len(re.findall(r"Arguments: hashpartitioning", plan)),
        "exchanges_range": len(re.findall(r"Arguments: rangepartitioning", plan)),
        "exchanges_single": len(re.findall(r"Arguments: SinglePartition", plan)),
        "broadcast_hash_join": plan.count("BroadcastHashJoin"),
        "broadcast_nl_join": plan.count("BroadcastNestedLoopJoin"),
        "sort_merge_join": plan.count("SortMergeJoin"),
        "shuffled_hash_join": plan.count("ShuffledHashJoin"),
        "window": len(re.findall(r"\bWindow\b", plan)),
        "take_ordered": plan.count("TakeOrderedAndProject"),
        "python_stages": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        # NOTE: no codegen-span metric — under AQE the pre-execution
        # formatted plan carries no codegen ids; test_plans.py asserts
        # codegen fusion where it matters, on the plans that show it
        "expand": plan.count("Expand"),  # rollup/cube/grouping sets
        "generate": plan.count("Generate"),  # explode family
        "cartesian": plan.count("CartesianProduct"),  # must stay 0
    }


def _current_signatures(spark) -> dict:
    from spark_text_clustering_spark.registry import QUERIES

    out = {}
    for key in AUDITED_KEYS:
        df = QUERIES[key](spark, SF_SMALL)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out[key] = plan_signature(plan)
    return out


def test_plan_signatures_match_goldens(spark):
    assert os.path.exists(GOLDEN_PATH), (
        "no committed plan goldens — regenerate with "
        "`python -m tests.test_plan_signatures`"
    )
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    got = _current_signatures(spark)
    diffs = []
    for key in AUDITED_KEYS:
        if key not in golden:
            diffs.append(f"{key}: missing from goldens (regenerate)")
            continue
        if got[key] != golden[key]:
            changed = {
                k: (golden[key].get(k), got[key][k])
                for k in got[key]
                if golden[key].get(k) != got[key][k]
            }
            diffs.append(f"{key}: {changed}")
    assert not diffs, (
        "physical-plan signatures changed (golden, current); if deliberate, "
        "regenerate goldens and commit:\n" + "\n".join(diffs)
    )


# keys whose plan legitimately contains a BroadcastNestedLoopJoin: every
# one is a deliberately BROADCAST-BOUNDED cross join (a model-sized side
# ships to executors — the documented ANN/theta-join design), never an
# unbounded big x big product
_BNLJ_WHITELIST = {
    "knn_cosine_exact",  # 20-row broadcast query set x corpus
    "join_range_theta",  # range-theta join: broadcast side is the dim
    "kmeans_assign_exact",  # k=8 centroid rows broadcast x corpus
    "search_bm25_scores",  # broadcast query-term rows x posting lists
    "funnel_conversion",  # three 1-row step aggregates cross-joined
    # k=8 broadcast centroid rows x corpus; the assignment subplan (one
    # bounded crossJoin) recurs in each branch (pair sides + anti-join)
    "dedup_semantic_kmeans",
}


def test_no_unbounded_products(spark):
    """Hard anti-pattern gate (round 7): no audited plan may contain a
    CartesianProduct, and BroadcastNestedLoopJoin only where the design
    broadcasts a model-sized side (whitelist above). A CartesianProduct
    at 100 TB is |left|x|right| — always a bug in this engine."""
    got = _current_signatures(spark)
    offenders = {k: s["cartesian"] for k, s in got.items() if s["cartesian"]}
    assert not offenders, f"CartesianProduct in plans: {offenders}"
    bad_bnlj = {
        k: s["broadcast_nl_join"]
        for k, s in got.items()
        if s["broadcast_nl_join"] and k not in _BNLJ_WHITELIST
    }
    assert not bad_bnlj, (
        f"unexpected BroadcastNestedLoopJoin (bounded-by-design? add to "
        f"whitelist with rationale): {bad_bnlj}"
    )


if __name__ == "__main__":  # regenerate the goldens
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spark_text_clustering_spark.session import get_session

    spark = get_session("plan-goldens", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(_current_signatures(spark), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {GOLDEN_PATH}")
    spark.stop()
