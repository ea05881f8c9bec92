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
    "freq_items_sketch",  # r13: rows-only -> candidate+exact-verify oracle
]

# VERDICT r12 #1: spend the driver's ~50-key correctness budget on the
# never-sampled LLM-pipeline flagships (the north-star family) before the
# generic never-sampled tail — dedup, ANN, text-stats, multimodal,
# traindata/containment, and sketches, in the judge's named order.
_ROTATION_PRIORITY = [
    "dedup_exact_hash",
    "dedup_minhash",
    "dedup_duplicate_spans",
    "knn_cosine_exact",
    "text_stats_agg",
    "multimodal_image_decode",
    "multimodal_features",
    "shard_assign_shuffle",
    "pack_sequences_budget",
    "heavy_hitters_cms",
    "bloom_semi_join_prune",
    # traindata / containment family (VERDICT r12 #1 tail)
    "dedup_shingle_containment",
    "dedup_cluster_best_quality",
    "dedup_containment_filter",
    "split_assign_cluster_safe",
    "mixture_sample_by_source",
    "mixture_temperature_weights",
    "mixture_epoch_schedule",
    "layout_zorder_key",
    "layout_hilbert_key",
    "sample_weighted_reservoir",
    "pipeline_train_ready",
    # remaining dedup family
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_minhash_fast",
    "dedup_boilerplate_lines",
    "dedup_duplicate_spans_strided",
    "dedup_duplicate_spans_segmented",
    "dedup_embedding_cosine",
    "dedup_fuzzy_levenshtein",
    "dedup_fuzzy_jaro_winkler",
    "dedup_transitive",
    # similarity / embeddings
    "knn_cosine_gemm",
    "knn_cosine_lsh",
    "knn_cosine_ivf",
    "embedding_quantize_int8",
    "kmeans_assign_exact",
    # text analysis / quality
    "lang_id_heuristic",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "html_strip",
    "pii_mask",
    "chunk_documents",
    "ngram_bigram_counts",
    "contamination_ngram_overlap",
    "contamination_filter_clean",
    "search_tfidf_topk",
    "search_bm25_scores",
    "topk_per_group",
    "url_parse_domains",
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
