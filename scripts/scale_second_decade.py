"""Second-decade scale point for the pair-space families (round 7,
VERDICT r6 directive #6).

The COVERAGE.md linearity claim for the quadratic-risk families (minhash
banding, span dedup, stored ANN probes) rested on ONE measured decade
(sf0.01 → sf0.1). This script synthesizes a seeded ~10× sf0.1 corpus —
documents replicated 10× with per-replica perturbation (every replica
gets a replica-tagged token injected at a deterministic position, so
replicas are NEAR-duplicates: exactly the adversarial regime for the
banding/span machinery — pair-space grows 100×, output must grow ~10×)
and embeddings replicated 10× with seeded noise + renorm — then times
the three keys at sf0.1 and at the synthetic decade, one fresh session
per (sf, key) so every number is a cold first call (index/Bloom build
included; the memoized fast paths would otherwise hide the build term).

Usage: python scripts/scale_second_decade.py [out_dir]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF01 = "/root/testdata/sf0.1"
WARM_SF = "/root/testdata/sf0.001"  # smallest tier, used only by warm_jvm
KEYS = [
    "dedup_duplicate_spans_strided",
    "dedup_minhash_fast",
    "knn_cosine_ivfpq_stored",
    # round 10 (VERDICT r9 #5): the clustering consumer on the same synth
    # corpus — replicas are near-dups of their original, so every
    # original doc becomes a ~10-replica near-dup CLIQUE: the pair graph
    # grows ~45× (10C2 intra-group pairs) while components grow only as
    # the original doc count — the adversarial densest-graph regime for
    # the CC step, with diameter pinned at 1 (cliques)
    "dedup_minhash_clusters",
    # round 10: the three new pair-space consumers. The replica corpus is
    # adversarial for all three the same way: every doc group becomes a
    # ~10-member near-dup clique, so the shingle-join candidate space and
    # the Jaccard pair graph grow ~1-2 orders beyond the 10x data growth
    "dedup_shingle_containment",
    "dedup_cluster_best_quality",
    "split_assign_cluster_safe",
    # round 10: tokenizer-trainer claim check — the corpus is scanned
    # once (word counts) and every merge iteration is vocab-sized, so
    # cold time should grow far slower than 10x (the replica corpus
    # barely grows the DISTINCT-word vocabulary: replicas repeat words)
    "wordpiece_train_merges",
    # round 11: snapshot diff — doc_id offsets (1e6 multiples) preserve
    # doc_id % 10, so every status class scales exactly 10x; the added-
    # row offset is 1e9, disjoint from the replica id space by design.
    # Expect ~linear: one co-partitioned full-outer join, no pair space
    "table_diff_snapshot",
    # round 11d: zero-shuffle row-side trigram stats — the replica splice
    # token adds 3 fresh trigrams per replica doc, so dup_frac output
    # changes but the plan is one map stage over 10x docs (expect ~linear
    # with no shuffle term at all)
    "quality_ngram_diversity",
    # round 11e: 10x videos, each decoded frame-by-frame in the Arrow
    # map — pure CPU decode, one row out per video (expect ~linear)
    "multimodal_keyframe_select",
    # round 11e: replica src0 docs stay in the bench source, so the
    # broadcast bench shingle set grows only by the splice tokens while
    # the candidate side grows 10x (expect ~linear, no pair blowup:
    # the join key is the shingle against a ~fixed broadcast set)
    "contamination_filter_clean",
    # round 11e: 10x token-count scan under a CONSTANT 20-source policy
    # frame (expect scan-linear, flat tail)
    "mixture_epoch_schedule",
    # round 11e: row-side codegen regexp scan (the HOF token-lambda form
    # measured 3.1/28.2 s and was replaced; expect ~linear, sub-second)
    "search_phrase_match",
    # round 12: the ANN eval harness — four index builds + exact baseline
    # per call, then KB-sized recall joins. The 10x embedding corpus
    # grows every build's input 10x but the query set stays N_QUERIES
    # (vec_id < N_QUERIES lands in replica 0); expect build-dominated
    # ~linear, nothing pairwise (each method is already bucketed)
    "ann_recall_eval",
    # round 12: the unknown-diameter two-star CC kernel on the replica
    # corpus's near-dup cliques — same ~45x pair-graph growth regime as
    # dedup_minhash_clusters, with diameter pinned at 1, so the star
    # rounds should stay CONSTANT while the edge frames grow
    "dedup_minhash_clusters_twostar",
    # round 12: three scan-shaped keys — INSET token filter with the
    # full 119-word reference list (expect ~linear, the probe is O(1)
    # per token), the German flagship (lang='de' pushed to the scan, so
    # only 1/5 of the 10x rows survive the filter), and the Gopher rule
    # battery (one projection off one tokens array; expect ~linear,
    # zero shuffle)
    "stopword_filter_reference",
    "flagship_top_terms_de",
    "quality_gopher_rules",
    # round 13 (VERDICT r12 #5): the lang-ID eval harness — train the
    # char-NB model (sample-bounded fit), score 10x docs, then a 5-row
    # per-language P/R/F1 aggregate. Expect: scoring pass ~linear in
    # docs, the confusion aggregate flat (5 languages regardless of
    # corpus size)
    "lang_id_confusion_eval",
    # round 14 (VERDICT r13 #4): the fitted-pipeline search key — the
    # 10x corpus refits CountVectorizer+IDF, but the vocabulary is
    # bounded by construction: replicas repeat their original's words
    # (only 9 fresh repl{r}tok tokens enter), the vocab stays capped at
    # 10k, and the query side is 3 fixed strings, so the term-match join
    # carries |query terms| x docs-containing-them, not a pair space.
    # Expect ~linear (fit scan + per-term postings growth), top-5 output
    # unchanged in size
    "search_tfidf_topk",
    # round 14: exact blocked GEMM — queries stay vec_id < N_QUERIES
    # (replica 0), candidates grow 10x, so the matmul FLOPs and the
    # rank shuffle (|queries| x k) grow exactly 10x / not at all.
    # Expect ~linear, build-free (no index)
    "knn_cosine_gemm",
]


def synthesize(out_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(f"{SF01}/documents.parquet").to_pandas()
    n = len(docs)
    reps = []
    for r in range(10):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * 1_000_000
        if r > 0:
            # perturb: splice a replica-tagged token into the middle of
            # the text — replicas stay ~99% Jaccard-similar (near-dups,
            # and every >=30-char window away from the splice is a
            # duplicated span), deterministic, no RNG needed
            mid = d["text"].str.len() // 2
            d["text"] = [
                (t[:m] + f" repl{r}tok " + t[m:]) if isinstance(t, str) else t
                for t, m in zip(d["text"], mid)
            ]
        reps.append(d)
    import pandas as pd

    big = pd.concat(reps, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
                   f"{out_dir}/documents.parquet")

    emb = pq.read_table(f"{SF01}/embeddings.parquet").to_pandas()
    rng = np.random.default_rng(7)
    ereps = []
    for r in range(10):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + r * 1_000_000
        if r > 0:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float32) for v in e["embedding"]]
            )
            vecs = vecs + rng.normal(0, 0.05, vecs.shape).astype(np.float32)
            e["embedding"] = [v for v in vecs]
        ereps.append(e)
    bige = pd.concat(ereps, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(bige, preserve_index=False),
                   f"{out_dir}/embeddings.parquet")
    print(json.dumps({"synth": out_dir, "docs": len(big), "vecs": len(bige)}),
          flush=True)


TPCH_KEYS = [
    # round 7b: the iterative-graph and basket families get their second
    # decade too — 10 disjoint replicas (all key columns offset) grow
    # nodes/edges/baskets exactly 10x, the honest linear-scale-up regime
    "graph_pagerank",
    "assoc_copurchase_rules",
    # round 7c: the new graph/basket/time-series keys. Replica notes:
    # custkey offsets preserve custkey % 10, so the PPR seed set scales
    # 10x; partkey offsets are multiples of 100, so the triple-rules
    # category space (l_partkey % 100) is unchanged and supports grow
    # 10x; part replicas keep their brands, and since edges only form
    # within an order (orders are replica-disjoint), intra-brand blocks
    # hold 10 disjoint subgraphs — triangles grow exactly 10x
    "graph_label_propagation",
    "graph_pagerank_personalized",
    "graph_kcore_peel",
    "graph_triangle_count",
    "assoc_triple_rules",
    "timeseries_ewma",
    "concurrency_sweepline",
    # round 9 (VERDICT r8 #4): the CC key walks the same brand-blocked
    # graph as the triangle family — replicas keep their brands and are
    # key-disjoint, so components grow exactly 10x with UNCHANGED
    # diameter: the O(diameter)-rounds claim predicts ~linear cold time
    "graph_connected_components",
    # round 9: the star kernel on the same graph — replicas keep the
    # diameter unchanged, so round count should be IDENTICAL at both
    # scales (the log bound depends on n only through path-halving,
    # and brand components converge in 5 rounds at sf0.1 already)
    "graph_connected_components_twostar",
    # round 11: hot-split join — orderkey offsets are multiples of 1e8
    # (≡ 0 mod 5), so EVERY replica's ~60% slice still collapses onto
    # global key 1: the hot key grows 10x rows while the dim row count
    # grows 10x with the hot slice still 1 row. The broadcast path must
    # absorb a 10x-heavier hot key with no reducer owning it — the
    # exact regime the operator exists for
    "join_skew_hot_split",
    # round 11: user_id offsets make replica users disjoint — sessions
    # and paths grow exactly 10x on one user_id exchange (expect ~linear)
    "sessionize_paths_topk",
    # round 11: values are replicated verbatim, so the DISTINCT-value
    # frame the cumulative window runs over is UNCHANGED at 10x — only
    # the map-side-combinable value-groupBy sees 10x rows (expect
    # sublinear: flat window term + linear scan term)
    "stats_ks_exact",
    # round 11b: k event-type groups unchanged at 10x rows — one grouped
    # moment agg + k-row reduction (expect ~linear scan term)
    "stats_anova_oneway",
    # round 11b: l_returnflag groups unchanged; the exact percentile_disc
    # buffers per-group values, the stated scale seam (approx swap named
    # in the docstring) — the decade ratio is the evidence for that note
    "winsorize_clip_group",
    # round 11c: 5 series x 10x rows — one per-series window sort plus a
    # map-side corr agg (expect ~linear)
    "timeseries_acf",
    # round 11c: same one-grouped-moment-agg spine as anova; the pair
    # frame is k(k-1)/2 rows regardless of data size (expect ~flat)
    "stats_pairwise_contrasts",
    # round 11c: replica users are disjoint, purchases and lookback
    # windows scale 10x on one user-co-partitioned join (expect ~linear)
    "attribution_last_touch",
    # round 11d: part replicas KEEP their brands, so each brand block
    # holds 10 disjoint subgraphs but still ONE landmark (the global min
    # part id lands in replica 0) — the BFS frontier and reached set are
    # UNCHANGED at 10x while the edge side of every per-round join grows
    # 10x: this decade isolates the join's edge-scan term (expect
    # sublinear; the settled/anti-join side is constant)
    "graph_bfs_hops",
    # round 11d: l_returnflag groups unchanged at 10x rows — two
    # per-group rank windows on ONE exchange, so the decade measures the
    # per-group sort term (expect ~linear-with-sort)
    "stats_spearman_corr",
    # round 11d: values replicated verbatim into the SAME hour buckets —
    # the hourly frame, MA window, and output are all UNCHANGED at 10x;
    # only the first grouped agg scans 10x rows (expect sublinear)
    "timeseries_seasonal_hour",
    # round 11d: fixed 7x4-ish grid unchanged — one map-side-combined
    # count agg over 10x rows, everything after is grid-sized (expect
    # ~linear scan term, flat tail)
    "stats_cramers_v",
    # round 11d: user offsets make replica users disjoint — 10x keys at
    # unchanged per-key counts, so the key-frame window sorts 10x rows
    # (still keys, not events; expect ~linear on the key frame)
    "profile_key_skew",
    # round 11d: the B=100 explode rides the scan (codegen integer LCG,
    # no shuffle until the B-row partial aggs) — expect ~linear in rows;
    # replicas shift event_id so every replica draws FRESH weights
    "stats_bootstrap_ci",
    # round 11e: replica users are disjoint — 10x (user, type) streams of
    # unchanged length on one window exchange, then the exact disc
    # quantiles buffer per-GROUP gaps (k groups fixed; expect ~linear)
    "timeseries_interarrival",
    # round 12: Brown-Forsythe — one group-sized median agg (exact
    # percentile_disc buffers per-group values, same seam as winsorize)
    # broadcast back + one map-side-combined moment agg; k event-type
    # groups unchanged at 10x rows (expect ~linear with the disc-buffer
    # term, mirroring winsorize's 1.3x)
    "stats_levene_brownforsythe",
    # round 14 (VERDICT r13 #4): the freqItems candidate -> exact-verify
    # sketch. event_type values replicate verbatim (proportions
    # unchanged -> same survivors x 10x counts); replica user_ids are
    # disjoint, so each user's share drops 10x and the user_id column's
    # >10% set goes empty — the verify pass then carries only the
    # event_type candidates. Expect ~linear: two scans (sketch +
    # verify), both map-side combined, candidate IN-list stays <= 10
    "freq_items_sketch",
]


def synthesize_tpch(out_dir: str) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    orders = pq.read_table(f"{SF01}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF01}/lineitem.parquet").to_pandas()
    oreps, lreps = [], []
    for r in range(10):
        o = orders.copy()
        o["o_orderkey"] = o["o_orderkey"] + r * 100_000_000
        o["o_custkey"] = o["o_custkey"] + r * 1_000_000
        oreps.append(o)
        l = li.copy()
        l["l_orderkey"] = l["l_orderkey"] + r * 100_000_000
        l["l_partkey"] = l["l_partkey"] + r * 1_000_000
        lreps.append(l)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(oreps, ignore_index=True), preserve_index=False),
        f"{out_dir}/orders.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(pd.concat(lreps, ignore_index=True), preserve_index=False),
        f"{out_dir}/lineitem.parquet",
    )
    # round 7c: part (brand blocking for triangles) and events (EWMA /
    # sweep line) replicas — same disjoint-offset regime
    part = pq.read_table(f"{SF01}/part.parquet").to_pandas()
    preps = []
    for r in range(10):
        p = part.copy()
        p["p_partkey"] = p["p_partkey"] + r * 1_000_000
        preps.append(p)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(preps, ignore_index=True), preserve_index=False),
        f"{out_dir}/part.parquet",
    )
    ev = pq.read_table(f"{SF01}/events.parquet").to_pandas()
    ereps2 = []
    for r in range(10):
        e = ev.copy()
        e["event_id"] = e["event_id"] + r * 100_000_000
        e["user_id"] = e["user_id"] + r * 1_000_000
        ereps2.append(e)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(ereps2, ignore_index=True), preserve_index=False),
        f"{out_dir}/events.parquet",
    )
    print(json.dumps({"synth_tpch": out_dir, "orders": len(oreps) * len(orders),
                      "lineitem": len(lreps) * len(li)}), flush=True)


def warm_jvm() -> None:
    """One throwaway session + tiny job before ANY measurement: the first
    Spark job in a fresh JVM pays process-global warmup (class loading,
    codegen infrastructure) that later sessions in the same process never
    see. Round-11 finding: the FIRST measured key of every prior run ate
    that cost in its sf0.1 number (join_skew_hot_split measured 9.9 s
    first-in-process vs 2.4 s on an identical fresh session right after),
    deflating its ratio. Per-key sessions below stay fresh, so every
    number remains a cold FIRST CALL of its session — just not of the
    JVM."""
    from pyspark.sql import functions as F

    from spark_text_clustering_spark.catalog import load_table
    from spark_text_clustering_spark.session import get_session

    spark = get_session("scale-warm", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).groupBy(F.col("id") % 10).count().collect()
    # a range groupBy alone leaves the parquet datasource + aggregate
    # codegen classes cold and the first real key still pays ~2 s
    # (round-11 re-measure: anova 3.1 s first vs 1.0-1.3 s after) — touch
    # the real read + agg + join paths on the smallest available tables
    # (fall back to SF01 itself if the tiny tier isn't on this host; the
    # warmup then costs a few seconds more but the run doesn't die)
    sf = WARM_SF if os.path.exists(f"{WARM_SF}/events.parquet") else SF01
    ev = load_table(spark, sf, "events")
    ev.groupBy("event_type").agg(F.avg("value"), F.count(F.lit(1))).collect()
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).groupBy(
        "o_orderstatus"
    ).count().collect()
    spark.stop()


def time_key(key: str, sf_dir: str) -> float:
    from spark_text_clustering_spark.registry import QUERIES
    from spark_text_clustering_spark.session import get_session

    spark = get_session(f"scale-{key}", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    QUERIES[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.stop()
    return dt


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    # optional second arg: comma-separated key filter (round 10 — lets a
    # round measure only its new keys instead of re-running every family)
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    global TPCH_KEYS, KEYS
    if only is not None:
        unknown = only - set(TPCH_KEYS) - set(KEYS)
        if unknown:  # a typo'd filter must fail loudly, not "measure" nothing
            raise SystemExit(f"unknown keys in filter: {sorted(unknown)}")
        TPCH_KEYS = [k for k in TPCH_KEYS if k in only]
        KEYS = [k for k in KEYS if k in only]
    if not os.path.exists(f"{out_dir}/documents.parquet"):
        synthesize(out_dir)
    if not os.path.exists(f"{out_dir}/events.parquet"):
        synthesize_tpch(out_dir)
    warm_jvm()
    for key in TPCH_KEYS:
        t_small = time_key(key, SF01)
        t_big = time_key(key, out_dir)
        print(
            json.dumps(
                {
                    "key": key,
                    "sf0.1_cold_sec": round(t_small, 2),
                    "sf1_synth_cold_sec": round(t_big, 2),
                    "ratio_at_10x": round(t_big / t_small, 2),
                }
            ),
            flush=True,
        )
    for key in KEYS:
        t_small = time_key(key, SF01)
        t_big = time_key(key, out_dir)
        print(
            json.dumps(
                {
                    "key": key,
                    "sf0.1_cold_sec": round(t_small, 2),
                    "sf1_synth_cold_sec": round(t_big, 2),
                    "ratio_at_10x": round(t_big / t_small, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
