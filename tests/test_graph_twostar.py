"""Large-star/small-star CC (round 9): the web-scale kernel `_hash_min_cc`'s
docstring promised is now real, and these tests pin the two properties that
justify its existence next to hash-min:

1. SAME ANSWER — `graph_connected_components_twostar` must agree
   label-for-label with the hash-min key on the shared brand graph (the
   recursive-CTE oracle covers both via the parity suite; this is the
   direct kernel-vs-kernel lock, independent of DuckDB).
2. DIAMETER-INDEPENDENT ROUNDS — on a 512-node path (diameter 511, the
   adversarial case for hash-min, whose round count equals diameter) the
   star kernel must converge in O(log n) rounds, not O(n).
"""

from pyspark.sql import functions as F

from spark_text_clustering_spark.operators.graph import (
    _hash_min_cc,
    _two_star_cc,
    graph_connected_components,
    graph_connected_components_twostar,
)

from .conftest import SF_SMALL


def _sym_chain(spark, start, n):
    e = spark.range(start, start + n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    return e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def test_twostar_matches_hashmin_on_brand_graph(spark):
    a = {
        (r["part_id"], r["component"])
        for r in graph_connected_components(spark, SF_SMALL).collect()
    }
    b = {
        (r["part_id"], r["component"])
        for r in graph_connected_components_twostar(spark, SF_SMALL).collect()
    }
    assert a == b
    # non-vacuous: brand blocking yields many components and non-trivial ones
    comps = {c for _, c in a}
    assert len(comps) >= 5
    assert len(a) > len(comps), "at least one multi-node component"


def test_twostar_long_chain_logarithmic_rounds(spark):
    """512-node path: hash-min needs ~511 rounds (one hop of label
    propagation per round); the star kernel must stay logarithmic. The
    bound 14 is ~1.5x the observed count — tight enough that an accidental
    regression to per-hop propagation (O(n) rounds) trips max_rounds=40
    long before it could pass."""
    und = _sym_chain(spark, 0, 512)
    labels, rounds = _two_star_cc(und)
    rows = labels.collect()
    assert len(rows) == 512
    assert all(r["comp"] == 0 for r in rows)
    assert rounds <= 14, f"expected O(log n) rounds on a path, got {rounds}"


def test_twostar_two_components_and_hashmin_agreement(spark):
    """Two disjoint chains with distinct minima; both kernels must produce
    the identical label map (hash-min is affordable here: diameter 31)."""
    und = _sym_chain(spark, 0, 32).unionAll(_sym_chain(spark, 1000, 32))
    star, _ = _two_star_cc(und)
    got = {r["id"]: r["comp"] for r in star.collect()}
    expected = {i: 0 for i in range(32)} | {i: 1000 for i in range(1000, 1032)}
    assert got == expected
    hm = {r["id"]: r["comp"] for r in _hash_min_cc(und, max_rounds=64).collect()}
    assert hm == expected


def test_twostar_orientation_robust(spark):
    """Round-10 ADVICE fix: `_two_star_cc` canonicalizes edges internally
    (greatest/least) and derives the node spine from BOTH endpoint
    columns, so a one-directional edge list — in either orientation — a
    mixed list, and a fully symmetrized one all yield the same labels;
    self-loops are dropped. Before the fix, a u<v-only input produced an
    EMPTY edge set (every node its own component) silently."""
    fwd = spark.range(0, 63).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )  # u < v only — the silently-wrong case pre-fix
    rev = fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))  # u > v only
    loops = spark.range(0, 64).select(F.col("id").alias("u"), F.col("id").alias("v"))
    sym = fwd.unionAll(rev)
    expected = {(r["id"], r["comp"]) for r in _two_star_cc(sym)[0].collect()}
    assert expected == {(i, 0) for i in range(64)}
    for und in (fwd, rev, fwd.unionAll(loops)):
        got = {(r["id"], r["comp"]) for r in _two_star_cc(und)[0].collect()}
        assert got == expected


def test_cc_kernels_free_superseded_round_checkpoints(spark):
    """Round-11 hygiene lock: each CC construction may keep only the
    frames its RETURN VALUE reads pinned (hash-min: the final label
    frame; two-star: final edge frame + node spine). Before the
    _ckpt_tracked/_drop_ckpt cleanup every ROUND leaked a pinned RDD
    (4 bench constructions left 37 RDDs pinned) — an unbounded storage
    drag on a long-lived session."""
    from spark_text_clustering_spark.registry import QUERIES

    sc = spark.sparkContext

    def pinned() -> int:
        return len(sc._jsc.sc().getRDDStorageInfo())

    for key, per_call_bound in [
        ("graph_connected_components", 2),
        ("graph_connected_components_twostar", 3),
        # the other round-11-patched iterative loops: the trainers return
        # pure driver data (0 pinned per call), the graph keys keep only
        # the returned frame's chain (1, bound 2 for slack)
        ("bpe_train_merges", 1),
        ("wordpiece_train_merges", 1),
        ("graph_pagerank", 2),
        ("graph_kcore_peel", 2),
        ("graph_label_propagation", 2),
        # round 13 (lazy-ckpt fusion): BFS keeps the final distance
        # frame + the shared _brand_edges checkpoint per call, like CC
        ("graph_bfs_hops", 2),
    ]:
        QUERIES[key](spark, SF_SMALL).count()  # warm (memos, parquet footers)
        base = pinned()
        for _ in range(2):
            QUERIES[key](spark, SF_SMALL).count()
        growth = pinned() - base
        assert growth <= 2 * per_call_bound, (
            f"{key}: {growth} RDDs pinned by 2 constructions "
            f"(bound {2 * per_call_bound}) — a superseded round frame "
            f"is no longer being dropped"
        )
