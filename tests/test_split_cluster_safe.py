"""Leakage-safety lock for `split_assign_cluster_safe` (round 10): the
property the operator exists for — no near-dup pair may straddle a
train/val/test boundary — asserted directly against the pair graph, plus
determinism and sane proportions. DuckDB value parity is covered by the
registry-driven suite (the key is oracled)."""

from collections import Counter

from spark_text_clustering_spark.operators.dedup import dedup_ngram_jaccard
from spark_text_clustering_spark.operators.traindata import split_assign_cluster_safe

from .conftest import SF_ORACLE


def test_no_near_dup_pair_straddles_splits(spark):
    rows = split_assign_cluster_safe(spark, SF_ORACLE).collect()
    split_of = {r["doc_id"]: r["split"] for r in rows}
    pairs = dedup_ngram_jaccard(spark, SF_ORACLE).collect()
    assert pairs, "sf0.01 must have near-dup pairs or this test is vacuous"
    for p in pairs:
        assert split_of[p["id_a"]] == split_of[p["id_b"]], (
            f"near-dup pair ({p['id_a']}, {p['id_b']}) straddles "
            f"{split_of[p['id_a']]}/{split_of[p['id_b']]} — evaluation leakage"
        )
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values()), (
        "a cluster mapped to more than one split"
    )


def test_split_proportions_and_determinism(spark):
    rows = split_assign_cluster_safe(spark, SF_ORACLE).collect()
    n = len(rows)
    c = Counter(r["split"] for r in rows)
    # 80/10/10 target at cluster granularity over ~500 docs: wide bands,
    # but all three splits must be populated and train must dominate
    assert 0.6 < c["train"] / n < 0.95
    assert c["val"] > 0 and c["test"] > 0
    again = split_assign_cluster_safe(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
