"""Sketch→verify pipelines (operators/sketches.py) + full-clause MERGE.

Exactness of all three keys vs DuckDB is covered by test_oracle_parity;
these tests pin the *mechanisms*: one-sided sketch error (CMS never
underestimates, Bloom never misses), lossless pruning (sketch output ==
naive exact output), and MERGE clause semantics/precedence.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from spark_text_clustering_spark.operators import sketches as sk
from spark_text_clustering_spark.registry import QUERIES

from .conftest import SF_SMALL


def test_cms_hash_deterministic_and_in_range():
    for tok in ["the", "ein", "zürich", ""]:
        for d in range(sk._CMS_DEPTH):
            h1, h2 = sk._cms_hash(tok, d), sk._cms_hash(tok, d)
            assert h1 == h2
            assert 0 <= h1 < sk._CMS_WIDTH


def test_heavy_hitters_equal_naive_exact(spark):
    """The sketch pipeline's output must EQUAL the naive full-shuffle
    aggregation (pruning is lossless: candidates are a guaranteed
    superset, CMS only overestimates, verify is exact)."""
    got = {
        (r["token"], r["cnt"])
        for r in QUERIES["heavy_hitters_cms"](spark, SF_SMALL).collect()
    }
    from spark_text_clustering_spark.catalog import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
    ).where(F.length("token") >= 1)
    total = tokens.count()
    threshold = sk._hh_threshold(total)
    naive = {
        (r["token"], r["cnt"])
        for r in tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= threshold)
        .collect()
    }
    assert got == naive
    assert len(got) > 0  # sf0.001 corpus has Zipf heavy hitters


def test_cms_estimate_upper_bounds_exact_counts(spark):
    """Build the merged CMS by hand and check est >= exact for every
    observed token (the one-sided-error property the pruning relies on)."""
    import numpy as np

    from spark_text_clustering_spark.catalog import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
    ).where(F.length("token") >= 1)
    rows = tokens.mapInPandas(
        lambda it: sk._partition_sketch(it, fraction=1),  # candidates irrelevant here
        schema="kind string, token string, local_cnt long, cms array<long>",
    ).collect()
    merged = np.zeros(sk._CMS_DEPTH * sk._CMS_WIDTH, dtype=np.int64)
    for r in rows:
        if r["kind"] == "cms":
            merged += np.asarray(r["cms"], dtype=np.int64)
    cms = merged.reshape(sk._CMS_DEPTH, sk._CMS_WIDTH)
    exact = dict(
        tokens.groupBy("token").count().orderBy(F.desc("count")).limit(200).collect()
    )
    assert exact
    for tok, cnt in exact.items():
        est = min(int(cms[d, sk._cms_hash(tok, d)]) for d in range(sk._CMS_DEPTH))
        assert est >= cnt, (tok, est, cnt)


def test_bloom_prefilter_is_superset_and_small(spark):
    """The Bloom prefilter may keep false positives but must keep every
    true match (no false negatives), and the final semi join removes the
    extras — so output == plain join output."""
    import numpy as np

    from spark_text_clustering_spark.catalog import load_table

    cust = (
        load_table(spark, SF_SMALL, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    part_rows = cust.mapInPandas(sk._bloom_build, schema="words array<long>").collect()
    merged = np.zeros(sk._BLOOM_BITS // 64, dtype=np.int64)
    for row in part_rows:
        merged |= np.asarray(row["words"], dtype=np.int64)
    bloom = merged.astype(np.uint64)

    def member(key: int) -> bool:
        return all(
            (int(bloom[p // 64]) >> (p % 64)) & 1 for p in sk._bloom_positions(key)
        )

    true_keys = {r["c_custkey"] for r in cust.collect()}
    assert true_keys
    for k in true_keys:  # zero false negatives, ever
        assert member(k)

    got = {
        r["o_orderkey"]
        for r in QUERIES["bloom_semi_join_prune"](spark, SF_SMALL).collect()
    }
    orders = load_table(spark, SF_SMALL, "orders")
    expected = {
        r["o_orderkey"]
        for r in orders.join(
            cust, orders.o_custkey == cust.c_custkey, "left_semi"
        ).collect()
    }
    assert got == expected


def test_bloom_tree_merge_bounds_driver_traffic(spark):
    """build_bloom's two-level OR-merge: with P input partitions >
    merge_fanin, at most merge_fanin bitset rows reach the driver
    (traffic independent of P), and the merged bits are identical to the
    flat small-P build bit-for-bit."""
    import numpy as np

    from spark_text_clustering_spark.catalog import load_table

    cust = load_table(spark, SF_SMALL, "customer").select("c_custkey")
    many = cust.repartition(96)  # P = 96 >> fanin
    few = cust.coalesce(2)  # P = 2 <= fanin -> flat path

    frame = sk.bloom_driver_frame(many, "c_custkey", n_bits=1 << 12, merge_fanin=8)
    assert frame.count() <= 8  # driver collects <= fanin rows, not P

    b_tree = sk.build_bloom(many, "c_custkey", n_bits=1 << 12, merge_fanin=8)
    b_flat = sk.build_bloom(few, "c_custkey", n_bits=1 << 12, merge_fanin=8)
    assert np.array_equal(b_tree, b_flat)

    # zero false negatives through the tree path
    keys = [r["c_custkey"] for r in cust.collect()]
    pos = sk.bloom_positions(np.asarray(keys, dtype=np.int64), 1 << 12, 3)
    bits = (b_tree[(pos // 64).astype(np.int64)] >> (pos % 64)) & np.uint64(1)
    assert bool(bits.all())


def test_merge_full_clauses_semantics(spark):
    from spark_text_clustering_spark.catalog import load_table

    res = QUERIES["merge_full_clauses"](spark, SF_SMALL)
    t = load_table(spark, SF_SMALL, "orders")
    # DELETE clause wins over UPDATE on overlap (k%7==3 and k%10==0)
    assert res.where((F.col("o_orderkey") % 7 == 3) & (F.col("o_orderkey") > 0)).count() == 0
    # every insert arrived exactly once under its negative key
    n_ins = t.where(F.col("o_orderkey") % 13 == 0).count()
    ins = res.where(F.col("action") == "inserted")
    assert ins.count() == n_ins
    assert ins.where(F.col("o_orderkey") >= 0).count() == 0
    assert ins.where(F.col("o_orderstatus") != "I").count() == 0
    # updated rows: key %10==0 but not deleted; price doubled
    upd = res.where(F.col("action") == "updated")
    upd_px = upd.select("o_orderkey", F.col("o_totalprice").alias("merged_price"))
    old_px = t.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 2)
        .cast("double")
        .alias("doubled_price"),
    )
    bad = (
        upd_px.join(old_px, "o_orderkey")
        .where(F.abs(F.col("merged_price") - F.col("doubled_price")) > 1e-9)
        .count()
    )
    assert bad == 0
    # kept rows unchanged and row-count arithmetic adds up
    n_t = t.count()
    n_del = t.where((F.col("o_orderkey") % 7 == 3)).count()
    n_upd = t.where((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 7 != 3)).count()
    assert upd.count() == n_upd
    assert res.count() == n_t - n_del + n_ins
    assert res.where(F.col("action") == "kept").count() == n_t - n_del - n_upd
