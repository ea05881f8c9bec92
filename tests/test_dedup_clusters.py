"""Equality lock for `dedup_minhash_clusters` (round 9): the rows-only key
must agree label-for-label with an independent pure-Python union-find over
the SAME candidate-pair graph (`dedup_minhash_fast` output, collected).
That closes the correctness gap a rows-only gate leaves open: the seeded
MinHash pair generation is already recall-pinned in test_dedup_quality.py,
and here the clustering stage on top of it is verified exactly — transitive
closure, min-id labels, singleton fill-in, and one canonical per cluster.
"""

import pytest

from spark_text_clustering_spark.catalog import load_table
from spark_text_clustering_spark.operators.dedup import (
    dedup_minhash_clusters,
    dedup_minhash_fast,
)

from .conftest import SF_ORACLE, SF_SMALL


def _union_find_labels(all_ids, pairs):
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id per component: one more full pass after all unions
    return {i: find(i) for i in all_ids}


def _check_sf(spark, sf_dir, kernel="hashmin"):
    pairs = [
        (r["id_a"], r["id_b"])
        for r in dedup_minhash_fast(spark, sf_dir).select("id_a", "id_b").collect()
    ]
    all_ids = [
        r["doc_id"] for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    expected = _union_find_labels(all_ids, pairs)

    out = dedup_minhash_clusters(spark, sf_dir, kernel=kernel).collect()
    assert len(out) == len(all_ids), "one row per document, singletons included"
    got = {r["doc_id"]: r["cluster_id"] for r in out}
    assert got == expected, "cluster labels must equal the union-find closure"

    # canonical = min-id member, exactly one per cluster
    canon = {r["cluster_id"] for r in out if r["is_canonical"]}
    clusters = set(got.values())
    assert canon == clusters
    for r in out:
        assert r["is_canonical"] == (r["doc_id"] == r["cluster_id"])
    return pairs, expected


# Both CC kernels must produce identical clusters (round 10, VERDICT r9
# #2: the twostar kernel is the unknown-diameter escape hatch the dedup
# consumer now exposes via kernel="twostar"; default stays hashmin).
_KERNELS = ["hashmin", "twostar"]


@pytest.mark.parametrize("kernel", _KERNELS)
def test_clusters_match_union_find_sf0001(spark, kernel):
    pairs, expected = _check_sf(spark, SF_SMALL, kernel)
    # non-vacuous: the sf0.001 corpus has candidate pairs AND a transitive
    # chain (a cluster larger than one pair), so closure is exercised
    assert len(pairs) >= 10
    from collections import Counter

    sizes = Counter(expected.values())
    assert max(sizes.values()) >= 3, "need a >=3-doc cluster to exercise transitivity"


@pytest.mark.parametrize("kernel", _KERNELS)
def test_clusters_match_union_find_sf001(spark, kernel):
    _check_sf(spark, SF_ORACLE, kernel)


def test_unknown_kernel_raises(spark):
    with pytest.raises(ValueError, match="unknown CC kernel"):
        dedup_minhash_clusters(spark, SF_SMALL, kernel="bfs")


def test_canonical_filter_is_a_near_dedup(spark):
    """`WHERE is_canonical` keeps exactly one doc per near-dup group: the
    survivor count equals the number of union-find components."""
    out = dedup_minhash_clusters(spark, SF_SMALL).collect()
    survivors = [r for r in out if r["is_canonical"]]
    assert len(survivors) == len({r["cluster_id"] for r in out})
    assert len(survivors) < len(out), "sf0.001 has near-dups, so some docs must drop"


def test_registered_twostar_key_matches_hashmin_key(spark):
    """The round-11 registered twin must be label-for-label identical to
    the default key (it IS kernel='twostar' on the same pair graph)."""
    from spark_text_clustering_spark.registry import QUERIES

    a = sorted(
        tuple(r)
        for r in QUERIES["dedup_minhash_clusters"](spark, SF_SMALL).collect()
    )
    b = sorted(
        tuple(r)
        for r in QUERIES["dedup_minhash_clusters_twostar"](
            spark, SF_SMALL
        ).collect()
    )
    assert a == b
