"""PageRank properties: mass conservation, positivity, determinism.

The oracle-parity test pins exact values; these pin the INVARIANTS that
make the values meaningful — a damped walk on a dangling-free graph
conserves total rank mass, every node keeps positive rank, and repeated
runs agree bit-for-bit (pure relational plan, no sampling)."""

from __future__ import annotations

import pytest

from spark_text_clustering_spark.operators.graph import graph_pagerank

from .conftest import SF_SMALL


def test_pagerank_mass_and_positivity(spark):
    rows = graph_pagerank(spark, SF_SMALL).collect()
    assert len(rows) > 100
    # scaled ranks have mean exactly 1 -> sum == node count (mass
    # conservation: both edge directions exist, so nothing dangles)
    total = sum(r["pr_scaled"] for r in rows)
    assert total == pytest.approx(len(rows), rel=1e-4)
    assert all(r["pr_scaled"] > 0 for r in rows)


def test_pagerank_deterministic(spark):
    a = sorted(tuple(r) for r in graph_pagerank(spark, SF_SMALL).collect())
    b = sorted(tuple(r) for r in graph_pagerank(spark, SF_SMALL).collect())
    assert a == b
