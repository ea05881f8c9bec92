"""TF-IDF search: self-retrieval sanity + determinism + top-k contract."""

import pytest

from spark_text_clustering_spark.catalog import load_table
from spark_text_clustering_spark.operators.search import search_corpus

from .conftest import SF_SMALL


def test_search_self_retrieval(spark):
    """Querying with a document's own text must rank that document #1
    (cosine(v, v) = 1 is maximal)."""
    docs = load_table(spark, SF_SMALL, "documents")
    sample = docs.limit(1).collect()[0]
    out = search_corpus(spark, SF_SMALL, [sample["text"]], k=3).collect()
    assert out, "no results"
    top = [r for r in out if r["rank"] == 1][0]
    # the exact same text may exist under several doc_ids; top score must be
    # (near) 1.0 and the original doc must appear in the top ranks
    assert top["score"] >= 0.999
    assert sample["doc_id"] in [r["doc_id"] for r in out]


def test_search_topk_contract_and_determinism(spark):
    out1 = search_corpus(spark, SF_SMALL, ["table scan join", "stream window"], k=5).collect()
    out2 = search_corpus(spark, SF_SMALL, ["table scan join", "stream window"], k=5).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows)
    assert key(out1) == key(out2)
    by_q = {}
    for r in out1:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_ivf_stored_index_matches_per_query_fit(spark):
    """The stored partitioned IVF index (same quantizer seed) must return
    exactly the per-query-fit IVF results."""
    from spark_text_clustering_spark.operators.similarity import (
        knn_cosine_ivf,
        knn_cosine_ivf_stored,
    )
    from .conftest import SF_ORACLE

    live = {tuple(r) for r in knn_cosine_ivf(spark, SF_ORACLE).collect()}
    stored = {tuple(r) for r in knn_cosine_ivf_stored(spark, SF_ORACLE).collect()}
    assert stored == live


def test_ivf_stored_index_scan_partition_prunes(spark):
    """Probing the stored index must show cluster partition filters in the
    scan — the directory-pruning property that makes IVF cheap at scale."""
    from pyspark.sql import functions as F

    from spark_text_clustering_spark.operators.similarity import build_ivf_index
    from .conftest import SF_ORACLE

    index_path, _ = build_ivf_index(spark, SF_ORACLE)
    probe = spark.read.parquet(index_path).where(F.col("cluster").isin([1, 3]))
    plan = spark._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "cluster" in plan
