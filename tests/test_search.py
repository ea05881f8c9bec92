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
