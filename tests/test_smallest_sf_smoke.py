"""Robustness smoke: every registered query must run at the smallest scale
factor (sf0.001) — catches tiny-data edge cases (empty groups, <k
candidates, single-partition windows) that sf0.01 testing can mask."""

import pytest

from spark_text_clustering_spark.registry import QUERIES

from .conftest import SF_SMALL

# ML queries retrain per sf_dir — covered at sf0.01 in parity tests; skip
# the slow refits here, keep every other operator.
_SLOW_ML = {"tfidf_vectorize", "lda_topics", "lda_doc_report", "search_tfidf_topk"}


@pytest.mark.parametrize("key", sorted(k for k in QUERIES if k not in _SLOW_ML))
def test_runs_at_smallest_sf(spark, key):
    n = QUERIES[key](spark, SF_SMALL).count()
    assert n >= 0
