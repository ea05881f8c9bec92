"""Bigram LM scoring (operators/lm.py): semantic sanity beyond the
DuckDB parity test (which pins exactness)."""

from __future__ import annotations

import pyspark.sql.functions as F

from spark_text_clustering_spark.registry import QUERIES

from .conftest import SF_SMALL


def test_lm_scores_are_negative_log_probs(spark):
    df = QUERIES["ngram_lm_score"](spark, SF_SMALL)
    rows = df.collect()
    assert rows
    # log of a probability < 1 is negative; smoothing keeps it finite
    assert all(r["avg_logprob"] < 0 for r in rows)
    assert all(r["n_bigrams"] >= 1 for r in rows)


def test_lm_prefers_common_phrasing(spark):
    """A synthetic corpus where one doc repeats the dominant phrasing and
    one is token salad: the LM must score the former strictly higher."""
    from spark_text_clustering_spark.operators.lm import ngram_lm_score
    import os
    import tempfile

    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common, "en", "s", len(common)) for i in range(20)]
    rows.append((100, "zyx wvu tsr qpo nml kji hgf edc ba", "en", "s", 30))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        scores = {
            r["doc_id"]: r["avg_logprob"]
            for r in ngram_lm_score(spark, d).collect()
        }
    assert scores[0] > scores[100]
