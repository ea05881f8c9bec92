"""Empty-input robustness: every registered query must run (and return an
empty or well-defined result) against zero-row tables.

At 100 TB, empty inputs are everyday events — an empty partition, a date
range with no data, a filter that matches nothing, a brand-new ingest
directory. An operator that crashes on zero rows is a production incident
waiting in a scheduled pipeline. Relational operators get this for free
from Spark; the ML fits (vectorizer, LDA, KMeans/LSH ANN) degrade via
``EmptyCorpusError`` / ``isEmpty`` guards to empty-in → empty-out.

This runs all 165+ registered keys, so it is the slowest single test in
the suite (~2-3 min) — but it is also the only one that exercises every
query's planning path in one sweep.
"""

from __future__ import annotations

import os

import pytest

from spark_text_clustering_spark.catalog import SCHEMAS
from spark_text_clustering_spark.registry import QUERIES


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t, sch in SCHEMAS.items():
        spark.createDataFrame([], sch).write.mode("overwrite").parquet(
            os.path.join(d, f"{t}.parquet")
        )
    return d


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_runs_on_empty_input(spark, empty_sf_dir, key):
    # noop write, NOT count(): count() lets Catalyst prune projection/UDF
    # columns that are never evaluated, hiding exactly the crashes this
    # sweep exists to catch
    QUERIES[key](spark, empty_sf_dir).write.format("noop").mode("overwrite").save()
