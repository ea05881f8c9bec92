"""Null-input robustness: every registered query must run against tables
whose nullable (non-key) columns actually contain nulls, plus the related
degenerate values (empty text, zero-norm embeddings, tiny corpora).

Found-and-fixed by this sweep (round 3):
* catalog footer sniff misrouted Spark's own INT96 timestamps down the
  nanosAsLong path (pyarrow reports INT96 as timestamp[ns]);
* null embeddings crashed every ANN fit, and Catalyst's reordering of
  deterministic UDFs above filters meant a plain .where(isNotNull) was
  NOT enough for the LSH hash (fixed with when()-guards + localCheckpoint);
* zero-norm vectors hit ANSI DIVIDE_BY_ZERO in cosine scoring (now
  excluded by definition);
* KMeans aborts when k exceeds the corpus size (now capped, <2 vectors →
  empty result);
* null text crashed the lemmatizer / SimHash pandas UDFs and multimodal
  payload construction (null-safe now).
"""

from __future__ import annotations

import datetime
import os

import pytest

from spark_text_clustering_spark.catalog import SCHEMAS
from spark_text_clustering_spark.registry import QUERIES

_DT = datetime.datetime

_ROWS = {
    "region": [(0, "AFRICA"), (1, None)],
    "nation": [(0, "ALGERIA", 0), (1, None, None)],
    "customer": [(1, "c1", 0, 1.5, "BUILDING"), (2, None, None, None, None)],
    "supplier": [(1, "s1", 0, 2.5), (2, None, None, None)],
    "part": [
        (1, "green tomato", None, "SMALL", 1, 10.0),
        (2, None, None, None, None, None),
    ],
    "orders": [
        (1, 1, "O", 10.0, _DT(1995, 3, 1), "1-URGENT"),
        (2, 2, None, None, None, None),
    ],
    "lineitem": [
        (1, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", _DT(1995, 3, 5)),
        (2, 2, 2, 1, None, None, None, None, None, None, None),
    ],
    "events": [
        (1, _DT(2024, 1, 2, 10, 0), 7, "click", 1.0, '{"a":1}'),
        (2, _DT(2024, 1, 3, 11, 0), 8, None, None, None),
        (3, None, 9, "view", 2.0, None),
    ],
    "documents": [
        (0, "the quick brown fox", "en", "src1", 19),
        (1, None, None, None, None),
        (2, "", "en", "src2", 0),
    ],
    "embeddings": [
        (0, [0.1] * 8, 1),
        (1, None, None),
        (2, [0.0] * 8, 0),  # zero-norm: undefined cosine, must not crash
        (3, [0.2] * 8, 1),
    ],
}


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("null_sf"))
    for t, sch in SCHEMAS.items():
        spark.createDataFrame(_ROWS[t], sch).write.mode("overwrite").parquet(
            os.path.join(d, f"{t}.parquet")
        )
    return d


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_runs_on_null_laden_input(spark, null_sf_dir, key):
    # noop write, NOT count(): count() lets Catalyst prune projection/UDF
    # columns that are never evaluated (udf_scalar_stem's null crash was
    # invisible to a count()-based sweep)
    QUERIES[key](spark, null_sf_dir).write.format("noop").mode("overwrite").save()


def test_int96_timestamps_load_natively(spark, null_sf_dir):
    """Spark writes INT96 timestamps by default; pyarrow reports them as
    timestamp[ns], but they must take the native read path, not the
    TIMESTAMP(NANOS) nanosAsLong workaround."""
    from spark_text_clustering_spark.catalog import load_table

    ev = load_table(spark, null_sf_dir, "events").orderBy("event_id").collect()
    assert ev[0]["ts"] == _DT(2024, 1, 2, 10, 0)
    assert ev[2]["ts"] is None
