"""Constructed-corpus tests for the round-10 dedup keys.

The synthetic testdata's near-dups are SYMMETRIC (perturbed copies), so at
sf0.01 `dedup_shingle_containment` finds exactly the Jaccard pairs and
`dedup_cluster_best_quality`'s survivor always coincides with min-id — the
parity suite passes but never exercises what distinguishes these operators.
These tests build a corpus where the distinguishing behavior MUST fire:

* a short document that is a verbatim excerpt of a long one — containment
  1.0 in one direction, Jaccard 0.31 (below the 0.5 gate: structurally
  invisible to every symmetric key in dedup.py);
* a near-dup cluster whose MIN-ID member is the lower-quality copy — the
  quality-aware survivor must beat min-id canonicalization.

Both keys are also DuckDB-compared on this corpus (same compare() as the
parity gate), so the oracle agreement is proven exactly where the
asymmetric/quality logic is live, not only where it is vacuous.
"""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_text_clustering_spark.operators.dedup import (
    dedup_cluster_best_quality,
    dedup_containment_filter,
    dedup_ngram_jaccard,
    dedup_shingle_containment,
)
from spark_text_clustering_spark.registry import ORACLES

from .oracle_harness import compare

_LONG = " ".join(f"a{i:02d}" for i in range(60))  # 60 unique 3-char tokens
_EXCERPT = " ".join(f"a{i:02d}" for i in range(20, 40))  # verbatim middle slice
_HIGH_Q = " ".join(f"b{i:02d}" for i in range(31))  # avg token len 3.0 -> +0.2
# same text with the last token shortened to one char: avg len 2.94 -> the
# 0.2 quality term drops, trigram Jaccard vs _HIGH_Q = 28/30 = 0.93 >= 0.5
_LOW_Q = " ".join(f"b{i:02d}" for i in range(30)) + " z"
_LONER = " ".join(f"solo{i:02d}" for i in range(12))  # no overlap with anything


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("asym_corpus")
    rows = [
        (1, _LONG),
        (2, _EXCERPT),
        (10, _LOW_Q),  # min id of its cluster, deliberately lower quality
        (11, _HIGH_Q),
        (20, _LONER),
    ]
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["synthetic"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def test_containment_catches_the_excerpt_jaccard_misses(spark, corpus_dir):
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in dedup_shingle_containment(spark, corpus_dir).collect()
    }
    # the excerpt is fully contained in the long doc, ONE direction only
    assert got[(2, 1)] == 1.0
    assert (1, 2) not in got, "58-shingle doc is not contained in the 18-shingle one"
    # the near-dup twins contain each other (28 of 29 shingles shared)
    assert got[(10, 11)] == got[(11, 10)] == round(28 / 29, 6)
    assert set(got) == {(2, 1), (10, 11), (11, 10)}
    # the symmetric key structurally misses the excerpt pair: J = 18/58
    jac = {
        (r["id_a"], r["id_b"])
        for r in dedup_ngram_jaccard(spark, corpus_dir).collect()
    }
    assert (1, 2) not in jac and (2, 1) not in jac
    assert (10, 11) in jac  # but does see the symmetric twins


def test_best_quality_survivor_beats_min_id(spark, corpus_dir):
    rows = {r["doc_id"]: r for r in dedup_cluster_best_quality(spark, corpus_dir).collect()}
    assert len(rows) == 5, "every document gets a row, singletons included"
    # docs 10+11 cluster together under the min-id LABEL...
    assert rows[10]["cluster_id"] == rows[11]["cluster_id"] == 10
    # ...but the SURVIVOR is the higher-quality doc 11, not min-id 10
    assert rows[11]["is_survivor"] == 1 and rows[10]["is_survivor"] == 0
    assert rows[11]["quality"] > rows[10]["quality"]
    # singletons survive trivially
    for doc_id in (1, 2, 20):
        assert rows[doc_id]["cluster_id"] == doc_id
        assert rows[doc_id]["is_survivor"] == 1


def test_containment_filter_drops_excerpt_and_worse_twin(spark, corpus_dir):
    """The ACTION on top of the detector: the excerpt (2 ⊂ longer 1) and
    the shorter mutual-containment twin (10, 2 chars shorter than 11)
    are dropped; their hosts and the loner survive."""
    kept = {
        r["doc_id"]: r["is_kept"]
        for r in dedup_containment_filter(spark, corpus_dir).collect()
    }
    assert kept == {1: 1, 2: 0, 10: 0, 11: 1, 20: 1}


@pytest.mark.parametrize(
    "key",
    [
        "dedup_shingle_containment",
        "dedup_cluster_best_quality",
        "dedup_containment_filter",
    ],
)
def test_oracle_agrees_on_the_asymmetric_corpus(spark, corpus_dir, key):
    from spark_text_clustering_spark.registry import QUERIES

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{corpus_dir}/documents.parquet'"
        )
        ok, msg = compare(QUERIES[key](spark, corpus_dir), con.sql(ORACLES[key]))
        assert ok, f"{key}: {msg}"
    finally:
        con.close()
