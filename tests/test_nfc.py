"""NFC normalization (round 10): the synthetic corpus is ASCII, where NFC
is the identity — so the behavior is pinned on a constructed corpus of
combining characters, compared BOTH against Python's unicodedata ground
truth and against the DuckDB oracle on the same parquet (the parity suite
covers the ASCII case; this covers the case the operator exists for)."""

import unicodedata

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_text_clustering_spark.operators.text import text_nfc_normalize
from spark_text_clustering_spark.registry import ORACLES, QUERIES

from .oracle_harness import compare

_DECOMPOSED = "étude précis café"  # e + COMBINING ACUTE
_COMPOSED = "étude précis café"  # precomposed é
_ASCII = "plain ascii text stays put"
_HANGUL = "한"  # conjoining jamo -> composes to 한


@pytest.fixture(scope="module")
def nfc_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("nfc_corpus")
    rows = [(1, _DECOMPOSED), (2, _COMPOSED), (3, _ASCII), (4, _HANGUL)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["synthetic"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_nfc_composes_and_flags(spark, nfc_corpus):
    got = {r["doc_id"]: r for r in text_nfc_normalize(spark, nfc_corpus).collect()}
    # decomposed input composes to the precomposed form and is flagged
    assert got[1]["text_nfc"] == _COMPOSED
    assert got[1]["changed"] == 1
    # already-composed and ASCII inputs pass through unflagged
    assert got[2]["text_nfc"] == _COMPOSED and got[2]["changed"] == 0
    assert got[3]["text_nfc"] == _ASCII and got[3]["changed"] == 0
    # Hangul jamo compose to the syllable block
    assert got[4]["text_nfc"] == unicodedata.normalize("NFC", _HANGUL)
    assert got[4]["changed"] == 1
    # the normalized pair now hash-deduplicates: the whole point
    assert got[1]["text_nfc"] == got[2]["text_nfc"]


def test_nfc_oracle_agrees_on_combining_corpus(spark, nfc_corpus):
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{nfc_corpus}/documents.parquet'"
        )
        ok, msg = compare(
            QUERIES["text_nfc_normalize"](spark, nfc_corpus),
            con.sql(ORACLES["text_nfc_normalize"]),
        )
        assert ok, msg
    finally:
        con.close()
