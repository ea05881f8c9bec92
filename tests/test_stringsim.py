"""Jaro-Winkler scalar correctness: goldens, DuckDB bit-parity, edges.

The whole point of ``functions/stringsim.py`` is BIT-identity with
DuckDB's ``jaro_winkler_similarity`` — that is what upgrades
``dedup_fuzzy_jaro_winkler`` from a rows-only key to a full value-hash
oracle. These tests pin the classic textbook values AND re-verify the
bit-parity claim against the in-container DuckDB on real blocked pairs,
so a DuckDB upgrade that changes its implementation is caught here, not
by a red driver row.
"""

from __future__ import annotations

import struct

import duckdb
import pytest

from spark_text_clustering_spark.functions.stringsim import jaro, jaro_winkler


@pytest.mark.parametrize(
    "a,b,expected",
    [
        ("martha", "marhta", 0.9611111111111111),  # Winkler's own example
        ("dwayne", "duane", 0.8400000000000001),
        ("dixon", "dicksonx", 0.8133333333333332),
        ("a", "a", 1.0),
        ("abc", "abc", 1.0),
        ("", "", 0.0),  # DuckDB semantics, not the textbook 1.0
        ("a", "", 0.0),
        ("", "a", 0.0),
        ("ab", "ba", 0.0),  # window 0: no matches for len-2 transposition
        ("abcd", "abce", 0.8833333333333334),  # 3-char prefix boost (DuckDB-checked)
    ],
)
def test_jaro_winkler_goldens(a, b, expected):
    assert jaro_winkler(a, b) == pytest.approx(expected, abs=0, rel=0)


def test_boost_only_above_threshold():
    # jaro("abcdef","abzzzz") is low; identical prefix must NOT boost it
    j = jaro("abcdef", "abzzzz")
    assert j <= 0.7
    assert jaro_winkler("abcdef", "abzzzz") == j


def test_bit_parity_with_duckdb_on_real_pairs():
    """Every blocked doc-head pair at sf0.001: double-for-double equality
    with DuckDB (struct-packed comparison — no approx)."""
    con = duckdb.connect()
    rows = con.sql(
        """
        WITH p AS (SELECT doc_id, substr(text,1,60) AS head,
                          split_part(substr(text,1,60),' ',1) AS block
                   FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
                   WHERE text IS NOT NULL AND length(text) >= 8)
        SELECT a.head, b.head, jaro_winkler_similarity(a.head, b.head)
        FROM p a JOIN p b USING (block) WHERE a.doc_id < b.doc_id
        """
    ).fetchall()
    assert len(rows) > 50, "degenerate test corpus — blocking key too fine"
    for ha, hb, duck in rows:
        mine = jaro_winkler(ha, hb)
        assert struct.pack("d", mine) == struct.pack("d", duck), (ha, hb, mine, duck)
