"""`_merge_fold` (round 14): the BPE/WordPiece greedy merge fold built as
one parsed SQL expression, memoized per (col, a, b, merged). Must equal
the python-lambda HOF it replaced on every input — including tokens that
stress the SQL string-literal escaping (quotes, backslashes), which the
real word tables never contain but the helper must survive anyway."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_text_clustering_spark.operators.textprep import (
    _MERGE_FOLD_MEMO,
    _merge_fold,
)


def _lambda_fold(col: str, a: str, b: str, merged: str):
    """The pre-r14 python-lambda construction, verbatim — the reference."""
    la, lb, lm = F.lit(a), F.lit(b), F.lit(merged)
    return F.aggregate(
        F.col(col),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == la) & (x == lb),
            F.concat(
                F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
                F.array(lm),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def test_merge_fold_equals_lambda_form_incl_escaping(spark):
    cases = [
        # (a, b) merge over adversarial overlap words (the test_props set)
        ("a", "b", ["aaa", "abab", "aabb", "abba", "ab", "ba", "a", "b", ""]),
        # tokens containing SQL-literal metacharacters: single quote,
        # backslash, double quote — the escaping path
        ("'", "b", ["'b", "b'", "''bb", "'"]),
        ("\\", "'", ["\\'", "'\\", "\\\\''"]),
        ('"', "\\", ['"\\', '\\"', '""\\\\']),
    ]
    for a, b, words in cases:
        merged = a + b
        df = spark.createDataFrame([(list(w),) for w in words], "syms array<string>")
        want = [
            r["m"]
            for r in df.select(_lambda_fold("syms", a, b, merged).alias("m")).collect()
        ]
        got = [
            r["m"]
            for r in df.select(_merge_fold("syms", a, b, merged).alias("m")).collect()
        ]
        assert got == want, (a, b, words)


def test_merge_fold_memoizes(spark):
    before = len(_MERGE_FOLD_MEMO)
    c1 = _merge_fold("syms", "x", "y", "xy")
    c2 = _merge_fold("syms", "x", "y", "xy")
    assert c1 is c2
    assert len(_MERGE_FOLD_MEMO) == before + 1 or ("syms", "x", "y", "xy") in _MERGE_FOLD_MEMO
