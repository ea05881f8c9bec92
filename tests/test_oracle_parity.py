"""Driver-gate replica: every oracled query must match DuckDB at sf0.01;
rows-only queries must run and return a stable row count."""

import pytest

from spark_text_clustering_spark.registry import ORACLES, QUERIES

from .conftest import SF_ORACLE
from .oracle_harness import compare

ORACLED = sorted(ORACLES)
ROWS_ONLY = sorted(k for k in QUERIES if k not in ORACLES)


@pytest.mark.parametrize("key", ORACLED)
def test_matches_oracle(spark, duck, key):
    sdf = QUERIES[key](spark, SF_ORACLE)
    rel = duck.sql(ORACLES[key])
    ok, msg = compare(sdf, rel)
    assert ok, f"{key}: {msg}"


@pytest.mark.parametrize("key", ROWS_ONLY)
def test_rows_only_runs(spark, key):
    df = QUERIES[key](spark, SF_ORACLE)
    n = df.count()
    assert n >= 0
