"""Oracle output-dtype lint (round 7, VERDICT r6 directive #2).

The round driver's value-hash canonicalizes Spark ``Decimal`` objects and
DuckDB's pandas-materialized ``float64`` differently, so an oracle whose
output column is DECIMAL-typed hash-mismatches the driver gate even when
every value is exact (the round-6 ``join_auto_strategy`` red row). The
repo-wide convention is therefore: aggregate in DECIMAL for exactness if
you like, but CAST the *emitted* column to DOUBLE on both sides
(operators/tpch_more.py:14-16).

This lint enforces the convention structurally: bind every registered
oracle against DuckDB (LIMIT 0 — types only, no data) and assert no
result column is DECIMAL-typed. It would have caught the round-6 red row
before the driver did.

The local harness itself is value-correct either way — oracle_harness.canon
folds Decimal->float (oracle_harness.py:26-27) — which is exactly why this
class of bug is invisible to test_oracle_parity and needs a type-level
gate. The other canonicalizations the harness (and, empirically, the
driver) applies: floats rounded to 1e-6 with -0.0 normalized to 0.0, NaN
a distinct token equal to itself, date/datetime via isoformat, arrays
element-wise, everything else stringified.
"""

import duckdb
import pytest

from spark_text_clustering_spark.registry import ORACLES


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_emits_no_decimal(duck, key):
    # LIMIT 0 subquery: DuckDB still fully binds/types the projection.
    rel = duck.sql(f"SELECT * FROM ({ORACLES[key]}) AS _lint LIMIT 0")
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if "DECIMAL" in str(typ).upper()
    ]
    assert not bad, (
        f"{key}: DECIMAL-typed oracle output {bad} — the driver's value-hash "
        "canonicalizes Spark Decimal vs DuckDB float64 differently; cast the "
        "emitted column to DOUBLE on both sides (convention: tpch_more.py)"
    )


def test_lint_catches_decimal():
    """The lint itself must flag a DECIMAL projection (meta-test)."""
    con = duckdb.connect()
    rel = con.sql("SELECT CAST(1.5 AS DECIMAL(18,2)) AS x LIMIT 0")
    assert any("DECIMAL" in str(t).upper() for t in rel.types)
    con.close()
