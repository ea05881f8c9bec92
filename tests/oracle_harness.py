"""Local replica of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle on the same parquet, compare row count, schema
(column names), and order-insensitive values (floats at 1e-6)."""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import numpy as np


def canon(v):
    """Canonicalize a value for order-insensitive multiset comparison."""
    if v is None:
        return ("null",)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return ("nan",)
        r = round(f, 6)
        if r == 0.0:
            r = 0.0  # normalize -0.0
        return ("f", f"{r:.6f}")
    if isinstance(v, _decimal.Decimal):
        return canon(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, (_dt.datetime, _dt.date)):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a",) + tuple(canon(x) for x in v)
    return ("s", str(v))


def frame_to_multiset(pdf):
    cols = sorted(pdf.columns)
    # itertuples, not iterrows (round 15): iterrows builds a Series per
    # row (~100 µs each — 20+ s of pure comparison overhead on the
    # 100k-row parity keys); itertuples yields plain tuples with the
    # same per-column values, which canon() normalizes identically.
    rows = [
        tuple(canon(v) for v in tup)
        for tup in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    spdf = spark_df.toPandas()
    ddf = duck_rel.df()
    sc, srows = frame_to_multiset(spdf)
    dc, drows = frame_to_multiset(ddf)
    if sc != dc:
        return False, f"schema mismatch: spark={sc} duckdb={dc}"
    if len(srows) != len(drows):
        return False, f"row count mismatch: spark={len(srows)} duckdb={len(drows)}"
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            return False, f"value mismatch at sorted row {i}:\n  spark = {a}\n  duck  = {b}"
    return True, "ok"
