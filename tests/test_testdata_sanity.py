"""Guard against testdata/loader drift on timestamp columns.

Round 2 regression postmortem: the driver's testdata switched ``events.ts``
from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds while the
loader kept a hard-coded nanos÷1000 workaround, silently collapsing 30 days
of 2024 events into 43 minutes of 1970. ``catalog.load_table`` now sniffs
the physical unit from the parquet footer; these tests pin the *semantic*
contract (FIXTURES.md: events span 2024-01-01 → 2024-01-30, TPC-H dates in
1992–2002) so any future unit drift — in the data or the loader — fails CI
here instead of in the driver's correctness gate.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from spark_text_clustering_spark.catalog import load_table

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIRS = [
    os.path.join(TESTDATA, d)
    for d in ("sf0.001", "sf0.01", "sf0.1")
    if os.path.isdir(os.path.join(TESTDATA, d))
]


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_events_ts_in_2024(spark, sf_dir):
    lo, hi = load_table(spark, sf_dir, "events").agg(
        F.min("ts"), F.max("ts")
    ).first()
    assert lo.year == 2024 and hi.year == 2024, (lo, hi)
    assert lo >= datetime.datetime(2024, 1, 1)
    assert hi <= datetime.datetime(2024, 1, 31)
    # the full month is populated, not a collapsed sliver
    assert (hi - lo) >= datetime.timedelta(days=25)


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
@pytest.mark.parametrize(
    "table,col", [("orders", "o_orderdate"), ("lineitem", "l_shipdate")]
)
def test_tpch_dates_in_range(spark, sf_dir, table, col):
    lo, hi = load_table(spark, sf_dir, table).agg(F.min(col), F.max(col)).first()
    assert 1992 <= lo.year <= 2002, (table, col, lo)
    assert 1992 <= hi.year <= 2002, (table, col, hi)
    assert (hi - lo) >= datetime.timedelta(days=365)
