"""Grouped-map (pandas UDAF) operators — the custom-aggregation escape
hatch the reference implements as driver-side mutable arrays
(LDALoader.scala:76-77, 142-149).

``applyInPandas`` ships each group to Python as one Arrow batch — correct
for bounded per-group state. Scale note: group size must fit an executor's
memory; for unbounded groups pre-aggregate or window instead. The z-score
here is also expressible as a pure window query (that's exactly what the
DuckDB oracle does) — the pandas path exists to exercise the UDAF surface
that genuinely-custom aggregations (e.g. per-group model fits) need.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table

REG = Registry()

_ZSCORE_ORACLE = """
SELECT event_id, user_id,
       round(CASE WHEN stddev_samp(value) OVER w IS NULL
                    OR stddev_samp(value) OVER w = 0
                  THEN 0.0
                  ELSE (value - avg(value) OVER w) / stddev_samp(value) OVER w
             END, 6) AS zscore
FROM events
WINDOW w AS (PARTITION BY user_id)
"""


def _zscore_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    std = pdf["value"].std(ddof=1)  # matches stddev_samp
    if not np.isfinite(std) or std == 0.0:
        z = np.zeros(len(pdf))
    else:
        z = (pdf["value"] - pdf["value"].mean()) / std
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": np.round(z, 6)}
    )


@REG.register("grouped_map_zscore", oracle=_ZSCORE_ORACLE)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of event values via ``applyInPandas`` (Arrow batch
    per group), cross-checked against the equivalent window-function SQL.
    Rounded to 6 decimals: numpy and the SQL engines sum in different
    orders, identical to ~1e-12."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.groupBy("user_id").applyInPandas(
        _zscore_pdf, schema="event_id long, user_id long, zscore double"
    )


@REG.register("window_zscore_sql", oracle=_ZSCORE_ORACLE)
def window_zscore_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-plan twin of ``grouped_map_zscore``: identical semantics
    as pure window functions — stays JVM-side in whole-stage codegen, no
    Arrow boundary, no per-group Python. This is the plan you'd run at
    100 TB; the applyInPandas form above exists to exercise the custom-UDAF
    surface. Both share one DuckDB oracle, and bench.py times them
    side-by-side so the headline shows the production number."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    w = Window.partitionBy("user_id")
    std = F.stddev_samp("value").over(w)
    z = F.when(std.isNull() | (std == F.lit(0.0)), F.lit(0.0)).otherwise(
        (F.col("value") - F.avg("value").over(w)) / std
    )
    return ev.select("event_id", "user_id", F.round(z, 6).alias("zscore"))


@REG.register(
    "grouped_agg_pandas_weighted_avg",
    oracle="""
    SELECT user_id,
           SUM(value * CAST(event_id % 10 + 1 AS DOUBLE))
             / SUM(CAST(event_id % 10 + 1 AS DOUBLE)) AS weighted_avg
    FROM events
    GROUP BY user_id
    """,
)
def grouped_agg_pandas_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the true vectorized-UDAF mode (one Arrow
    batch of the group's columns in, one scalar out), completing the UDF
    matrix next to applyInPandas (grouped map) and mapInPandas (stream).
    Weighted average with a deterministic synthetic weight so the DuckDB
    oracle can recompute it exactly. Unlike applyInPandas, GROUPED_AGG
    supports partial aggregation pushdown in Spark's planner only for
    built-ins — so at 100 TB prefer the pure-SQL form (sum(v*w)/sum(w),
    map-side combinable) and reserve this path for aggregations SQL
    can't express (e.g. a t-digest merge); this key keeps the API
    surface tested and documents exactly that tradeoff."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("value"),
        (F.col("event_id") % 10 + 1).cast("double").alias("w"),
    )
    return ev.groupBy("user_id").agg(
        weighted_avg("value", "w").alias("weighted_avg")
    )
