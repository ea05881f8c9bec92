"""Sinks — reference S5/S7 (model dirs + PrintWriter text report) rebuilt
as real DataFrame writers.

Scale notes: parquet is the default interchange (columnar, pushdown-able
on re-read); `partitionBy` produces partition-pruned layouts (the 100 TB
`documents` table would be partitioned by lang/date exactly like this);
JSON is for human/report payloads (reference S7); CSV for interop. All
writers are executor-parallel — the driver never buffers rows (the
reference accumulated the whole report in one driver String,
LDALoader.scala:58, 210-212).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_json_report(df: DataFrame, path: str) -> None:
    """Structured report sink (replaces the reference's PrintWriter text)."""
    df.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)
