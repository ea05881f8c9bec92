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


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
) -> int:
    """Small-files compaction: read a fragmented parquet dir, rewrite with
    file sizes near ``target_file_mb`` (estimated from the input byte
    size). The maintenance job every long-lived 100 TB table needs —
    millions of tiny files destroy scan planning and NameNode/listing
    time; compaction restores ~128 MB scan units.

    Returns the number of output files written.
    """
    import glob
    import os

    df = spark.read.parquet(src_path)
    input_bytes = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(src_path, "**", "*.parquet"), recursive=True)
    ) or 1
    n_files = max(1, round(input_bytes / (target_file_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return len(glob.glob(os.path.join(dst_path, "*.parquet")))


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (native Spark datasource — orc-core ships in the distro).

    ORC is the columnar interchange for Hive-side consumers; like parquet
    it carries column statistics and supports predicate pushdown on
    re-read, so a 100 TB table written here scans with PushedFilters
    rather than full-file reads."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
