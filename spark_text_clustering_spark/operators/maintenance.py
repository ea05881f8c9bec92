"""Storage-layout maintenance: small-file compaction and Z-ordered
writes — the table-housekeeping jobs a 100 TB lakehouse runs continuously
(OPTIMIZE / OPTIMIZE ZORDER in Delta/Iceberg terms, expressed with plain
Spark + parquet so no table format is required).

Why it matters at scale: streaming ingest and fine-grained partitioning
both produce many small files; each file costs a driver-side listing
entry, a task, and a footer read, so scan overhead grows with file count,
not bytes. Compaction rewrites a directory into ~target-sized files.
Z-ordering additionally makes per-file (and per-row-group) min/max
statistics selective in MULTIPLE dimensions at once, so engines skip
files on conjunctive range predicates — `layout_zorder_key`
(operators/traindata.py) computes the key; `write_zordered` here does the
range-partition + in-partition sort + write, and the test verifies the
resulting parquet footers actually admit skipping.

No reference analogue (the reference writes one report file,
LDAClustering.scala:139-151); this is rebuild-contract scope for the
training-data pipeline (SURVEY §2.9).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within: str | None = None,
) -> tuple[str, int]:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(bytes / target_file_bytes)`` files (two-phase: write to a
    sibling staging dir, then atomically swap via rename, so a crashed
    compaction never destroys the source).

    Returns (new_path == path, n_files). Sizing uses the CURRENT
    compressed footprint as the estimate — the standard heuristic;
    compaction output compresses slightly better (larger row groups), so
    files land just under target, which is the right side to miss on.
    ``coalesce`` (not repartition) keeps the rewrite shuffle-free unless a
    ``sort_within`` column asks for clustering.
    """
    n_files = max(1, math.ceil(_dir_bytes(path) / target_file_bytes))
    # mergeSchema: a compaction that reads one file's footer as THE schema
    # silently drops columns added by later writers (schema evolution is
    # routine on long-lived ingest dirs); merging unions the columns and
    # back-fills nulls, which is the only rewrite that loses nothing
    df = spark.read.option("mergeSchema", "true").parquet(path)
    staging = path.rstrip("/") + ".compact_staging"
    old = path.rstrip("/") + ".compact_old"
    if sort_within is not None:
        out = df.repartition(n_files).sortWithinPartitions(sort_within)
    else:
        out = df.coalesce(n_files)
    out.write.mode("overwrite").parquet(staging)
    # two-phase swap: both renames are single directory moves
    os.rename(path, old)
    os.rename(staging, path)
    import shutil

    shutil.rmtree(old)
    return path, n_files


def write_zordered(
    df: DataFrame,
    path: str,
    zkey: Column,
    n_files: int = 8,
) -> None:
    """Write ``df`` clustered by a Z-order key: range-partition on the key
    (so each FILE owns a contiguous zkey range → file-level min/max
    pruning), then sort within partitions (so each ROW GROUP owns a
    contiguous sub-range → row-group pruning). One range-exchange is the
    entire cost; the interleave itself is a narrow codegen'd map.

    The key column is written alongside the data — engines prune on the
    stats of a real column, and filters can be rewritten onto zkey ranges.
    """
    (
        df.withColumn("zkey", zkey)
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_file_stats(path: str) -> list[tuple[int, int]]:
    """(min, max) of the ``zkey`` column per parquet file — the statistics
    a scanner prunes with. Pure footer reads, no data scan."""
    import pyarrow.parquet as pq

    spans = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["zkey"]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans.append((min(mins), max(maxs)))
    return spans
