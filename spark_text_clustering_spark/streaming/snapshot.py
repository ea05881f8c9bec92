"""Streaming snapshot maintenance: a foreachBatch MERGE loop that keeps a
serving table ("latest state per user") current as events stream in —
the CDC/materialized-view pattern on top of Structured Streaming.

Each microbatch: reduce the batch to its latest row per key → read the
current snapshot → full-outer merge (newest ts wins) → rewrite. Locally
the rewrite is overwrite-to-a-new-generation-dir + pointer update (the
poor-man's atomic commit); on a cluster a lakehouse format's MERGE INTO
does the same with real transaction logs — the join shape is identical.

Scale: batch side is trigger-sized; snapshot side is |keys|-sized (state,
not history). The merge shuffles on the key; with the snapshot bucketed
by key the shuffle halves (docs/SCALE.md).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, stream_events
from ..session import ensure_utc
from ._util import await_drain


def _latest_per_user(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


class SnapshotMaintainer:
    """Generation-dir snapshot with a `current` pointer file."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._gen = 0

    def _pointer(self) -> str:
        return os.path.join(self.root, "CURRENT")

    def read(self) -> DataFrame | None:
        if not os.path.exists(self._pointer()):
            return None
        with open(self._pointer()) as f:
            gen_dir = f.read().strip()
        return self.spark.read.parquet(gen_dir)

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        batch_latest = _latest_per_user(batch_df)
        current = self.read()
        if current is None:
            merged = batch_latest
        else:
            merged = _latest_per_user(current.unionByName(batch_latest))
        self._gen += 1
        gen_dir = os.path.join(self.root, f"gen_{self._gen:06d}")
        merged.write.mode("overwrite").parquet(gen_dir)
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(gen_dir)
        os.replace(tmp, self._pointer())  # atomic pointer swap


def maintain_user_snapshot(
    spark: SparkSession, sf_dir: str, snapshot_root: str, n_chunks: int = 3
) -> DataFrame:
    """Replay events as ``n_chunks`` arriving files; foreachBatch merges
    each microbatch into the snapshot. Returns the final snapshot."""
    ensure_utc(spark)
    src = tempfile.mkdtemp(prefix="snap_src_")
    ckpt = tempfile.mkdtemp(prefix="snap_ckpt_")
    try:
        ev = load_table(spark, sf_dir, "events")
        # pre-split into chunk files so multiple microbatches occur
        for i in range(n_chunks):
            ev.where(F.col("event_id") % n_chunks == i).write.mode("overwrite").parquet(
                os.path.join(src, f"chunk_{i}")
            )
        maintainer = SnapshotMaintainer(spark, snapshot_root)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(src + "/chunk_*")
        )
        q = (
            stream.writeStream.foreachBatch(maintainer.merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_drain(q, 180, "snapshot stream")
        return maintainer.read()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
