"""Streaming PSI: batch equivalence (bit-for-bit — additive sufficient
statistics, unlike the ~1e-5 LDA serving twin) and crash-replay
idempotence of the epoch-overwrite commit."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from spark_text_clustering_spark.operators.analytics import drift_psi
from spark_text_clustering_spark.streaming.drift_monitor import (
    stream_drift_psi,
    streaming_drift_psi,
)

from .conftest import SF_ORACLE


def test_stream_psi_equals_batch_exactly(spark):
    batch = sorted(tuple(r) for r in drift_psi(spark, SF_ORACLE).collect())
    stream = sorted(tuple(r) for r in stream_drift_psi(spark, SF_ORACLE).collect())
    assert len(batch) == 10
    assert stream == batch  # no tolerance: counts are additive


def test_replay_overwrites_not_duplicates(spark, tmp_path):
    """A wiped checkpoint forces a FULL replay against the same store;
    epoch-keyed overwrite must leave the merged counts unchanged (an
    append-style sink would double them)."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    for i, vals in enumerate([[1.0, 2.0], [3.0], [4.0, 5.0, 6.0]]):
        spark.createDataFrame([(v,) for v in vals], "v double").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{src}/f{i}")
    # flatten: the reader wants files directly under src
    for i in range(3):
        part = [
            f for f in os.listdir(f"{src}/f{i}") if f.endswith(".parquet")
        ][0]
        shutil.copy(f"{src}/f{i}/{part}", f"{src}/file{i}.parquet")
        shutil.rmtree(f"{src}/f{i}")
        os.utime(f"{src}/file{i}.parquet", (1_700_000_000 + i,) * 2)

    streaming_drift_psi(spark, src, store, ckpt, 1.0, 6.0)
    first = sorted(
        tuple(r) for r in spark.read.parquet(store).groupBy("bin")
        .agg(F.sum("cnt").alias("c")).collect()
    )
    assert sum(c for _, c in first) == 6  # every value binned once
    shutil.rmtree(ckpt)  # simulate a lost checkpoint -> full replay
    streaming_drift_psi(spark, src, store, ckpt, 1.0, 6.0)
    second = sorted(
        tuple(r) for r in spark.read.parquet(store).groupBy("bin")
        .agg(F.sum("cnt").alias("c")).collect()
    )
    assert second == first
