"""Streaming EWMA gates: the rows-only stateful key is locked to the
ORACLED batch key per event (1e-6 — the float-path tolerance the module
docstring derives), and a crash replay must REPLACE its epochs, not
double-append them (the round-7 serving commit contract)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from spark_text_clustering_spark.catalog import load_table
from spark_text_clustering_spark.operators.analytics import timeseries_ewma
from spark_text_clustering_spark.streaming.ewma_serving import (
    _split_by_time,
    stream_ewma_serving,
    streaming_ewma,
)

from .conftest import SF_SMALL


def test_stream_matches_batch_per_event(spark):
    got = {
        r["event_id"]: r["ewma"]
        for r in stream_ewma_serving(spark, SF_SMALL).collect()
    }
    want = {
        r["event_id"]: r["ewma"] for r in timeseries_ewma(spark, SF_SMALL).collect()
    }
    assert set(got) == set(want)  # every event smoothed exactly once
    for eid, v in want.items():
        assert got[eid] == pytest.approx(v, abs=2e-6), eid


def test_replay_overwrites_epochs(spark):
    """Wipe the checkpoint and re-drain against the SAME store: the
    epoch-overwrite commits must leave the store identical, not
    doubled — at-least-once replay replaces its own output."""
    ev = (
        load_table(spark, SF_SMALL, "events")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("tsd", F.col("ts").cast("double"))
    )
    base = tempfile.mkdtemp(prefix="ewma_replay_")
    src, store, ckpt = (os.path.join(base, d) for d in ("src", "store", "ckpt"))
    os.makedirs(src)
    try:
        assert _split_by_time(spark, ev, src, base) == 3
        streaming_ewma(spark, src, store, ckpt)
        first = sorted(
            (r["event_id"], round(r["ewma"], 9))
            for r in spark.read.parquet(store).collect()
        )
        assert len(first) == ev.count()
        shutil.rmtree(ckpt)  # simulate a lost checkpoint -> full replay
        streaming_ewma(spark, src, store, ckpt)
        second = sorted(
            (r["event_id"], round(r["ewma"], 9))
            for r in spark.read.parquet(store).collect()
        )
        assert second == first
    finally:
        shutil.rmtree(base, ignore_errors=True)
