"""SparkSession factory tuned for this engine.

Replaces the reference's hand-tuned legacy knobs
(``spark.shuffle.memoryFraction`` 0.5-0.6, 10-12g executors, 600-700s
network timeouts — LDATraining.scala:7-15, LDALoader.scala:13-23) with the
modern equivalents: unified memory manager (default), AQE for runtime
re-planning / skew-join splitting / partition coalescing, and explicit
shuffle-partition sizing.

Scale notes (100 TB / 1000-executor design):
* AQE coalesces the statically-chosen ``shuffle.partitions`` down when
  post-shuffle partitions are small and splits skewed partitions, so one
  static number works across scale factors.
* ``maxPartitionBytes`` keeps scan tasks ~128 MB so a 100 TB input becomes
  ~800k tasks — fine for a 1000-executor cluster, and AQE handles the rest.
* Arrow is enabled for every pandas-UDF boundary (the only Python hot paths
  in this engine are Arrow-batched, never row-at-a-time).
* Session timezone pinned to UTC so timestamp semantics are stable across
  driver environments (and match DuckDB's naive timestamps in the oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_session(
    app_name: str = "spark_text_clustering_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else ``local[*]``)
    — on a real cluster the master comes from spark-submit and this argument
    is left None, in which case we do not override it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone to UTC (runtime-settable, idempotent).

    Query callables that touch timestamps call this defensively because the
    harness may hand us a session it built itself.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
