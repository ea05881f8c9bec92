"""Shared streaming helpers."""

from __future__ import annotations


def await_drain(q, timeout_sec: int, what: str = "stream") -> None:
    """``awaitTermination(timeout)`` returns False on timeout with the
    query STILL RUNNING — every caller in this package reads the query's
    output (memory table / parquet store) right after, so proceeding on a
    timeout means reading state a live writer may still be mutating (and
    demo teardown may delete dirs under it). Stop the query and fail
    loudly instead (round-7 ADVICE fix)."""
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"{what} did not drain within {timeout_sec}s")


from contextlib import contextmanager


@contextmanager
def state_grain(spark, n_partitions: int):
    """Pin ``spark.sql.shuffle.partitions`` to a state-key-matched grain
    for the duration of a streaming replay (round 14).

    The stateful operators here key on a handful of groups (3-4 tumbling
    windows, a bounded user slice), but the state store, its per-batch
    commit, and the Arrow/Python state workers are all instantiated PER
    SHUFFLE PARTITION PER MICROBATCH — at the relational default (32)
    that is ~10x more state machinery than state keys, pure overhead
    (measured: heavy-hitters replay 17.7 -> 12.0 s cold / 9.9 -> 8.7
    warm at grain 8; EWMA 13.0 -> 10.6 / 7.8 -> 7.2). At scale the same
    rule applies upward: size state partitions to key cardinality and
    state-store volume, not to the batch shuffle default. The conf is
    captured by the query at start(); restored on exit either way.
    Partition count never affects results — only placement."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n_partitions))
    try:
        yield
    finally:
        spark.conf.set(key, old)
