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
