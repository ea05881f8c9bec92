"""Guard for bench.py's EAGER_KEYS classification (round 9, VERDICT r8 #6).

The bench times `df.write(noop)` for lazy keys and construction+write for
EAGER_KEYS — keys whose registered callable does driver-side work (model
fits, iterative localCheckpoint loops, streaming replays) before the
returned frame exists. Twice now a new eager key was benched lazily and
reported a fictitious number (round-5 `bpe_train_merges` 0.24 s vs ~3.8 s
real; round-8 `graph_connected_components` 0.014 s vs ~5 s real). This test
mechanizes the check: any HEADLINE key that launches Spark jobs at
plan-construction time MUST be in EAGER_KEYS.

Detection is exact, not time-threshold based: each candidate key is
constructed twice (the first call warms per-app memos, matching the bench's
warmup pass) and the second construction runs inside a dedicated job group;
`statusTracker().getJobIdsForGroup` then reports every job it launched.
Zero jobs == genuinely lazy. Keys already in EAGER_KEYS are skipped — their
timer already wraps construction, so running their (expensive) eager work
here would only slow the suite.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import bench
from spark_text_clustering_spark.registry import QUERIES

from .conftest import SF_SMALL

_LAZY_HEADLINE = sorted(set(bench.HEADLINE) - bench.EAGER_KEYS)


def test_eager_keys_are_headline_keys():
    unknown = bench.EAGER_KEYS - set(bench.HEADLINE)
    assert not unknown, f"EAGER_KEYS not in HEADLINE (stale entries?): {unknown}"


@pytest.mark.parametrize("key", _LAZY_HEADLINE)
def test_lazy_headline_key_launches_no_construction_jobs(spark, key):
    sc = spark.sparkContext
    QUERIES[key](spark, SF_SMALL)  # warm memos, as the bench's warmup pass does
    gid = f"eager-guard-{key}"
    sc.setJobGroup(gid, gid)
    try:
        QUERIES[key](spark, SF_SMALL)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup(gid)
    assert not jobs, (
        f"{key} launched {len(jobs)} Spark job(s) at plan-construction time "
        f"but is not in bench.EAGER_KEYS — its bench timing would miss that "
        f"work (the round-5 bpe / round-8 CC bug class). Add it to EAGER_KEYS."
    )
