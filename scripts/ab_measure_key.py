"""A/B adjudication runner: measure one registry key in a given repo.

Usage: python /tmp/measure_key.py <repo_path> <key> [n_runs]
Prints one JSON line {repo, key, runs, t_construct, t_write, load1}.
Mirrors bench.py's _measure protocol (warmup + N measured noop-sink runs,
eager keys timed construct+write) but runs in its own process so each
invocation is a fresh JVM — the isolated protocol used for the r12
CC adjudication.
"""
import json
import os
import sys
import time

repo, key = sys.argv[1], sys.argv[2]
n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
sys.path.insert(0, repo)
os.chdir(repo)

from spark_text_clustering_spark.registry import QUERIES
from spark_text_clustering_spark.session import get_session
import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = get_session("ab-adjudicate", master=f"local[{CPUS}]")
spark.sparkContext.setLogLevel("ERROR")
QUERIES["count_rows"](spark, SF_DIR).collect()  # warm JVM + footers

eager = key in bench.EAGER_KEYS
build = lambda: QUERIES[key](spark, SF_DIR)
build().write.format("noop").mode("overwrite").save()  # warmup
totals, constructs, writes, loads = [], [], [], []
for _ in range(n_runs):
    loads.append(round(os.getloadavg()[0], 1))
    t0 = time.perf_counter()
    df = build()
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    totals.append(round((t2 - t0) if eager else (t2 - t1), 3))
    constructs.append(round(t1 - t0, 3))
    writes.append(round(t2 - t1, 3))
print(json.dumps({
    "repo": repo, "key": key, "eager": eager, "runs": totals,
    "t_construct": constructs, "t_write": writes, "load1": loads,
}))
spark.stop()
