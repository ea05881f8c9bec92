#!/usr/bin/env python
"""Dump .explain('formatted') for registry keys to plans/<tag>/<key>_<suffix>.txt.

Usage: python scripts/dump_plans.py <repo_dir> <out_dir> <suffix> <key> [<key> ...]

Runs against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). The
<repo_dir> is inserted at the front of sys.path so the same script can
dump plans from a git worktree of an older tree (the "_before" files).
EAGER keys execute their setup work during construction; only the plan of
the returned frame is recorded.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    repo_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    keys = sys.argv[4:]
    sys.path.insert(0, repo_dir)
    import importlib

    mod = importlib.import_module("__spark_entry__")
    from spark_text_clustering_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("dump-plans", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = mod.queries()
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for key in keys:
        if key not in queries:
            print(f"{key}: NOT IN REGISTRY", file=sys.stderr)
            continue
        try:
            df = queries[key](spark, sf_dir)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # pragma: no cover - diagnostic path
            text = f"ERROR building plan: {exc}"
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
