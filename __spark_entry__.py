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


def _driver_sample_history() -> dict[str, int]:
    """Map key -> highest round number whose committed CORRECTNESS_r*.json
    sampled it (absent = never driver-confirmed).

    The driver samples the first ~50 keys of queries() each round; after
    11 rounds only 81/291 registry keys had ever been driver-confirmed
    (VERDICT r11 "Next round" #2). Rotating never-sampled keys to the
    front of the dict spends each round's 50-key correctness budget on
    fresh keys; once every key has been sampled, least-recently-sampled
    ordering keeps the window cycling instead of re-confirming the same
    front forever.
    """
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            for k in data:
                last[k] = max(last.get(k, 0), rnd)
    return last


# Keys added THIS round lead the rotation (ADVICE r11: the committed
# artifact should evidence every new operator), followed by the
# never-driver-sampled SURVEY §2 text keys the judge called out by name
# (VERDICT r11 #2), so the core reference operators get driver-confirmed
# before the long tail.
_ROTATION_PRIORITY = [
    "stopword_filter_reference",
    "flagship_top_terms_de",
    "quality_gopher_rules",
    "lang_id_confusion_eval",
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
    correctness window come first (new-this-round and judge-named §2
    text keys leading, then registry order); previously-confirmed keys
    follow, least-recently-sampled first, so the window keeps cycling
    after full coverage is reached. Same key set as the registry either
    way.
    """
    last = _driver_sample_history()
    prio = [k for k in _ROTATION_PRIORITY if k in QUERIES and k not in last]
    fresh = [k for k in QUERIES if k not in last and k not in prio]
    order = {k: i for i, k in enumerate(QUERIES)}
    rest = sorted(
        (k for k in QUERIES if k in last), key=lambda k: (last[k], order[k])
    )
    return {k: QUERIES[k] for k in (*prio, *fresh, *rest)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per SQL-expressible query key."""
    return dict(ORACLES)
