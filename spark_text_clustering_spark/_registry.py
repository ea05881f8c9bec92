"""Tiny per-module query registry.

Each operator module instantiates a ``Registry`` and decorates its query
functions with ``@REG.register(key, oracle=...)``. The top-level
``registry.py`` merges them into the single QUERIES/ORACLES maps consumed
by ``/root/repo/__spark_entry__.py``.

Contract (driver-imposed, see SURVEY §0): every query callable takes
``(spark, sf_dir)`` and returns a DataFrame whose column names exactly
match the oracle SQL's output names; oracle=None means the operator is not
ANSI-SQL-expressible and gets the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


class Registry:
    def __init__(self) -> None:
        self.queries: dict[str, QueryFn] = {}
        self.oracles: dict[str, str] = {}

    def register(self, key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
        def deco(fn: QueryFn) -> QueryFn:
            if key in self.queries:
                raise ValueError(f"duplicate query key {key!r}")
            self.queries[key] = fn
            if oracle is not None:
                self.oracles[key] = oracle
            return fn

        return deco

    def merge(self, *others: "Registry") -> "Registry":
        for o in others:
            for k, v in o.queries.items():
                if k in self.queries:
                    raise ValueError(f"duplicate query key {k!r} across modules")
                self.queries[k] = v
            self.oracles.update(o.oracles)
        return self
