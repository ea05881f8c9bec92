"""Short-lived namespaced temp views for SQL-surface operators.

Round-12 advice: operator modules used to register fixed-name
session-global temp views ('boot_means', 'naaj_orders', ...) at
plan-construction time. That clobbers any same-named user view and leaves
catalog residue per call — the surface grew to ~17 sites across seven
modules. Spark analyzes ``spark.sql()`` eagerly (name resolution happens
when the DataFrame is created, not when it executes), so the catalog
entry is only needed for the duration of the ``spark.sql`` call itself:
register each frame under a ``_stc_``-prefixed name, analyze, drop, and
return the self-contained analyzed plan.

CREATE TEMPORARY FUNCTION statements issued alongside these views are a
different lifetime: a SQL UDF/TVF body is inlined at analysis but the
function NAME must stay resolvable, so function registrations are left
session-scoped on purpose (they are idempotent CREATE OR REPLACE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def sql_over(
    spark: SparkSession,
    sql_fmt: str,
    sql_args: dict | None = None,
    **frames: DataFrame,
) -> DataFrame:
    """Analyze ``sql_fmt`` with each keyword frame visible as a temp view.

    ``sql_fmt`` references each frame by ``{name}`` (str.format); the
    actual catalog names are ``_stc_<name>`` and are dropped before this
    returns, so repeated calls leave no catalog residue and cannot
    clobber user views. ``sql_args`` passes through to parameterized
    ``spark.sql`` (named ``:param`` binding).
    """
    views = {name: f"_stc_{name}" for name in frames}
    for name, df in frames.items():
        df.createOrReplaceTempView(views[name])
    try:
        if sql_args is not None:
            return spark.sql(sql_fmt.format(**views), args=sql_args)
        return spark.sql(sql_fmt.format(**views))
    finally:
        for view in views.values():
            spark.catalog.dropTempView(view)
