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

Round-13 advice hardening: substitution is a targeted ``{name}`` token
replace (NOT ``str.format``), so SQL containing literal braces — regexp
quantifiers like ``'{2,3}'``, JSON literals — passes through untouched
instead of raising at plan construction; and each call's view names carry
a process-unique counter suffix, so concurrent plan construction in one
session (two threads building plans that use the same frame keyword)
cannot clobber each other's catalog entries.

CREATE TEMPORARY FUNCTION statements issued alongside these views are a
different lifetime: a SQL UDF/TVF body is inlined at analysis but the
function NAME must stay resolvable, so function registrations are left
session-scoped on purpose (they are idempotent CREATE OR REPLACE).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

_CALL_COUNTER = itertools.count()  # itertools.count() is thread-safe (GIL-atomic)


def sql_over(
    spark: SparkSession,
    sql_fmt: str,
    sql_args: dict | None = None,
    **frames: DataFrame,
) -> DataFrame:
    """Analyze ``sql_fmt`` with each keyword frame visible as a temp view.

    ``sql_fmt`` references each frame by a literal ``{name}`` token; the
    actual catalog names are ``_stc_<name>_<k>`` (``k`` a per-call
    counter, unique per registration within the process) and are dropped
    before this returns, so repeated or concurrent calls leave no catalog
    residue and cannot clobber user views or each other. Only the exact
    ``{name}`` tokens for the frames passed are replaced — any other
    brace sequence in the SQL (regexp quantifiers, JSON) is left intact.
    ``sql_args`` passes through to parameterized ``spark.sql`` (named
    ``:param`` binding).
    """
    k = next(_CALL_COUNTER)
    views = {name: f"_stc_{name}_{k}" for name in frames}
    sql = sql_fmt
    for name, view in views.items():
        sql = sql.replace("{" + name + "}", view)
    for name, df in frames.items():
        df.createOrReplaceTempView(views[name])
    try:
        if sql_args is not None:
            return spark.sql(sql, args=sql_args)
        return spark.sql(sql)
    finally:
        for view in views.values():
            spark.catalog.dropTempView(view)
