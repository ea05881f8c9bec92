"""Typed schema registry + loader for the engine's tables.

The reference has no tables at all — its "schema" is Scala static types on
RDDs (SURVEY §1). Here every table gets an explicit ``StructType`` (never
inferred at runtime) and a single ``load_table`` entry point.

Scale notes: parquet scans go through Spark's vectorized reader; passing an
explicit schema skips footer-based inference on huge directory trees, and
column pruning / predicate pushdown happen automatically because every
downstream operator is declarative (check ``.explain`` for ``ReadSchema`` /
``PushedFilters``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


SCHEMAS: dict[str, StructType] = {
    "region": _s(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _s(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _s(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    "events": _s(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _s(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _s(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

TABLES = tuple(SCHEMAS)

# events.ts is stored as parquet TIMESTAMP(NANOS), which Spark's reader
# rejects outright (PARQUET_TYPE_ILLEGAL). The supported path: read nanos
# as LongType (legacy nanosAsLong conf) and convert to TimestampType via
# integer division to microseconds — exactly what DuckDB does internally
# when it truncates ns → µs, so both engines see identical values.
# (orders.o_orderdate / lineitem.l_shipdate are TIMESTAMP(MILLIS), which
# Spark reads natively — do NOT route them through the nanos workaround:
# nanosAsLong surfaces ms values as raw longs and a ÷1000 would be off by
# 10^3.)
_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
}


def _read_schema(name: str) -> StructType:
    ts_cols = set(_TS_COLS.get(name, ()))
    return StructType(
        [
            StructField(f.name, LongType() if f.name in ts_cols else f.dataType, True)
            for f in SCHEMAS[name].fields
        ]
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table with its declared schema.

    Mirrors the reference's whole-file corpus scan role for ``documents``
    (sc.wholeTextFiles — LDAClustering.scala:113) but through the columnar,
    prunable, pushdown-capable parquet path.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    ts_cols = _TS_COLS.get(name, ())
    if not ts_cols:
        return spark.read.schema(SCHEMAS[name]).parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.schema(_read_schema(name)).parquet(path)
    from pyspark.sql import functions as F

    for c in ts_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df.select(*[f.name for f in SCHEMAS[name].fields])


def stream_events(spark: SparkSession, src_dir: str) -> DataFrame:
    """``readStream`` variant of ``load_table`` for the events table (same
    nanos→micros timestamp conversion, file-source directory scan)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.readStream.schema(_read_schema("events")).parquet(src_dir)
    df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.select(*[f.name for f in SCHEMAS["events"].fields])
