"""Every registered query must emit an ATOMIC output schema.

External comparison harnesses canonicalize results with a pandas
``sort_values`` over all columns; array/map/struct cells raise
``TypeError: unhashable type: 'list'`` there, so any non-atomic output
column is a latent correctness failure no matter how right the values
are. Queries that conceptually produce collections serialize them
deterministically (``concat_ws`` over a ``sort_array`` where order isn't
already defined) and mirror the serialization in the DuckDB oracle.

This test builds every registered query's plan at sf0.001 and asserts
the contract, so a new array-returning registration fails CI instead of
failing an external sampling round later.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from spark_text_clustering_spark.registry import QUERIES

from .conftest import SF_SMALL

ATOMIC_TYPES = (
    T.StringType,
    T.IntegerType,
    T.LongType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.FloatType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DecimalType,
)


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_registered_query_schema_is_atomic(spark, key):
    df = QUERIES[key](spark, SF_SMALL)
    nonatomic = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if not isinstance(f.dataType, ATOMIC_TYPES)
    ]
    assert not nonatomic, (
        f"query {key!r} emits non-atomic output columns {nonatomic}; "
        "serialize them (concat_ws/array_join/to_json) and mirror the "
        "serialization in the oracle"
    )
