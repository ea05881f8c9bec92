"""Bucketing: the shuffle-elision strategy docs/SCALE.md prescribes for the
100 TB fact⋈fact join — written small here, plan-asserted.

Writing orders and lineitem bucketed by the join key lets the sort-merge
join read co-located buckets with NO exchange on either side.
"""

import pytest
from pyspark.sql import functions as F

from spark_text_clustering_spark.catalog import load_table

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckets LOCATION '{wh}'")
    orders = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("buckets.orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("buckets.lineitem_b")
    )
    yield spark.table("buckets.orders_b"), spark.table("buckets.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS buckets.orders_b")
    spark.sql("DROP TABLE IF EXISTS buckets.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS buckets")


def test_bucketed_join_elides_shuffle(spark, bucketed):
    orders_b, lineitem_b = bucketed
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = orders_b.join(lineitem_b, orders_b.o_orderkey == lineitem_b.l_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        plan = spark._jvm.PythonSQLUtils.explainString(j._jdf.queryExecution(), "formatted")
        assert "SortMergeJoin" in plan
        assert "Arguments: hashpartitioning" not in plan  # no exchange on either side
        assert "Bucketed: true" in plan
        # and it computes the right thing
        expected = (
            load_table(spark, SF_SMALL, "orders")
            .join(
                load_table(spark, SF_SMALL, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
