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


def _plan(spark, df):
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_join_planner_three_regimes(spark, bucketed):
    """Round-6 stats gate: the cost probe must pick the right physical
    strategy in each size/layout regime, and the resulting plan must
    actually carry it (hint honored / exchange elided / exchange present)."""
    from spark_text_clustering_spark.operators.join_planner import (
        choose_join_strategy,
        join_with_strategy,
    )

    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    nation = load_table(spark, SF_SMALL, "nation")

    # regime 1: one side under the broadcast budget -> broadcast, the
    # small side is the one shipped, and the plan is a BroadcastHashJoin
    j, d = join_with_strategy(
        spark, orders, nation, ["o_custkey"], ["n_nationkey"]
    )
    assert d["strategy"] == "broadcast" and d["broadcast_side"] == "right"
    assert d["right_bytes"] < d["left_bytes"]
    assert "BroadcastHashJoin" in _plan(spark, j)

    # regime 2: both sides over budget, both bucketed on the join keys
    # with equal counts -> bucketed SMJ with NO exchange on either side
    j, d = join_with_strategy(
        spark, "buckets.orders_b", "buckets.lineitem_b",
        ["o_orderkey"], ["l_orderkey"], broadcast_threshold=1024,
    )
    assert d["strategy"] == "bucketed", d
    plan = _plan(spark, j.select("o_orderkey", "l_quantity"))
    assert "SortMergeJoin" in plan
    assert "Arguments: hashpartitioning" not in plan
    assert "Bucketed: true" in plan

    # regime 3: both sides over budget, no layout -> shuffle SMJ, and the
    # exchanges are really there
    j, d = join_with_strategy(
        spark, orders, lineitem, ["o_orderkey"], ["l_orderkey"],
        broadcast_threshold=1024,
    )
    assert d["strategy"] == "shuffle", d
    plan = _plan(spark, j.select("o_orderkey", "l_quantity"))
    assert "SortMergeJoin" in plan
    assert "hashpartitioning" in plan

    # the probe alone (no join) returns an auditable record
    d = choose_join_strategy(
        spark, orders, nation, ["o_custkey"], ["n_nationkey"]
    )
    assert d["reason"] and d["left_bytes"] > 0

    # a bucketed table joined on a NON-bucket key must not claim elision
    d = choose_join_strategy(
        spark, "buckets.orders_b", "buckets.lineitem_b",
        ["o_custkey"], ["l_partkey"], broadcast_threshold=1024,
    )
    assert d["strategy"] == "shuffle"

    # strategies never change answers: bucketed-path count == plain join
    n_plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
    )
    j, _ = join_with_strategy(
        spark, "buckets.orders_b", "buckets.lineitem_b",
        ["o_orderkey"], ["l_orderkey"], broadcast_threshold=1024,
    )
    assert j.count() == n_plain


def test_parse_byte_string_units():
    """round-7 ADVICE regression: the broadcast-threshold conf accepts
    Spark size strings with unit suffixes; the probe must parse every
    legal spelling instead of crashing on anything but plain digits."""
    import pytest

    from spark_text_clustering_spark.operators.join_planner import (
        _parse_byte_string,
    )

    assert _parse_byte_string("10485760") == 10485760
    assert _parse_byte_string("10485760b") == 10485760
    assert _parse_byte_string("10MB") == 10 * 1024 * 1024
    assert _parse_byte_string("10mb") == 10 * 1024 * 1024
    assert _parse_byte_string("1g") == 1 << 30
    assert _parse_byte_string("2GB") == 2 << 30
    assert _parse_byte_string("512k") == 512 << 10
    assert _parse_byte_string("1t") == 1 << 40
    assert _parse_byte_string("-1") == -1  # broadcast disabled sentinel
    assert _parse_byte_string(" 5 m ") == 5 << 20
    with pytest.raises(ValueError):
        _parse_byte_string("10XB")
    with pytest.raises(ValueError):
        _parse_byte_string("MB")
