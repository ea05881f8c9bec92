"""Unit contract for the tracked-checkpoint helpers (round 13).

The kernels exercise these end-to-end; this file pins the helper-level
contract so a refactor can't silently weaken it: lazy marks register
pinnable ids immediately, a full aggregate materializes the blocks and
truncates lineage, drop_ckpt is idempotent, and dropping a MATERIALIZED
predecessor after its successor materialized leaves the successor
readable (the exact safety order the loops rely on)."""

from pyspark.sql import functions as F

from spark_text_clustering_spark.ckpt import (
    ckpt_tracked,
    ckpt_tracked_lazy,
    drop_ckpt,
)


def _pinned_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())


def test_lazy_mark_registers_ids_before_materialization(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("y"))
    before = _pinned_ids(spark)
    out, ids = ckpt_tracked_lazy(df)
    assert ids and ids <= (_pinned_ids(spark) - before)
    drop_ckpt(out, ids)


def test_full_aggregate_materializes_and_successor_survives_drop(spark):
    """The loop pattern: round0 (lazy) -> round1 (lazy) built on it; a
    full aggregate over round1 materializes BOTH (round1's lineage pulls
    round0); dropping round0 afterwards must leave round1 readable."""
    base = spark.range(1000).select("id", (F.col("id") % 7).alias("k"))
    r0, ids0 = ckpt_tracked_lazy(base)
    r1, ids1 = ckpt_tracked_lazy(r0.select("id", (F.col("k") + 1).alias("k")))
    n = r1.groupBy("k").count().count()  # full shuffle: materializes r1
    assert n == 7
    drop_ckpt(r1, ids0)  # predecessor dead per the loop contract
    # r1 must still be fully readable after its predecessor's blocks left
    assert r1.count() == 1000
    assert r1.groupBy("k").count().count() == 7
    drop_ckpt(r1, ids1)


def test_drop_is_idempotent(spark):
    df, ids = ckpt_tracked(spark.range(10).select("id"))
    drop_ckpt(df, ids)
    drop_ckpt(df, ids)  # second drop of the same ids: no-op, no raise


def test_ancestors_property_set_and_intermediate_finalized(spark):
    """ADVICE r13: with checkpointAllMarkedAncestors unset, an
    intermediate lazily-marked frame computed only as an ancestor of a
    newer marked frame is persisted but never checkpoint-FINALIZED — its
    lineage still references predecessor blocks. The helpers set the
    local property so the next action finalizes every marked ancestor
    (true lineage truncation per round, as on a real cluster)."""
    base = spark.range(200).select("id", (F.col("id") % 5).alias("k"))
    r0, ids0 = ckpt_tracked_lazy(base)
    r1, ids1 = ckpt_tracked_lazy(r0.select("id", (F.col("k") + 1).alias("k")))
    assert (
        spark.sparkContext.getLocalProperty(
            "spark.checkpoint.checkpointAllMarkedAncestors"
        )
        == "true"
    )
    r1.groupBy("k").count().count()  # materializing action over r1
    # the INTERMEDIATE r0's marked RDD must be checkpoint-finalized too,
    # not just r1's (doCheckpoint would stop at the first marked RDD from
    # the top without the property)
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids0 | ids1:
        assert m.containsKey(i)
        assert m[i].rdd().isCheckpointed(), f"marked RDD {i} not finalized"
    drop_ckpt(r1, ids0 | ids1)


def test_eager_and_lazy_agree_on_rows(spark):
    base = spark.range(500).select("id", (F.col("id") * 3).alias("v"))
    e, ide = ckpt_tracked(base)
    l, idl = ckpt_tracked_lazy(base)
    assert sorted(r["v"] for r in l.collect()) == sorted(
        r["v"] for r in e.collect()
    )
    drop_ckpt(e, ide | idl)
