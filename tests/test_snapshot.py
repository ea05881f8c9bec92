"""foreachBatch snapshot maintenance: after replaying all chunks, the
snapshot equals the batch 'latest event per user'."""

from pyspark.sql import functions as F

from spark_text_clustering_spark.catalog import load_table
from spark_text_clustering_spark.streaming.snapshot import (
    _latest_per_user,
    maintain_user_snapshot,
)

from .conftest import SF_SMALL


def test_snapshot_equals_batch_latest(spark, tmp_path):
    snap = maintain_user_snapshot(spark, SF_SMALL, str(tmp_path / "snap"), n_chunks=3)
    batch = _latest_per_user(load_table(spark, SF_SMALL, "events"))
    got = {tuple(r) for r in snap.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    # exactly one row per user
    assert snap.count() == snap.select("user_id").distinct().count()
