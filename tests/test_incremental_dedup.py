"""Incremental dedup against a persistent fingerprint store: batch 2 must
drop everything already ingested in batch 1, and re-running is idempotent."""

from pyspark.sql import functions as F

from spark_text_clustering_spark.catalog import load_table
from spark_text_clustering_spark.operators.dedup import incremental_dedup

from .conftest import SF_SMALL


def test_incremental_dedup_two_batches(spark, tmp_path):
    store = str(tmp_path / "fp_store")
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    n_distinct = docs.select("text").distinct().count()

    batch1 = docs.where(F.col("doc_id") < 250)
    b1_distinct = batch1.select("text").distinct().count()
    out1 = incremental_dedup(spark, batch1, store)
    assert out1.count() == b1_distinct

    # batch 2 = rest of corpus PLUS a full replay of batch 1 (late dupes)
    batch2 = docs.where(F.col("doc_id") >= 250).unionByName(
        batch1.select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
    )
    out2 = incremental_dedup(spark, batch2, store)
    # survivors across both batches = corpus-distinct texts
    assert out1.count() + out2.count() == n_distinct

    # idempotence: replaying batch 2 adds nothing
    out3 = incremental_dedup(spark, batch2, store)
    assert out3.count() == 0
