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

    # idempotence: replaying batch 2 as a NEW batch adds nothing
    out3 = incremental_dedup(spark, batch2, store)
    assert out3.count() == 0


def test_incremental_dedup_retry_idempotent(spark, tmp_path):
    """A batch retried with the SAME batch_id (crash after commit, failed
    downstream consumer, speculative re-run) must return the same
    survivors and leave exactly one fingerprint per hash in the store —
    the double-append failure mode of a plain append store."""
    store = str(tmp_path / "fp_store_retry")
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    batch1 = docs.where(F.col("doc_id") < 250)

    out1 = incremental_dedup(spark, batch1, store, batch_id="ingest-001")
    n1 = out1.count()
    assert n1 > 0

    # retry of the SAME batch: returns the same survivors (its own partial
    # fingerprints are invisible to the anti-join), not zero
    out_retry = incremental_dedup(spark, batch1, store, batch_id="ingest-001")
    assert out_retry.count() == n1
    assert {r["h"] for r in out_retry.collect()} == {r["h"] for r in out1.collect()}

    # store holds exactly ONE fingerprint per hash — no double append
    store_df = spark.read.parquet(store)
    assert store_df.count() == n1
    assert store_df.select("h").distinct().count() == n1

    # a later batch replaying the same docs under a new id dedups to zero
    out2 = incremental_dedup(spark, batch1, store, batch_id="ingest-002")
    assert out2.count() == 0

    # the lazy returned frame stays correct when consumed AFTER the commit
    # (the old append store returned [] here: the write made the batch's
    # own fingerprints part of its history)
    assert out_retry.count() == n1
