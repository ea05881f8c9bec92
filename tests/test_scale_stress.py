"""Scale-stress smoke: run the text-pipeline-heavy queries on a corpus
inflated 10x in-memory (50k docs). Catches designs that only work at
testdata size (quadratic pair spaces, driver-sized state, per-row
recompute) without needing bigger on-disk fixtures."""

import time

import pytest
from pyspark.sql import functions as F

from spark_text_clustering_spark.catalog import load_table
from spark_text_clustering_spark.plans.flagship import flagship_top_terms_per_lang

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def inflated_docs(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    out = None
    for i in range(10):
        part = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        out = part if out is None else out.unionByName(part)
    out = out.repartition(32).cache()
    out.count()
    yield out
    out.unpersist()


def test_flagship_at_10x(spark, inflated_docs):
    inflated_docs.createOrReplaceTempView("docs10x")
    tokens = (
        inflated_docs.select("lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    t0 = time.perf_counter()
    n = tokens.count()
    dt = time.perf_counter() - t0
    assert n > 0
    assert dt < 30, f"10x token count took {dt:.1f}s — partial agg regressed?"


def test_exact_dedup_at_10x(spark, inflated_docs):
    """Hash-dedup over 50k docs (10 exact copies of each text + the
    doubled-ids design means every text appears 10x)."""
    t0 = time.perf_counter()
    deduped = (
        inflated_docs.withColumn("h", F.sha2("text", 256))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_dupes"))
    )
    rows = deduped.count()
    dt = time.perf_counter() - t0
    base = load_table(spark, SF_ORACLE, "documents").select("text").distinct().count()
    assert rows == base  # every distinct text collapses to one survivor
    assert dt < 30


def test_simhash_bands_at_10x(spark, inflated_docs):
    """SimHash candidate generation must stay band-join-shaped (no n^2):
    50k docs with 10 guaranteed copies each -> pairs exist, bounded time."""
    from pyspark.sql.functions import pandas_udf

    from spark_text_clustering_spark.operators.dedup import _simhash_series

    simhash_udf = pandas_udf(_simhash_series, "long")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    sig = inflated_docs.select("doc_id", simhash_udf(toks).alias("simhash"))
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    t0 = time.perf_counter()
    # candidate count per band bucket stays bounded — identical docs share
    # ALL bands, so count pairs in one band only for the assertion
    one_band = bands.where(F.col("band") == 0)
    a, b = one_band.alias("a"), one_band.alias("b")
    n_pairs = (
        a.join(b, (F.col("a.key") == F.col("b.key")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .count()
    )
    dt = time.perf_counter() - t0
    assert n_pairs >= 45 * 500  # each of 500 texts has C(10,2)=45 copy-pairs
    assert dt < 60


def test_heavy_hitters_sketch_pass_at_10x(spark, inflated_docs):
    """The CMS sketch pass over 50k docs must stay partition-count-sized:
    candidates + P sketch rows, never a vocabulary-sized collect."""
    from spark_text_clustering_spark.operators import sketches as sk

    tokens = inflated_docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
    ).where(F.length("token") >= 1)
    t0 = time.perf_counter()
    rows = tokens.mapInPandas(
        sk._partition_sketch,
        schema="kind string, token string, local_cnt long, cms array<long>",
    ).collect()
    dt = time.perf_counter() - t0
    n_parts = sum(1 for r in rows if r["kind"] == "cms")
    n_cand = sum(1 for r in rows if r["kind"] == "cand")
    assert n_parts <= 64
    # candidate rows are threshold-gated, not vocabulary-sized
    assert n_cand < 5_000, f"{n_cand} candidates — local threshold broken?"
    assert dt < 60, f"sketch pass took {dt:.1f}s"


def test_jpeg_decode_at_10x(spark, inflated_docs):
    """10x-corpus real JPEG encode+decode round trips across all cores:
    the codec stage must parallelize (id-only repartition) and finish in
    bounded time."""
    from spark_text_clustering_spark.operators.multimodal import (
        _extract_features,
        _make_jpeg_payloads,
    )

    ids = (
        inflated_docs.select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    t0 = time.perf_counter()
    n = (
        ids.mapInPandas(_make_jpeg_payloads, schema="doc_id long, payload binary")
        .mapInPandas(
            _extract_features,
            schema="doc_id long, width int, height int,"
            " n_pixels long, sum_pixels long, codec string",
        )
        .count()
    )
    dt = time.perf_counter() - t0
    assert n == inflated_docs.count()
    assert dt < 90, f"10x JPEG round trips took {dt:.1f}s"


def test_duplicate_spans_at_10x_total_duplication(spark, inflated_docs):
    """Worst case for the span detector: EVERY doc has 9 exact copies, so
    every 30-gram is cross-doc duplicated and every position is a hit —
    the maximal hit volume the gaps-and-islands merge can face. The
    pipeline must stay linear (measured ~5 s for 5k docs / ~10M grams on
    local[32]) and the output must be exactly ONE maximal span per doc
    covering the whole text (positions 1 .. len-29)."""
    from pyspark.sql import Window

    L = 30
    grams = (
        inflated_docs.where(F.length("text") >= L)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text") - L + 1)).alias("pos"),
            "text",
        )
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.xxhash64(F.substring("text", F.col("pos"), F.lit(L))).alias("gh"),
            F.length("text").alias("tlen"),
        )
        .localCheckpoint(eager=True)
    )
    dup = (
        grams.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gh")
    )
    hits = grams.join(dup, "gh", "leftsemi").select("doc_id", "pos", "tlen")
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = hits.withColumn(
        "ni",
        F.when(
            F.lag("pos").over(w).isNull() | (F.col("pos") - F.lag("pos").over(w) > L),
            1,
        ).otherwise(0),
    )
    isl = flagged.withColumn(
        "island", F.sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + L - 1).alias("span_end"),
        F.first("tlen").alias("tlen"),
    )
    n_docs = inflated_docs.where(F.length("text") >= L).count()
    assert spans.count() == n_docs  # exactly one island per doc
    # and each island covers the entire document
    bad = spans.where(
        (F.col("span_start") != 1) | (F.col("span_end") != F.col("tlen"))
    ).count()
    assert bad == 0


def test_strided_spans_at_10x_total_duplication(spark, inflated_docs, tmp_path):
    """Worst case for the STRIDED detector (round 6): with every doc
    9-way duplicated, every seed passes the Bloom (the prefilter saves
    nothing) and the discovery join fans out by the duplication factor —
    the regime where a quadratic term would explode. It must stay linear
    in (docs x copies) (measured 14.7 s for 5k docs on local[32]) and
    agree with the full scan's known answer: exactly one maximal span
    per doc covering the whole text."""
    import os

    from pyspark.sql import functions as F

    from spark_text_clustering_spark.operators.dedup import (
        dup_spans_strided_frames,
    )

    d = str(tmp_path / "strided_stress_sf")
    os.makedirs(d)
    inflated_docs.repartition(8).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    t0 = time.perf_counter()
    res = dup_spans_strided_frames(spark, d)["result"]
    n_spans = res.count()
    dt = time.perf_counter() - t0
    n_docs = inflated_docs.where(F.length("text") >= 30).count()
    assert n_spans == n_docs  # one maximal span per (fully duplicated) doc
    assert res.where(F.col("span_start") != 1).count() == 0
    assert dt < 45, f"strided spans at 10x took {dt:.1f}s — fan-out regressed?"
