"""Whole-file text corpus source — reference S1
(``sc.wholeTextFiles(paths).map(_._2)``, LDAClustering.scala:113, 213) as a
DataFrame source.

The reference's comma-in-path quirk: Spark's path string treats ``,`` as a
glob separator, so the loader rewrites ``,`` → ``?`` (single-char wildcard)
before scanning (LDALoader.scala:81). We accept a *list* of paths instead —
no string munging, no wildcard collisions.

Scale: ``wholetext`` makes one row per file (the unit the NLP pipeline
needs). Each task reads whole files, so partition count tracks file count;
for millions of small files at 100 TB, compact to parquet first (this
module's ``corpus_to_parquet``) — the testdata ``documents`` table is
exactly that compacted form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """One row per file: (path, text). Reference D1 (`RDD[String]` of whole
    books) with provenance kept instead of dropped (P1 projected it away)."""
    if isinstance(paths, str):
        paths = [paths]
    df = spark.read.text(paths, wholetext=True)
    return df.select(
        F.input_file_name().alias("path"),
        F.col("value").alias("text"),
    )


def read_stopwords(spark: SparkSession, path: str) -> list[str]:
    """Reference S2: single-line comma-separated stopword file collected to
    the driver (LDATraining.scala:19-20; parse at LDAClustering.scala:
    125-129 — flatMap split(","), stripMargin). Tiny side input — a plain
    driver read is correct at any scale."""
    from ..functions.textnorm import parse_stopword_text

    rows = spark.read.text(path).collect()
    words: list[str] = []
    for r in rows:
        words.extend(parse_stopword_text(r["value"]))
    return words


_STOPWORD_MEMO: dict[tuple[str, str], list[str]] = {}


def read_stopwords_cached(spark: SparkSession, path: str) -> list[str]:
    """``read_stopwords`` memoized per (application, path) — the side
    input is a static model-sized parameter, so query functions that
    load it at plan-construction time (stopword_filter_reference, the
    German flagship) stay construction-lazy after the first call (the
    bench's eager-guard contract, tests/test_bench_eager.py). A cluster
    deployment would broadcast the list once for the same reason."""
    key = (spark.sparkContext.applicationId, path)
    if key not in _STOPWORD_MEMO:
        _STOPWORD_MEMO[key] = read_stopwords(spark, path)
    return _STOPWORD_MEMO[key]


def corpus_to_parquet(corpus: DataFrame, out_path: str) -> None:
    """Compact a whole-file corpus to parquet (doc_id via deterministic
    path-ordered ids — reference R1 ``zipWithIndex`` is partition-order
    dependent; a window over path is reproducible)."""
    from pyspark.sql import Window

    with_id = corpus.withColumn(
        "doc_id", F.row_number().over(Window.orderBy("path")).cast("long") - 1
    )
    with_id.select("doc_id", "path", "text").write.mode("overwrite").parquet(out_path)
