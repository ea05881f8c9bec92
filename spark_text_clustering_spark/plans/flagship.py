"""Flagship query: per-language top-k stemless term frequencies.

This is the reference's semantic core (corpus scan → clean → tokenize →
stopword filter → frequency-ranked vocabulary; ``TFIDfVectorizer``
pipeline, LDAClustering.scala:105-198) expressed as one declarative
DataFrame plan over the ``documents`` table, partitioned by language the
way the reference runs one job per language directory
(``books/{English,German,...}``).

Plan shape (and why it scales):
  scan(documents: doc_id, text, lang — pruned columns)
    → split/lower tokenize (JVM codegen, no Python)
    → explode → filter stopwords + empties
    → partial hash-agg per (lang, token) → shuffle on (lang, token) → final agg
    → per-lang rank via window → filter rank <= k
At 100 TB the only shuffle is the (lang, token) aggregation, which map-side
combines first (token frequency is heavily skewed — Zipf — so partial
aggregation collapses almost everything before the wire). The final window
ranks *vocab-sized* data (tokens, not documents), which is tiny.
The reference instead collects the vocabulary to the driver with
``take(vocabSize)`` (LDAClustering.scala:148-151) — nothing here collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.textnorm import STOPWORDS

TOP_K = 10


def flagship_top_terms_per_lang(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    stopwords: list[str] | tuple[str, ...] = STOPWORDS,
    lang: str | None = None,
) -> DataFrame:
    """Top-k most frequent non-stopword tokens per language.

    Deterministic under frequency ties via (cnt desc, token asc) — the
    reference's ``sortBy(_._2).take(k)`` is tie-nondeterministic (SURVEY
    §2.4 T1); we add the lexicographic tiebreak. ``stopwords``/``lang``
    parameterize the reference's one-job-per-language-directory runs
    (books/{English,German}): the German run filters lang='de' with the
    GE list pushed to the parquet scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    if lang is not None:
        docs = docs.where(F.col("lang") == lang)
    tokens = (
        docs.select("lang", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"))
        .where((F.length("token") >= 1) & (~F.col("token").isin(list(stopwords))))
    )
    counts = tokens.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("lang", "token", "cnt", "rank")
    )


def flagship_top_terms_german(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's GERMAN run (round 12): lang='de' documents filtered
    with the reference's actual stopWords_GE.txt side input, loaded
    through the registered S2 source. The list is case-folded for the
    match and its duplicate entries are harmless under set-membership
    semantics.

    DELIBERATE interpretive divergence from the reference (ADVICE r12):
    the reference's filter is case-SENSITIVE contains() over unlowercased
    SimpleTokenizer output (LDAClustering.scala:136), so its cased 'Sie'
    entry would NOT filter lowercase 'sie' occurrences there. This
    engine's tokenizer lowercases by design, so the list is lowercased
    to match — the cased file entry shows the intent is to catch the
    pronoun, and case-folding both sides realizes that intent uniformly.
    Engine and oracle agree internally (driver-hash-green r12)."""
    from ..functions.textnorm import stopword_resource_path
    from ..sources.text_corpus import read_stopwords_cached

    stop = [w.lower() for w in read_stopwords_cached(spark, stopword_resource_path("GE"))]
    return flagship_top_terms_per_lang(
        spark, sf_dir, stopwords=stop, lang="de"
    )
