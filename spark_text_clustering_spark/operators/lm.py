"""Statistical language-model scoring over the corpus (LLM-pipeline op).

Training-data pipelines score documents with a cheap n-gram LM before any
GPU sees them (fluency/quality gating, outlier detection, loose
perplexity filtering — the KenLM-filter pattern from public web-corpus
pipelines such as CCNet/C4). This module trains a Laplace-smoothed bigram
LM *from the corpus itself* and scores every document by mean bigram
log-probability — all in one Catalyst plan, no Python in the hot path.

Scale design (100 TB corpus):
* Token/bigram extraction is array algebra on the scan (filter/slice/
  arrays_zip on the split column — whole-stage codegen, no explode until
  the bigram stream, no Python).
* The LM "model" is two aggregated count tables (unigrams, bigrams).
  They are vocabulary-sized, not corpus-sized — Zipf keeps real-world
  bigram tables in the low billions of rows at web scale, so the
  score-time joins hash-partition on (lang, w1[, w2]) and ride the same
  key as the counting aggs; for bounded vocabularies the counts fit a
  broadcast and Catalyst/AQE picks that automatically.
* Per-document averaging is a groupBy on doc_id — the bigram stream is
  already partitioned by doc via the explode, so the partial aggregation
  collapses it before the wire.

Reference parity note: the reference pipeline has no LM scoring; this is
rebuild-contract scope (north-star training-data ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table

REG = Registry()

# Mean Laplace-smoothed bigram log-prob per doc:
#   score(d) = avg over bigrams (w1,w2) of ln( (c(w1,w2)+1) / (c(w1)+V) )
# with counts and vocab size V computed per language from the same corpus.
_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> len(x) >= 1) AS arr
  FROM documents
  WHERE text IS NOT NULL AND lang IS NOT NULL),
bigrams AS (
  SELECT doc_id, lang,
         struct_extract(u, 1) AS w1,
         struct_extract(u, 2) AS w2
  FROM toks,
       unnest(list_zip(arr[1:len(arr)-1], arr[2:len(arr)])) AS t(u)
  WHERE len(arr) >= 2),
uni AS (
  SELECT lang, w1, CAST(COUNT(*) AS BIGINT) AS c1
  FROM (SELECT lang, unnest(arr) AS w1 FROM toks)
  GROUP BY lang, w1),
vocab AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS v FROM uni GROUP BY lang),
big AS (
  SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM bigrams GROUP BY lang, w1, w2)
SELECT b.doc_id, b.lang,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       round(AVG(ln((big.c12 + 1.0) / (uni.c1 + vocab.v))), 6) AS avg_logprob
FROM bigrams b
JOIN big   ON b.lang = big.lang AND b.w1 = big.w1 AND b.w2 = big.w2
JOIN uni   ON b.lang = uni.lang AND b.w1 = uni.w1
JOIN vocab ON b.lang = vocab.lang
GROUP BY b.doc_id, b.lang
"""


@REG.register("ngram_lm_score", oracle=_LM_ORACLE)
def ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document by mean Laplace-smoothed bigram log-probability
    under a per-language bigram LM trained on the corpus itself.

    Single Catalyst plan: token arrays (filter/slice/arrays_zip — JVM
    codegen), one explode to the bigram stream, two count aggregations
    (the "model"), two equi-joins back, one per-doc average. Every bigram
    observed in a doc is by construction in the count tables, so inner
    joins are exact (Laplace's +1/+V handles the generalization case at
    inference; here the scored set IS the training set)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        "lang",
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda x: F.length(x) >= 1
        ).alias("arr"),
    )
    n = F.size("arr")
    bigrams = (
        toks.where(n >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.arrays_zip(
                    F.slice("arr", 1, n - 1).alias("w1"),
                    F.slice(F.col("arr"), F.lit(2), n - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select("doc_id", "lang", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    uni = (
        toks.select("lang", F.explode("arr").alias("w1"))
        .groupBy("lang", "w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.groupBy("lang").agg(F.count(F.lit(1)).alias("v"))
    big = bigrams.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    return (
        bigrams.join(big, ["lang", "w1", "w2"])
        .join(uni, ["lang", "w1"])
        .join(vocab, ["lang"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v")))), 6
            ).alias("avg_logprob"),
        )
    )


_LM_GATE_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> len(x) >= 1) AS arr
  FROM documents
  WHERE text IS NOT NULL AND lang IS NOT NULL),
bigrams AS (
  SELECT doc_id, lang,
         struct_extract(u, 1) AS w1,
         struct_extract(u, 2) AS w2
  FROM toks,
       unnest(list_zip(arr[1:len(arr)-1], arr[2:len(arr)])) AS t(u)
  WHERE len(arr) >= 2),
uni AS (
  SELECT lang, w1, CAST(COUNT(*) AS BIGINT) AS c1
  FROM (SELECT lang, unnest(arr) AS w1 FROM toks)
  GROUP BY lang, w1),
vocab AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS v FROM uni GROUP BY lang),
big AS (
  SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM bigrams GROUP BY lang, w1, w2),
scores AS (
  SELECT b.doc_id, b.lang,
         round(AVG(ln((big.c12 + 1.0) / (uni.c1 + vocab.v))), 6) AS avg_logprob
  FROM bigrams b
  JOIN big   ON b.lang = big.lang AND b.w1 = big.w1 AND b.w2 = big.w2
  JOIN uni   ON b.lang = uni.lang AND b.w1 = uni.w1
  JOIN vocab ON b.lang = vocab.lang
  GROUP BY b.doc_id, b.lang),
cuts AS (
  SELECT lang, quantile_cont(avg_logprob, 0.10) AS q_lo
  FROM scores GROUP BY lang)
SELECT s.doc_id, s.lang, s.avg_logprob
FROM scores s JOIN cuts c ON s.lang = c.lang
WHERE s.avg_logprob >= c.q_lo
"""


@REG.register("quality_filter_lm_perplexity", oracle=_LM_GATE_ORACLE)
def quality_filter_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based quality gate (round 6): drop each language's
    lowest-decile documents by mean bigram log-probability under the
    corpus-trained LM — the model-based quality filter (a la CCNet's
    LM-perplexity gate) that complements the surface-statistics gates in
    operators/text.py. A doc whose bigrams the language's own LM finds
    improbable is boilerplate soup, OCR noise, or mis-labeled language.

    Plan: the exact `ngram_lm_score` scoring plan (bigram explode →
    model counts → joins → per-doc average), then the
    `quality_filter_per_lang` gate shape: a languages-sized exact
    percentile aggregate broadcast-joined back. The percentile runs on
    the ROUNDED score so Spark's `percentile` and DuckDB's
    `quantile_cont` interpolate identical inputs (same (n-1)*p formula,
    proven by the round-5 gate). At 100 TB the gate adds one KB-sized
    aggregate + broadcast join on top of the LM scoring pass — document
    payloads never shuffle."""
    scores = ngram_lm_score(spark, sf_dir).select(
        "doc_id", "lang", "avg_logprob"
    )
    cuts = scores.groupBy("lang").agg(
        F.percentile("avg_logprob", F.lit(0.10)).alias("q_lo")
    )
    return (
        scores.join(F.broadcast(cuts), "lang")
        .where(F.col("avg_logprob") >= F.col("q_lo"))
        .select("doc_id", "lang", "avg_logprob")
    )
