"""LLM-training-data preparation operators beyond dedup/quality (north
star, SURVEY §2.9): document chunking, n-gram statistics, benchmark-
contamination detection, and deterministic sampling.

Nothing here exists in the reference (its pipeline ends at TF-IDF /
LDA, LDAClustering.scala:105-198); these are the operations a 100 TB
pretraining-data pipeline runs between raw scrape and tokenizer:
chunk → count n-grams → screen against eval benchmarks → sample.

Everything stays JVM-side (built-in array/lambda expressions — no Python
UDFs) so the hot path is whole-stage-codegen'd.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table
from ..ckpt import ckpt_tracked, ckpt_tracked_lazy, drop_ckpt

REG = Registry()

CHUNK_STRIDE = 400
CHUNK_LEN = 512  # stride < len → 112-char overlap between adjacent chunks


@REG.register(
    "chunk_documents",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             unnest(generate_series(0,
                    CAST(floor((length(text) - 1) / {CHUNK_STRIDE}) AS BIGINT)))
               AS chunk_id,
             text
      FROM documents)
    SELECT doc_id, chunk_id,
           substring(text, CAST(chunk_id * {CHUNK_STRIDE} + 1 AS INTEGER),
                     {CHUNK_LEN}) AS chunk,
           CAST(length(substring(text, CAST(chunk_id * {CHUNK_STRIDE} + 1 AS INTEGER),
                     {CHUNK_LEN})) AS BIGINT) AS chunk_chars
    FROM c
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride overlapping chunking (stride 400, window 512 chars) —
    the standard context-window prep for embedding/training pipelines.
    sequence() + posexplode keeps it all in codegen; each input row fans
    out locally with no shuffle at all, so at 100 TB the operator is
    embarrassingly parallel and output partitioning follows the input."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.length("text") - 1) / CHUNK_STRIDE).cast("int"),
                )
            ).alias("chunk_id"),
            "text",
        )
        .withColumn(
            "chunk",
            F.expr(f"substring(text, chunk_id * {CHUNK_STRIDE} + 1, {CHUNK_LEN})"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "chunk",
            F.length("chunk").cast("long").alias("chunk_chars"),
        )
    )


_BIGRAM_TOPK = 50


@REG.register(
    "ngram_bigram_counts",
    oracle=f"""
    WITH toks AS (
      SELECT regexp_split_to_array(lower(text), '\\s+') AS l FROM documents),
    bi AS (
      SELECT unnest(list_filter(list_transform(list_zip(l, l[2:]),
                    x -> CASE WHEN x[2] IS NULL THEN NULL
                              ELSE x[1] || ' ' || x[2] END),
                    x -> x IS NOT NULL)) AS bigram
      FROM toks)
    SELECT bigram, cnt, CAST(rank AS INTEGER) AS rank FROM (
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt,
             row_number() OVER (ORDER BY COUNT(*) DESC, bigram) AS rank
      FROM bi GROUP BY bigram)
    WHERE rank <= {_BIGRAM_TOPK}
    """,
)
def ngram_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram frequency table (top-{k} with lexicographic
    tiebreak). Bigrams are built inside one array expression — zip the
    token array with its own tail — so the only shuffle is the final
    count aggregation, which map-side combines. At 100 TB the bigram key
    space is Zipfian: AQE skew handling covers the head keys, and the
    top-k is TakeOrderedAndProject (no global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower("text"), r"\s+").alias("l"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "filter(transform(l, (x, i) -> "
                "IF(i < size(l) - 1, concat(x, ' ', l[i + 1]), NULL)), "
                "x -> x IS NOT NULL)"
            )
        ).alias("bigram")
    )
    counted = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), "bigram")
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _BIGRAM_TOPK)
    )


_SHINGLE_N = 5
_BENCH_SOURCE = "src0"


@REG.register(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(text), '\\s+') AS l FROM documents),
    sh AS (
      SELECT doc_id, source,
             unnest(list_filter(list_transform(
                    list_zip(l, l[2:], l[3:], l[4:], l[5:]),
                    x -> CASE WHEN x[5] IS NULL THEN NULL
                         ELSE x[1] || ' ' || x[2] || ' ' || x[3]
                              || ' ' || x[4] || ' ' || x[5] END),
                    x -> x IS NOT NULL)) AS shingle
      FROM toks),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE source = '{_BENCH_SOURCE}'),
    cand AS (SELECT DISTINCT doc_id, shingle FROM sh
             WHERE source <> '{_BENCH_SOURCE}')
    SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS shared_shingles
    FROM cand c JOIN bench b USING (shingle)
    GROUP BY c.doc_id
    """,
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: count distinct {n}-gram shingles
    each training doc shares with a benchmark set (here: source='{bench}'
    stands in for an eval suite). This is the decontamination pass every
    pretraining pipeline runs before training.

    Scale: the benchmark shingle set is small relative to the corpus →
    broadcast the bench side; the candidate side never shuffles on the
    (huge) shingle key. Hash shingles (xxhash64) instead of strings in
    production to shrink the broadcast — kept as strings here for the
    SQL oracle."""
    docs = load_table(spark, sf_dir, "documents")
    # N-gram shingles as one array expression: arrays_zip the token array
    # with its own 1..N-1 shifted tails, keep only full-width windows.
    shifted = ", ".join(f"slice(l, {i + 1}, size(l))" for i in range(1, _SHINGLE_N))
    fields = ", ".join("x." + (f"`{i}`" if i else "l") for i in range(_SHINGLE_N))
    last = f"x.`{_SHINGLE_N - 1}`"
    shingle_expr = (
        f"filter(transform(arrays_zip(l, {shifted}), "
        f"x -> IF({last} IS NULL, NULL, concat_ws(' ', {fields}))), "
        "x -> x IS NOT NULL)"
    )
    toks = docs.select(
        "doc_id", "source", F.split(F.lower("text"), r"\s+").alias("l")
    )
    sh = toks.select("doc_id", "source", F.explode(F.expr(shingle_expr)).alias("shingle"))
    bench = (
        sh.where(F.col("source") == _BENCH_SOURCE).select("shingle").distinct()
    )
    cand = (
        sh.where(F.col("source") != _BENCH_SOURCE)
        .select("doc_id", "shingle")
        .distinct()
    )
    return (
        cand.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_shingles"))
    )


_CONTAM_MAX_SHARED = 3  # drop a doc once it shares >= this many shingles


@REG.register(
    "contamination_filter_clean",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(text), '\\s+') AS l FROM documents),
    sh AS (
      SELECT doc_id, source,
             unnest(list_filter(list_transform(
                    list_zip(l, l[2:], l[3:], l[4:], l[5:]),
                    x -> CASE WHEN x[5] IS NULL THEN NULL
                         ELSE x[1] || ' ' || x[2] || ' ' || x[3]
                              || ' ' || x[4] || ' ' || x[5] END),
                    x -> x IS NOT NULL)) AS shingle
      FROM toks),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE source = '{_BENCH_SOURCE}'),
    cand AS (SELECT DISTINCT doc_id, shingle FROM sh
             WHERE source <> '{_BENCH_SOURCE}'),
    hits AS (
      SELECT c.doc_id, COUNT(*) AS s
      FROM cand c JOIN bench b USING (shingle) GROUP BY c.doc_id)
    SELECT d.doc_id, d.source,
           CAST(COALESCE(h.s, 0) AS BIGINT) AS shared_shingles
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.source <> '{_BENCH_SOURCE}'
      AND COALESCE(h.s, 0) < {_CONTAM_MAX_SHARED}
    """,
)
def contamination_filter_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination OUTPUT stage: `contamination_ngram_overlap`
    reports per-doc shared-shingle counts; this key APPLIES the policy —
    training docs sharing >= 3 distinct 5-gram shingles with the
    benchmark source are dropped, and the surviving corpus ships with
    its evidence column (shared_shingles, 0 for untouched docs) so the
    cut is auditable downstream. This is the frame a pretraining run
    actually reads; the overlap key is its diagnostic.

    Plan: the hit counts reuse the overlap key's shape (bench shingles
    broadcast, candidate side never shuffles on the shingle key), then
    ONE left join of the doc spine against the doc-count-sized hits
    frame + a residual filter. At 100 TB the hits frame is tiny (only
    docs with any overlap appear), so the final join broadcasts too."""
    docs = load_table(spark, sf_dir, "documents")
    shifted = ", ".join(f"slice(l, {i + 1}, size(l))" for i in range(1, _SHINGLE_N))
    fields = ", ".join("x." + (f"`{i}`" if i else "l") for i in range(_SHINGLE_N))
    last = f"x.`{_SHINGLE_N - 1}`"
    shingle_expr = (
        f"filter(transform(arrays_zip(l, {shifted}), "
        f"x -> IF({last} IS NULL, NULL, concat_ws(' ', {fields}))), "
        "x -> x IS NOT NULL)"
    )
    toks = docs.select(
        "doc_id", "source", F.split(F.lower("text"), r"\s+").alias("l")
    )
    sh = toks.select(
        "doc_id", "source", F.explode(F.expr(shingle_expr)).alias("shingle")
    )
    bench = (
        sh.where(F.col("source") == _BENCH_SOURCE).select("shingle").distinct()
    )
    cand = (
        sh.where(F.col("source") != _BENCH_SOURCE)
        .select("doc_id", "shingle")
        .distinct()
    )
    hits = (
        cand.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    spine = docs.where(F.col("source") != _BENCH_SOURCE).select(
        "doc_id", "source"
    )
    return (
        spine.join(hits, "doc_id", "left")
        .where(F.coalesce("s", F.lit(0)) < _CONTAM_MAX_SHARED)
        .select(
            "doc_id",
            "source",
            F.coalesce("s", F.lit(0)).cast("long").alias("shared_shingles"),
        )
    )


@REG.register(
    "sample_mod_deterministic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey % 20 = 3
    """,
)
def sample_mod_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% key-mod sample — the reproducible-sampling
    primitive for pipeline debugging (same rows every run, every engine,
    any partitioning). The predicate pushes to the parquet scan; at
    100 TB prefer a hash-mod (xxhash64(key) % 20) so clustered key
    ranges don't bias the sample — key-mod kept here because both
    engines agree on it exactly."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 20 == 3).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


_STRATUM_N = 5


@REG.register(
    "sample_stratified_topn",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents)
    WHERE rn <= {_STRATUM_N}
    """,
)
def sample_stratified_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: first {n} docs per language by
    doc_id. The per-stratum row_number stops scanning... (it doesn't —
    window functions materialize the partition; at 100 TB swap to a
    rank-limited aggregate: groupBy(lang).agg(slice(sort_array(
    collect_list(doc_id)), 1, n)) keeps state bounded at n per key)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _STRATUM_N)
        .drop("rn")
    )


@REG.register("sample_tablesample_seeded")
def sample_tablesample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli TABLESAMPLE (rows-only: the row subset is Spark's
    XORShift-per-partition — deterministic for a fixed seed+partitioning
    but not ANSI-SQL-reproducible). Scale: sampling happens at the scan,
    before any shuffle; cheap at any size."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@REG.register(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by value per priority class — the grouped-top-k
    pattern (rank window + filter). At 100 TB: AQE handles stragglers,
    but for tiny k prefer the aggregate form (collect top-k per group in
    a bounded heap via max_by/slice) to avoid materializing full
    partitions in the window sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


@REG.register(
    "url_parse_domains",
    oracle="""
    WITH urls AS (
      SELECT 'https://' || source || '.example.com/doc/' || doc_id
               || '?lang=' || lang AS url
      FROM documents)
    SELECT regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM urls GROUP BY 1
    """,
)
def url_parse_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing via the built-in `parse_url` (HOST part) + per-domain
    counts — the domain-level aggregation every web-crawl pipeline runs
    for source mixing/blocklists. URLs are constructed deterministically
    from testdata columns (the corpus text has none); the oracle parses
    with a regex since DuckDB lacks parse_url. JVM-side end to end."""
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/doc/"),
            F.col("doc_id"),
            F.lit("?lang="),
            F.col("lang"),
        ).alias("url")
    )
    return (
        urls.select(F.parse_url("url", F.lit("HOST")).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training, step 1: merge-candidate pair statistics (round 4)
# ---------------------------------------------------------------------------

_BPE_TOP_K = 20

_BPE_ORACLE = f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
  FROM documents),
words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM tok WHERE len(word) >= 2 GROUP BY word),
pairs AS (
  SELECT substr(word, i, 2) AS pair, freq
  FROM words, unnest(generate_series(1, len(word) - 1)) AS t(i))
SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
FROM pairs
GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT {_BPE_TOP_K}
"""


@REG.register("bpe_pair_counts", oracle=_BPE_ORACLE)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, step 1: the top merge candidates — corpus-
    weighted counts of adjacent character pairs.

    The classic BPE scale trick is visible in the plan: pair statistics
    are computed over the DISTINCT-word frequency table (vocabulary-
    sized), not the raw token stream — each distinct word contributes its
    pairs once, weighted by its corpus frequency. So a 100 TB corpus
    costs one word-count aggregation (map-side combined over Zipf), one
    vocab-sized pair explode (JVM ``sequence``/``substring`` — no
    Python), one pair aggregation, and a TakeOrderedAndProject top-k.
    Iterating BPE applies the winning merge to the (vocab-sized) word
    table and repeats — every subsequent round touches only the
    vocabulary. Deterministic (cnt desc, pair asc) tiebreak keeps both
    engines' top-k identical with integer counts."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(_BPE_TOP_K)
    )


_BPE_N_MERGES = 10


def _corpus_fingerprint(sf_dir: str) -> str:
    """Size+mtime digest of ``sf_dir``/documents.parquet (file or
    directory) — the invalidation key for cross-session word-base
    artifacts. Same guard idea as the stored-ANN memo invalidation
    (similarity.py): a changed corpus MUST rebuild, never serve stale."""
    import hashlib
    import os

    root = os.path.join(sf_dir, "documents.parquet")
    h = hashlib.sha1(os.path.abspath(root).encode())
    if os.path.isdir(root):
        for dirpath, _, files in sorted(os.walk(root)):
            for fn in sorted(files):
                st = os.stat(os.path.join(dirpath, fn))
                h.update(f"{fn}:{st.st_size}:{st.st_mtime_ns};".encode())
    else:
        st = os.stat(root)
        h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


# Version token for the word-base DEFINITION (split regex, lowercase,
# len >= 2). Embedded in the artifact path so a future definition change
# misses old artifacts instead of silently serving stale ones (ADVICE r13).
_WORD_BASE_DEF = "wb1-lower-ws-len2"


def _artifact_dir() -> str:
    """Per-user artifact root, created 0700 (ADVICE r13): a shared
    world-writable path would let another local user pre-seed arbitrary
    parquet that gets served, and concurrent sessions would race on it."""
    import os
    import tempfile

    override = os.environ.get("STC_ARTIFACT_DIR")
    if override:
        os.makedirs(override, mode=0o700, exist_ok=True)
        return override
    d = os.path.join(tempfile.gettempdir(), f"stc_artifacts_{os.getuid()}")
    os.makedirs(d, mode=0o700, exist_ok=True)
    st = os.stat(d)
    if st.st_uid != os.getuid():
        # pre-seeded by someone else under tmp's sticky bit: refuse to
        # share; fall back to a fresh private dir for this process
        d = tempfile.mkdtemp(prefix="stc_artifacts_")
    return d


def bpe_word_base(
    spark: SparkSession,
    sf_dir: str,
    *,
    refresh: bool = False,
    persist: bool | None = None,
) -> DataFrame:
    """The distinct-word frequency table (word, freq) every BPE phase
    starts from.

    Default (``persist=None`` and ``STC_ARTIFACT_PERSIST`` unset): the
    base is computed from the corpus parquet on EVERY call and
    eager-localCheckpointed for intra-call reuse (round 15, VERDICT r14
    #1: no cross-call memo — each bench/oracle invocation must compute
    from the parquet inputs). Nothing derived from the corpus outlives
    the call.

    Production artifact mode (``persist=True`` or
    ``STC_ARTIFACT_PERSIST=1``): the round-13 cross-session parquet
    artifact lifecycle, keyed by a size+mtime corpus fingerprint plus a
    word-base definition-version token (ADVICE r13) so a changed corpus
    or definition misses the artifact and rebuilds — stale serves are
    impossible by construction (cf. the stored-ANN memo guard). This is
    the 100 TB posture: one corpus scan feeds every tokenizer
    train/encode experiment across sessions, and the artifact itself is
    vocab-sized, not corpus-sized. Equality of the loaded base vs a
    fresh in-session build — and of merges trained from each — is
    asserted in tests/test_lm.py."""
    import os
    import shutil
    import uuid

    if persist is None:
        persist = os.environ.get("STC_ARTIFACT_PERSIST", "0") == "1"
    if not persist:
        # Round 15 (VERDICT r14 #1 family): the word base is recomputed
        # from the corpus parquet on EVERY call — the r14 per-application
        # memo let measured bench runs of the live BPE keys skip the one
        # corpus scan their declared computation starts from. The
        # checkpoint is intra-call (every merge round folds over it).
        docs = load_table(spark, sf_dir, "documents")
        words = (
            docs.select(
                F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
            )
            .where(F.length("word") >= 2)
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
        ).localCheckpoint(eager=True)
        return words

    # path embeds BOTH the corpus fingerprint and the word-base
    # definition version (ADVICE r13): changing the split regex / length
    # rule must miss old artifacts, not silently serve them
    path = os.path.join(
        _artifact_dir(),
        f"bpe_words_{_WORD_BASE_DEF}_{_corpus_fingerprint(sf_dir)}",
    )
    if not refresh and os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.parquet(path)
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # write to a session-private temp path, then atomically rename into
    # place (ADVICE r13): concurrent sessions that miss simultaneously
    # must never expose a half-written directory behind a visible
    # _SUCCESS; the loser of the rename race serves the winner's copy
    tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    words.write.mode("overwrite").parquet(tmp)
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise
    return spark.read.parquet(path)


# One greedy left-to-right merge fold, shared by BPE train/encode and
# WordPiece train. Building this as a python-lambda HOF costs ~100 py4j
# round trips (~0.19 s measured) PER MERGE — ~2 s of pure driver-side
# plan construction per 10-merge train call (guide §1/§4 driver-side,
# the _IMH_EXPR_CACHE finding again). One parsed SQL expression is a
# single round trip, and the resulting Column is unresolved (binds by
# name at analysis), so it is memoized per (col, a, b, merged) and
# reused across every frame and every call — semantics identical:
# CASE/ELSE mirrors F.when().otherwise(), 0-based get() on an empty
# accumulator yields NULL and falls to ELSE exactly as before.
_MERGE_FOLD_MEMO: dict = {}
_MERGE_FOLD_MEMO_CAP = 4096  # bounded (ADVICE r14): a long-lived driver
# session accumulates one small Column per distinct merge pair forever
# otherwise — cleared wholesale at the cap (refilling is one parse each)


def _merge_fold(col: str, a: str, b: str, merged: str):
    key = (col, a, b, merged)
    got = _MERGE_FOLD_MEMO.get(key)
    if got is None:
        qa, qb, qm = (
            s.replace("\\", "\\\\").replace("'", "\\'") for s in (a, b, merged)
        )
        got = F.expr(
            f"aggregate({col}, cast(array() as array<string>), (acc, x) -> "
            f"CASE WHEN get(acc, size(acc) - 1) = '{qa}' AND x = '{qb}' "
            f"THEN concat(slice(acc, 1, greatest(size(acc) - 1, 0)), "
            f"array('{qm}')) ELSE concat(acc, array(x)) END)"
        )
        if len(_MERGE_FOLD_MEMO) >= _MERGE_FOLD_MEMO_CAP:
            _MERGE_FOLD_MEMO.clear()
        _MERGE_FOLD_MEMO[key] = got
    return got


@REG.register("bpe_train_merges")  # rows-only: iterative algorithm (driver loop);
# no single-statement SQL oracle exists — golden-tested against a pure-Python
# BPE reference over the identical word-frequency table in tests/test_lm.py
def bpe_train_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = _BPE_N_MERGES
) -> DataFrame:
    """BPE tokenizer training, the FULL merge loop (round 5): repeat
    ``n_merges`` times — count corpus-weighted adjacent symbol pairs over
    the DISTINCT-word table, pick the most frequent pair (deterministic
    cnt-desc / pair-asc tiebreak), and apply it greedily left-to-right to
    every word's symbol sequence. Returns the learned merge table
    (step, left, right, pair_count) — the artifact a tokenizer ships.

    Scale shape (the classic BPE trick, cf. ``bpe_pair_counts``): after
    the one corpus-wide word-count aggregation, EVERY iteration touches
    only the vocabulary-sized (word, freq, symbols) frame — pair counts
    are weighted by word frequency, so the 100 TB corpus is never
    rescanned. The per-iteration work is JVM-side throughout: the pair
    explode is a ``transform(sequence(...))`` over the symbol array, the
    merge application is an ``aggregate`` fold with a lookbehind
    (``F.get`` so an empty accumulator yields null, not an ANSI
    out-of-bounds error), and the only driver traffic is ONE winning pair
    per iteration. The frame is localCheckpointed each round to keep the
    plan flat across iterations — LAZILY (round 13): the round's
    top-pair aggregate is a full shuffle over every partition, so it
    doubles as the checkpoint materializer and each iteration is ONE
    job, not two (see ``ckpt_tracked_lazy``; the predecessor's blocks
    are dropped only after that aggregate returns, per its contract).
    The word base comes from ``bpe_word_base``: computed from the
    corpus parquet per call (round 15); in production artifact mode
    (``STC_ARTIFACT_PERSIST=1``) it loads cross-session."""
    words = bpe_word_base(spark, sf_dir)
    syms, syms_ids = ckpt_tracked_lazy(
        words.select(
            "freq",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ).alias("syms"),
        )
    )
    prev_ids: set = set()  # round N-1's blocks, droppable once round N ran

    out_schema = "step int, left string, right string, pair_count long"
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        # a fully-merged word (one symbol left) contributes no pairs — and
        # must be excluded BEFORE the sequence() call: sequence(1, 0) is a
        # DESCENDING [1, 0] in Spark, which would index past the array
        pairs = syms.where(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(element_at(syms, i) AS a,"
                    "             element_at(syms, i + 1) AS b))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        # the aggregate above fully materialized `syms` (every partition
        # feeds the shuffle), so the PREVIOUS round's blocks are now dead
        # (round-11 hygiene, see ckpt.py)
        if prev_ids:
            drop_ckpt(syms, prev_ids)
        if not top:  # every word fully merged: nothing left to learn
            prev_ids = set()
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((step, a, b, cnt))
        merged = a + b
        apply_merge = _merge_fold("syms", a, b, merged)
        syms, new_ids = ckpt_tracked_lazy(
            syms.select("freq", apply_merge.alias("syms"))
        )
        prev_ids = syms_ids
        syms_ids = new_ids
    # the merge table is pure driver data; both the last materialized
    # round and the final (possibly never-materialized) frame are dead
    drop_ckpt(syms, prev_ids | syms_ids)
    return spark.createDataFrame(merges, out_schema)


def bpe_apply_merges(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a LEARNED merge table to a (word, freq) frame — the encode
    side of the BPE lifecycle: replay each (left, right) merge in training
    order with the same greedy left-to-right fold ``bpe_train_merges``
    uses. Input column ``word``; output adds ``tokens array<string>``.
    All-JVM; each merge is one narrow projection over the vocab-sized
    frame (checkpoint every few steps keeps the plan flat)."""
    syms = words.withColumn(
        "tokens",
        F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
    )
    prev_ids: set = set()
    for step, (a, b) in enumerate(merges):
        syms = syms.withColumn("tokens", _merge_fold("tokens", a, b, a + b))
        if (step + 1) % 4 == 0:
            syms, new_ids = ckpt_tracked(syms)
            if prev_ids:  # newer checkpoint live -> predecessor is dead
                drop_ckpt(syms, prev_ids)
            prev_ids = new_ids
    # NOTE: the LAST checkpoint stays pinned — the returned frame reads it
    return syms


@REG.register("bpe_encode_corpus")  # rows-only: applies the iteratively-learned
# merge table (driver loop in training); token frequencies golden-tested vs a
# pure-Python BPE encode in tests/test_lm.py
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BPE tokenizer LIFECYCLE (round 5): train the merge table
    with `bpe_train_merges`, then ENCODE the corpus with it and emit the
    resulting subword-token frequency table — what a tokenizer build job
    ships alongside the merges. Both phases work over the vocab-sized
    distinct-word table (corpus scanned once, at word-count time); the
    output aggregates corpus-weighted token frequencies, top-50 with a
    deterministic (cnt desc, token asc) tiebreak."""
    merges = [
        (r["left"], r["right"])
        for r in bpe_train_merges(spark, sf_dir).orderBy("step").collect()
    ]
    encoded = bpe_apply_merges(bpe_word_base(spark, sf_dir), merges)
    return (
        encoded.select(F.explode("tokens").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(50)
    )


def bpe_save_merges(merges_df: DataFrame, path: str) -> None:
    """Persist a learned BPE merge table (step, left, right, pair_count)
    as parquet — the artifact a tokenizer ships; overwrite-idempotent."""
    merges_df.write.mode("overwrite").parquet(path)


def bpe_load_merges(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """Load a merge table back in training order, ready for
    `bpe_apply_merges` — encoding with the loaded table must reproduce
    encoding with the in-session table exactly (asserted in
    tests/test_lm.py)."""
    rows = spark.read.parquet(path).orderBy("step").collect()
    return [(r["left"], r["right"]) for r in rows]


# ---------------------------------------------------------------------------
# WordPiece (round 10) — completes the tokenizer-training trio: BPE
# (frequency-scored merges, GPT-family), unigram-LM (EM pruning,
# T5-family, operators/unigram.py), and WordPiece (likelihood-scored
# merges + longest-match encode, BERT-family; Schuster & Nakajima 2012,
# Wu et al. 2016). The reference has no tokenizer training at all
# (SURVEY §2.9 north-star scope).
# ---------------------------------------------------------------------------

_WP_N_MERGES = 10
# candidate band collected per merge round before the exact-integer pick;
# driver traffic stays O(band), and a full 1e-9-band re-collect triggers
# only if all _WP_BAND rows tie within double noise
_WP_BAND = 32


def _wp_row_key(r):
    """`_wp_exact_key` over a Row — shared by the in-band driver min and
    the distributed tie-frame reduce so both paths rank identically."""
    return _wp_exact_key(r["a"], r["b"], int(r["cnt"]), int(r["cnt_a"]), int(r["cnt_b"]))


def _wp_exact_key(a: str, b: str, cnt: int, cnt_a: int, cnt_b: int):
    """Exact WordPiece merge-selection key: likelihood score as an
    arbitrary-precision Fraction (count products past 2^53 cannot round),
    then cnt desc, then (a, b) asc. min() over this key picks the winner."""
    return (-Fraction(cnt, cnt_a * cnt_b), -cnt, a, b)
_WP_UNK = "[UNK]"


def _wp_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same corpus-weighted distinct-word table every trainer in this
    module works over (lowercase, whitespace split, len >= 2) — the
    DEFINITION is identical to BPE's, so this shares `bpe_word_base`
    (fresh per call; cross-session artifact only in production persist
    mode): one DEFINITION of the word table feeds BPE and WordPiece
    training."""
    return bpe_word_base(spark, sf_dir)


_WP_INIT_SYMS = (
    "transform(sequence(1, length(word)),"
    " i -> CASE WHEN i = 1 THEN substring(word, 1, 1)"
    "      ELSE concat('##', substring(word, i, 1)) END)"
)


@REG.register("wordpiece_train_merges")  # rows-only: iterative algorithm
# (driver merge loop); golden-tested against a pure-Python WordPiece
# reference over the identical word-frequency table in tests/test_wordpiece.py
def wordpiece_train_merges(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = _WP_N_MERGES,
    words: DataFrame | None = None,
) -> DataFrame:
    """WordPiece tokenizer training: like BPE, repeatedly merge the best
    adjacent symbol pair over the DISTINCT-word table — but the selection
    criterion is the LIKELIHOOD score count(ab) / (count(a)·count(b))
    (the pair whose merge most increases a unigram LM's corpus
    likelihood), not raw pair frequency, and continuation symbols carry
    the '##' prefix so "word" segments as [w, ##o, ##r, ##d] and merging
    (w, ##o) yields "wo" while (##o, ##r) yields "##or".

    Scale shape is BPE's (cf. `bpe_train_merges`): the corpus is scanned
    ONCE for word counts; every iteration touches only the vocab-sized
    (freq, syms) frame. WordPiece adds a second vocab-sized aggregation
    per round (unit-symbol counts for the score's denominator) and two
    broadcast-sized joins of pair counts against it; the only driver
    traffic is one small candidate band per round. Deterministic tiebreak
    (score desc, cnt desc, a asc, b asc) — and the selection is EXACT at
    any corpus size: Spark orders by the double score only to cut a
    narrow top band (double relative error is ~2^-52, the band keeps
    1e-9), then the winner inside the band is picked driver-side with
    arbitrary-precision integer Fractions, so count products past 2^53
    cannot flip a near-tie (round-10 advice). The Python golden twin uses
    the same exact-Fraction key. The reported `score` column stays a
    double (display only). Returns (step, left, right, score, pair_count).
    Pass `words` (the `_wp_words` frame, ideally checkpointed) to share
    the one corpus scan with the vocab/encode stages."""
    if words is None:
        words = _wp_words(spark, sf_dir)
    # LAZY checkpoint (round 13, cf. bpe_train_merges): the round's band
    # collect is a full shuffle over every syms partition, so it doubles
    # as the checkpoint materializer — one job per round instead of two;
    # round N-1's blocks drop only after round N's collect returns
    syms, syms_ids = ckpt_tracked_lazy(
        words.select("freq", F.expr(_WP_INIT_SYMS).alias("syms"))
    )
    prev_ids: set = set()

    out_schema = "step int, left string, right string, score double, pair_count long"
    merges: list[tuple[int, str, str, float, int]] = []
    for step in range(n_merges):
        # words reduced to one symbol contribute no pairs; exclude BEFORE
        # sequence() (sequence(1, 0) is a DESCENDING [1, 0] in Spark)
        pairs = syms.where(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(element_at(syms, i) AS a,"
                    "             element_at(syms, i + 1) AS b))"
                )
            ).alias("p"),
        )
        pair_cnt = pairs.groupBy("p.a", "p.b").agg(F.sum("freq").alias("cnt"))
        unit_cnt = (
            syms.select(F.explode("syms").alias("s"), "freq")
            .groupBy("s")
            .agg(F.sum("freq").alias("ucnt"))
        )
        ua = unit_cnt.select(F.col("s").alias("a"), F.col("ucnt").alias("cnt_a"))
        ub = unit_cnt.select(F.col("s").alias("b"), F.col("ucnt").alias("cnt_b"))
        scored = (
            pair_cnt.join(F.broadcast(ua), "a")
            .join(F.broadcast(ub), "b")
            .select(
                "a",
                "b",
                "cnt",
                "cnt_a",
                "cnt_b",
                (
                    # cast each count BEFORE multiplying: the long*long
                    # product silently wraps past int64 at corpus-sized
                    # unit counts (round-10 review find); double*double
                    # cannot. The double score only PRE-FILTERS — final
                    # selection below is exact-integer, so double
                    # rounding past 2^53 can't flip near-ties
                    F.col("cnt").cast("double")
                    / (F.col("cnt_a").cast("double") * F.col("cnt_b").cast("double"))
                ).alias("score"),
            )
        )
        band = scored.orderBy(
            F.desc("score"), F.desc("cnt"), F.asc("a"), F.asc("b")
        ).limit(_WP_BAND).collect()
        # the collect's shuffle fully materialized `syms`; the previous
        # round's blocks are now dead (ckpt_tracked_lazy contract)
        if prev_ids:
            drop_ckpt(syms, prev_ids)
            prev_ids = set()
        if not band:
            break
        # Anything outside the collected band has double score <= the
        # band's last row; if that is below best*(1 - 1e-9) it cannot
        # exactly beat the best (double relative error ~2^-52 << 1e-9).
        # Otherwise widen to every candidate inside the tie band.
        best_d = band[0]["score"]
        if len(band) == _WP_BAND and band[-1]["score"] >= best_d * (1.0 - 1e-9):
            # tie band wider than the collected prefix (hapax-rich
            # corpora tie at score 1.0 vocab-wide early in training):
            # pick the exact winner DISTRIBUTED — an RDD reduce over the
            # tie frame ships one candidate row per partition to the
            # driver instead of collecting the whole (potentially
            # vocab-scale) tie set, and the reduce operator is the same
            # exact-integer key as the in-band min, so the selection is
            # unchanged (round-11 review fix; the rare genuinely-needed
            # per-partition imperative case for dropping to the RDD API,
            # because Fraction comparison has no JVM expression form)
            tie = scored.where(F.col("score") >= F.lit(best_d * (1.0 - 1e-9)))
            win = tie.rdd.reduce(
                lambda x, y: x if _wp_row_key(x) <= _wp_row_key(y) else y
            )
        else:
            win = min(band, key=_wp_row_key)
        a, b = win["a"], win["b"]
        cnt, score = int(win["cnt"]), float(win["score"])
        merged = a + (b[2:] if b.startswith("##") else b)
        merges.append((step, a, b, score, cnt))
        apply_merge = _merge_fold("syms", a, b, merged)
        syms, new_ids = ckpt_tracked_lazy(
            syms.select("freq", apply_merge.alias("syms"))
        )
        prev_ids = syms_ids
        syms_ids = new_ids
    # the merge table is pure driver data; both the last materialized
    # round and the final (possibly never-materialized) frame are dead
    drop_ckpt(syms, prev_ids | syms_ids)
    return spark.createDataFrame(merges, out_schema)


def wordpiece_vocab(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = _WP_N_MERGES,
    words: DataFrame | None = None,
) -> set[str]:
    """The learned WordPiece vocabulary: the initial alphabet (word-start
    chars + '##'-continuations present in the word table) plus every
    merged symbol, the artifact the longest-match encoder needs. Pass
    `words` to share one corpus scan across alphabet + training.

    Round 15 (VERDICT r14 #1): derived FRESH per call. The r14
    per-(app, sf_dir, n_merges) memo made the registered ENCODE key's
    measured bench runs skip the training its declared computation
    includes (there is no stored-vocab variant; the live key's oracle
    twin — the pure-Python golden — retrains every time)."""
    if words is None:
        words = _wp_words(spark, sf_dir).localCheckpoint(eager=True)
    alpha_rows = (
        words.select(F.explode(F.expr(_WP_INIT_SYMS)).alias("s"))
        .distinct()
        .collect()
    )  # alphabet-sized
    vocab = {r["s"] for r in alpha_rows}
    for r in wordpiece_train_merges(spark, sf_dir, n_merges, words=words).collect():
        left, right = r["left"], r["right"]
        vocab.add(left + (right[2:] if right.startswith("##") else right))
    return vocab


@REG.register("wordpiece_encode_corpus")  # rows-only: encodes with the
# iteratively-trained vocab; golden-tested vs a pure-Python train+encode
# in tests/test_wordpiece.py
def wordpiece_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece ENCODE — greedy longest-match-first ("maximal munch")
    against the trained vocabulary, the algorithm BERT tokenizers run at
    serving time. Unlike BPE's encode (which replays merges in training
    order), WordPiece matching needs per-position variable-length prefix
    trials — a genuinely non-relational per-word scan, so it runs as an
    Arrow-batched mapInPandas over the VOCAB-SIZED distinct-word table
    (the corpus is scanned once for word counts; the Python stage sees
    thousands of distinct words, never the 100 TB token stream) with the
    alphabet+merges vocabulary in the closure (KBs). A word containing
    any unmatched position encodes as [UNK], per the standard. Output:
    corpus-weighted subword frequencies, top-50, deterministic
    (cnt desc, token asc) tiebreak — `bpe_encode_corpus`'s shape, so the
    two tokenizer lifecycles are directly comparable."""
    import pandas as pd

    # ONE word-count corpus scan shared by alphabet, training, and the
    # encode below (round-10 review find: three independent _wp_words
    # frames each rescanned the corpus)
    words = _wp_words(spark, sf_dir).localCheckpoint(eager=True)
    vocab = wordpiece_vocab(spark, sf_dir, words=words)
    max_len = max((len(s) for s in vocab), default=1)

    def encode_iter(batches):
        def enc(word: str) -> list[str]:
            out, i, n = [], 0, len(word)
            while i < n:
                end = min(n, i + max_len)
                piece = None
                while end > i:
                    sub = word[i:end]
                    if i > 0:
                        sub = "##" + sub
                    if sub in vocab:
                        piece = sub
                        break
                    end -= 1
                if piece is None:
                    return [_WP_UNK]
                out.append(piece)
                i = end
            return out

        for pdf in batches:
            toks = pdf["word"].map(enc)
            yield pd.DataFrame(
                {
                    "token": [t for ts in toks for t in ts],
                    "freq": [
                        f
                        for ts, f in zip(toks, pdf["freq"])
                        for _ in ts
                    ],
                }
            )

    encoded = words.mapInPandas(encode_iter, schema="token string, freq long")
    return (
        encoded.groupBy("token")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(50)
    )


def wordpiece_save_vocab(
    spark: SparkSession, vocab: set[str], path: str
) -> None:
    """Persist a learned WordPiece vocabulary as parquet — the artifact a
    BERT-family tokenizer ships (cf. `bpe_save_merges`, the unigram piece
    table); overwrite-idempotent."""
    spark.createDataFrame(
        [(s,) for s in sorted(vocab)], "piece string"
    ).write.mode("overwrite").parquet(path)


def wordpiece_load_vocab(spark: SparkSession, path: str) -> set[str]:
    """Load a WordPiece vocabulary back; encoding with the loaded vocab
    must reproduce encoding with the in-session one exactly (asserted in
    tests/test_wordpiece.py)."""
    return {r["piece"] for r in spark.read.parquet(path).collect()}
