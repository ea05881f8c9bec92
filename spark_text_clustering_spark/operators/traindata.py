"""Training-data batch-prep operators: deterministic shuffle-sharding,
fixed-token-budget sequence packing, and source-mixture sampling.

These are the last-mile ops an LLM pretraining pipeline runs after
filter/dedup (see ``operators/textprep.py`` / ``operators/dedup.py``):
shuffle the corpus reproducibly, pack documents into fixed-length training
sequences, and resample sources to a target mixture. The reference
pipeline stops at LDA topics (LDAClustering.scala:139-151) — this module
is rebuild-contract scope (SURVEY §2.9 north-star ops).

All three are seeded-deterministic via md5 so the DuckDB oracle can
recompute them bit-for-bit: randomness = md5 hex nibbles parsed with
``instr``/``strpos`` arithmetic (both engines agree on md5 of the same
string and on 1-based position-in-string).

Scale design (100 TB):
* Sharding is a stateless per-row hash — narrow map, no shuffle; writing
  `.partitionBy("shard")` gives shuffle-free shard files.
* Packing windows are per-shard (`PARTITION BY shard ORDER BY sort_key`):
  one shuffle on the shard key, external-sort within partitions; shard
  count scales the parallelism (here 16 for the oracle's sake; a real run
  uses O(cluster cores)).
* Mixture sampling is a stateless per-row predicate — no shuffle, pushes
  down past the scan's column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table

REG = Registry()

SEED = "42"
N_SHARDS = 16
SEQ_LEN = 512

_HEX = "0123456789abcdef"


def _nullsafe_str(c: F.Column) -> F.Column:
    """NULL → '' so F.concat matches DuckDB's concat (which skips NULL
    args) byte-for-byte; concat_ws would instead drop the SEPARATOR next
    to a NULL, silently diverging from the oracle on NULL keys."""
    return F.coalesce(c.cast("string"), F.lit(""))


def _sort_key() -> F.Column:
    """Deterministic per-doc shuffle key: md5(doc_id ':' seed)."""
    return F.md5(F.concat(_nullsafe_str(F.col("doc_id")), F.lit(":"), F.lit(SEED)))


def _nibble(col: str, pos: int) -> F.Column:
    """Value 0-15 of the pos-th (1-based) hex char of ``col``."""
    return F.expr(f"instr('{_HEX}', substring({col}, {pos}, 1)) - 1")


def _sql_nibble(col: str, pos: int) -> str:
    return f"(strpos('{_HEX}', substr({col}, {pos}, 1)) - 1)"


def _shard_col(key_col: str) -> F.Column:
    """Uniform shard in [0, N_SHARDS) from the first two hex nibbles of a
    md5 key column — the ONE shard formula every operator (and its SQL
    oracle via ``_sql_nibble``) must agree on."""
    return ((_nibble(key_col, 1) * 16 + _nibble(key_col, 2)) % N_SHARDS).cast("int")


_SHARD_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         md5(concat(CAST(doc_id AS VARCHAR), ':', '{SEED}')) AS sort_key
  FROM documents)
SELECT doc_id, sort_key,
       CAST(({_sql_nibble('sort_key', 1)} * 16 + {_sql_nibble('sort_key', 2)})
            % {N_SHARDS} AS INT) AS shard
FROM keyed
"""


@REG.register("shard_assign_shuffle", oracle=_SHARD_ORACLE)
def shard_assign_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus shuffle + sharding: every doc gets a seeded md5
    sort key and a uniform shard in [0, N_SHARDS). Downstream writers sort
    within shard by ``sort_key`` for a deterministic global shuffle order
    with NO global sort — the wide operation a naive
    ``ORDER BY rand()`` would need is avoided entirely."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.withColumn("sort_key", _sort_key())
    return keyed.withColumn("shard", _shard_col("sort_key"))


_PACK_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         md5(concat(CAST(doc_id AS VARCHAR), ':', '{SEED}')) AS sort_key,
         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tok
  FROM documents),
sharded AS (
  SELECT doc_id, sort_key, n_tok,
         CAST(({_sql_nibble('sort_key', 1)} * 16 + {_sql_nibble('sort_key', 2)})
              % {N_SHARDS} AS INT) AS shard
  FROM keyed),
packed AS (
  SELECT doc_id, shard, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY sort_key
                          ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM sharded)
SELECT doc_id, shard, n_tok,
       CAST((cum_tok - n_tok) // {SEQ_LEN} AS BIGINT) AS seq_id
FROM packed
"""


@REG.register("pack_sequences_budget", oracle=_PACK_ORACLE)
def pack_sequences_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy fixed-token-budget sequence packing: within each shard, docs
    are laid end-to-end in seeded-shuffle order and cut into SEQ_LEN-token
    training sequences (``seq_id`` = starting token offset // SEQ_LEN —
    the streaming-concat packing LLM loaders use). One shuffle on the
    shard key; the running sum is a per-partition window, never global."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tok"),
    )
    keyed = docs.withColumn("sort_key", _sort_key())
    sharded = keyed.withColumn("shard", _shard_col("sort_key"))
    w = (
        Window.partitionBy("shard")
        .orderBy("sort_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    return sharded.select(
        "doc_id",
        "shard",
        "n_tok",
        F.floor((cum - F.col("n_tok")) / SEQ_LEN).alias("seq_id"),
    )


# Mixture policy: source 'srcN' keeps (N % 4 + 1) / 4 of its docs —
# rates 0.25 / 0.50 / 0.75 / 1.00 — via a seeded md5 uniform per doc.
_MIX_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source,
         md5(concat(CAST(doc_id AS VARCHAR), ':mix:', '{SEED}')) AS k
  FROM documents),
scored AS (
  SELECT doc_id, source,
         ({_sql_nibble('k', 1)} * 4096 + {_sql_nibble('k', 2)} * 256
          + {_sql_nibble('k', 3)} * 16 + {_sql_nibble('k', 4)}) / 65536.0 AS u,
         (CAST(substr(source, 4) AS INT) % 4 + 1) / 4.0 AS rate
  FROM keyed)
SELECT doc_id, source, round(u, 6) AS u, rate
FROM scored
WHERE u < rate
"""


@REG.register("mixture_sample_by_source", oracle=_MIX_ORACLE)
def mixture_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixture resampling: each doc draws a seeded
    md5 uniform and survives iff u < rate(source). Stateless per-row
    predicate — no shuffle, no state; rates here derive from the source
    id (srcN → (N%4+1)/4) so the oracle recomputes them; a production run
    broadcast-joins a (source → rate) policy table instead."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    k = F.md5(
        F.concat(_nullsafe_str(F.col("doc_id")), F.lit(":mix:"), F.lit(SEED))
    )
    keyed = docs.withColumn("k", k)
    u = (
        _nibble("k", 1) * 4096
        + _nibble("k", 2) * 256
        + _nibble("k", 3) * 16
        + _nibble("k", 4)
    ) / F.lit(65536.0)
    rate = (F.substring("source", 4, 10).cast("int") % 4 + 1) / F.lit(4.0)
    return (
        keyed.withColumn("u", u)
        .withColumn("rate", rate)
        .where(F.col("u") < F.col("rate"))
        .select("doc_id", "source", F.round("u", 6).alias("u"), "rate")
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout keys — multi-column data skipping
# ---------------------------------------------------------------------------

def _spread16(c: F.Column) -> F.Column:
    """Interleave-ready bit spread of a 16-bit value (magic-bits Morton
    encoding — public-domain bit twiddling; same constants both engines)."""
    x = c.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


_ZORDER_ORACLE = """
WITH b AS (
  SELECT event_id,
         CAST(user_id & 65535 AS BIGINT) AS x,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) // 60 & 65535 AS BIGINT) AS y
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
s1 AS (SELECT event_id, x, y,
              ((x | (x << 8)) & 16711935)  AS xs, ((y | (y << 8)) & 16711935)  AS ys FROM b),
s2 AS (SELECT event_id, x, y,
              ((xs | (xs << 4)) & 252645135) AS xs, ((ys | (ys << 4)) & 252645135) AS ys FROM s1),
s3 AS (SELECT event_id, x, y,
              ((xs | (xs << 2)) & 858993459) AS xs, ((ys | (ys << 2)) & 858993459) AS ys FROM s2),
s4 AS (SELECT event_id, x, y,
              ((xs | (xs << 1)) & 1431655765) AS xs, ((ys | (ys << 1)) & 1431655765) AS ys FROM s3)
SELECT event_id, x, y, xs | (ys << 1) AS zkey
FROM s4
"""


@REG.register("layout_zorder_key", oracle=_ZORDER_ORACLE)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (user_id, minute-of-time): the
    multi-dimensional clustering key behind OPTIMIZE ZORDER-style layouts.

    Writing a 100 TB events table sorted by ``zkey`` makes per-file min/max
    statistics selective in BOTH dimensions at once, so scans filtered on
    user ranges AND time ranges skip files (a single-column sort only ever
    skips in one). Computing the key is a stateless narrow map — the sort
    happens once at write time (`sortWithinPartitions("zkey")` after a
    range-partition on zkey). Magic-bits interleave stays in whole-stage
    codegen; the oracle replays the identical constants."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    x = F.col("user_id").bitwiseAND(F.lit(0xFFFF)).cast("long")
    # floor division (not cast-truncation, which rounds toward zero and
    # diverges from the oracle's // for pre-1970 timestamps)
    y = (
        F.floor(F.unix_timestamp("ts") / 60).cast("long").bitwiseAND(F.lit(0xFFFF))
    )
    keyed = ev.select("event_id", x.alias("x"), y.alias("y"))
    z = _spread16(F.col("x")).bitwiseOR(F.shiftleft(_spread16(F.col("y")), 1))
    return keyed.select("event_id", "x", "y", z.alias("zkey"))


# ---------------------------------------------------------------------------
# Full train-ready composite: filter → dedup → chunk → shard → pack
# ---------------------------------------------------------------------------

_TRAIN_READY_ORACLE = f"""
WITH filtered AS (
  SELECT doc_id, text FROM documents
  WHERE lang IN ('en', 'de', 'fr', 'es') AND n_chars >= 100
    AND len(list_filter(regexp_split_to_array(text, '\\s+'),
                        x -> len(x) > 0)) >= 20),
dedup AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY sha256(text)
                              ORDER BY doc_id) AS rn
    FROM filtered) WHERE rn = 1),
chunks AS (
  SELECT doc_id,
         unnest(generate_series(1, CAST(ceil(len(text) / 200.0) AS INTEGER)))
           AS chunk_idx,
         text
  FROM dedup),
toks AS (
  SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
         CAST(len(list_filter(
                regexp_split_to_array(
                  substr(text, (chunk_idx - 1) * 200 + 1, 200), '\\s+'),
                x -> len(x) > 0)) AS BIGINT) AS n_tokens,
         md5(concat(CAST(doc_id AS VARCHAR), '#', CAST(chunk_idx AS VARCHAR),
                    ':', '{SEED}')) AS sort_key
  FROM chunks),
sharded AS (
  SELECT doc_id, chunk_idx, n_tokens, sort_key,
         CAST(({_sql_nibble('sort_key', 1)} * 16 + {_sql_nibble('sort_key', 2)})
              % {N_SHARDS} AS INT) AS shard
  FROM toks),
packed AS (
  SELECT doc_id, chunk_idx, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY sort_key
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM sharded)
SELECT doc_id, chunk_idx, shard, n_tokens,
       CAST((cum - n_tokens) // {SEQ_LEN} AS BIGINT) AS seq_id
FROM packed
"""


@REG.register("pipeline_train_ready", oracle=_TRAIN_READY_ORACLE)
def pipeline_train_ready(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-data flow as one Catalyst plan: language /
    length / token-count quality gate → exact dedup (first-id survivor
    per sha256) → 200-char chunking → per-chunk token counts → seeded
    shuffle-shard assignment → fixed-token-budget sequence packing.

    Extends ``pipeline_prepare_corpus`` with the traindata last mile.
    Exactly TWO shuffles at any scale: the dedup window on sha256(text)
    (uniform 64-hex key) and the per-shard packing window; chunk fan-out,
    hashing, and shard derivation are all narrow codegen'd maps. The
    output is what a loader consumes: (shard, seq_id) → chunk list."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tok = lambda c: F.size(  # noqa: E731
        F.filter(F.split(c, r"\s+"), lambda x: F.length(x) > 0)
    )
    filtered = docs.where(
        F.col("lang").isin("en", "de", "fr", "es")
        & (F.col("n_chars") >= 100)
        & (n_tok(F.col("text")) >= 20)
    ).select("doc_id", "text")
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    dedup = (
        filtered.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    chunks = dedup.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.ceil(F.length("text") / 200.0).cast("int"))
        ).alias("chunk_idx"),
    )
    chunk = F.substring(F.col("text"), (F.col("chunk_idx") - 1) * 200 + 1, 200)
    toks = chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        n_tok(chunk).cast("long").alias("n_tokens"),
        F.md5(
            F.concat(
                _nullsafe_str(F.col("doc_id")),
                F.lit("#"),
                _nullsafe_str(F.col("chunk_idx")),
                F.lit(":"),
                F.lit(SEED),
            )
        ).alias("sort_key"),
    )
    sharded = toks.withColumn("shard", _shard_col("sort_key"))
    pw = (
        Window.partitionBy("shard")
        .orderBy("sort_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(pw)
    return sharded.select(
        "doc_id",
        "chunk_idx",
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / SEQ_LEN).alias("seq_id"),
    )


# ---------------------------------------------------------------------------
# Weighted reservoir sampling (round 4): Efraimidis-Spirakis A-ES
# ---------------------------------------------------------------------------

_WRS_N = 50  # sample size


def _u32_from_md5(key_col: str):
    """Uniform u in (0,1) from the first 8 hex nibbles of a md5 column —
    identical nibble arithmetic on both engines (instr/strpos)."""
    acc = _nibble(key_col, 1).cast("long")  # long from the start: 8 nibbles overflow INT under ANSI
    for pos in range(2, 9):
        acc = acc * 16 + _nibble(key_col, pos)
    return (acc.cast("double") + 1.0) / 4294967297.0  # (u32 + 1) / (2^32 + 1)


def _sql_u32_from_md5(key_col: str) -> str:
    expr = _sql_nibble(key_col, 1)
    for pos in range(2, 9):
        expr = f"(({expr}) * 16 + {_sql_nibble(key_col, pos)})"
    return f"((CAST({expr} AS DOUBLE) + 1.0) / 4294967297.0)"


_WRS_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         CAST(greatest(coalesce(n_chars, 0), 1) AS BIGINT) AS weight,
         md5(concat(CAST(doc_id AS VARCHAR), ':wrs:', '42')) AS h
  FROM documents WHERE doc_id IS NOT NULL),
scored AS (
  SELECT doc_id, weight,
         pow({_sql_u32_from_md5('h')}, 1.0 / weight) AS es_key
  FROM keyed)
SELECT doc_id, weight, round(es_key, 6) AS es_key
FROM (SELECT *, row_number() OVER (ORDER BY es_key DESC, doc_id) AS rn
      FROM scored)
WHERE rn <= {_WRS_N}
"""


@REG.register("sample_weighted_reservoir", oracle=_WRS_ORACLE)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via Efraimidis-Spirakis A-ES:
    each row gets key u^(1/w) (u = seeded md5 uniform, w = doc length) and
    the sample is the global top-n keys — inclusion probability
    proportional to weight, the standard way to length-weight a training
    mixture draw.

    Scale: A-ES is exactly a top-n over a narrow map — the plan is
    TakeOrderedAndProject-shaped (per-partition heaps, no global sort),
    which is why this beats ORDER BY rand() LIMIT n at any size. Seeded
    md5 uniforms make the draw reproducible across engines and
    partitionings; the md5-randomized keys keep adjacent ES keys far
    apart relative to double precision, so cross-engine libm pow
    differences (<=1 ulp) cannot reorder the cutoff."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    keyed = docs.select(
        "doc_id",
        F.greatest(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(1))
        .cast("long")
        .alias("weight"),
        F.md5(
            F.concat(_nullsafe_str(F.col("doc_id")), F.lit(":wrs:"), F.lit(SEED))
        ).alias("h"),
    )
    scored = keyed.select(
        "doc_id",
        "weight",
        F.pow(_u32_from_md5("h"), 1.0 / F.col("weight")).alias("es_key"),
    )
    # orderBy().limit() plans TakeOrderedAndProject (per-partition heaps,
    # no single-partition global window) — the scale-correct top-n
    return (
        scored.orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(_WRS_N)
        .select("doc_id", "weight", F.round("es_key", 6).alias("es_key"))
    )


# ---------------------------------------------------------------------------
# Hilbert curve layout keys (round 4) — better range locality than Morton
# ---------------------------------------------------------------------------

# Hilbert xy2d (order 15): fold over bit levels 14..0. The accumulator is
# ONE BIGINT packing (d << 30) | (x << 15) | y — a scalar fold because
# DuckDB 1.0's list_reduce mis-evaluates multi-field STRUCT accumulators
# deep in a chain (same state + same lambda gave different results at
# step 4 of the chained fold vs a single step; scalar accumulators are
# the well-trodden path, cf. doc_fingerprint). Order 15 keeps the packed
# value within 60 bits. At each level: rx/ry are the level bits of x/y,
# d gains (1 << 2i) * ((3*rx) XOR ry), and the quadrant rotation
# flips (with the 32767 complement, keeping intermediates non-negative)
# and swaps x and y. The SAME fold runs as Spark's ``aggregate``
# higher-order function and DuckDB's ``list_reduce``. Beware: DuckDB
# parses ``a << 30 | b`` left-to-right at ONE precedence level
# (((a << 30) | b) — every shift term below is fully parenthesized.

_H_X = "((acc >> 15) & 32767)"
_H_Y = "(acc & 32767)"
_H_RX = f"(({_H_X} >> i) & 1)"
_H_RY = f"(({_H_Y} >> i) & 1)"
_H_NEWX = (
    f"(CASE WHEN {_H_RY} = 0 THEN CASE WHEN {_H_RX} = 1 "
    f"THEN 32767 - {_H_Y} ELSE {_H_Y} END ELSE {_H_X} END)"
)
_H_NEWY = (
    f"(CASE WHEN {_H_RY} = 0 THEN CASE WHEN {_H_RX} = 1 "
    f"THEN 32767 - {_H_X} ELSE {_H_X} END ELSE {_H_Y} END)"
)

_HILBERT_SPARK = f"""
shiftright(
  aggregate(
    sequence(14, 0, -1),
    CAST(shiftleft(x, 15) + y AS BIGINT),
    (acc, i) ->
      shiftleft((acc >> 30) + shiftleft(CAST(1 AS BIGINT), 2 * i)
                * ((3 * {_H_RX}) ^ {_H_RY}), 30)
      + shiftleft({_H_NEWX}, 15)
      + {_H_NEWY}
  ),
  30)
"""

_HILBERT_DUCK = f"""
list_reduce(
  list_prepend(CAST((x << 15) | y AS BIGINT),
               list_transform(generate_series(14, 0, -1),
                              ii -> CAST(ii AS BIGINT))),
  (acc, i) ->
    (((acc >> 30) + (CAST(1 AS BIGINT) << (2 * i))
      * xor(3 * {_H_RX}, {_H_RY})) << 30)
    | ({_H_NEWX} << 15)
    | {_H_NEWY}
) >> 30
"""

_HILBERT_ORACLE = f"""
WITH b AS (
  SELECT event_id,
         CAST(user_id & 32767 AS BIGINT) AS x,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) // 60 & 32767 AS BIGINT) AS y
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL)
SELECT event_id, x, y, {_HILBERT_DUCK} AS hkey
FROM b
"""


@REG.register("layout_hilbert_key", oracle=_HILBERT_ORACLE)
def layout_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert curve layout key over (user_id, minute-of-time) — the
    higher-locality alternative to ``layout_zorder_key``: a Hilbert walk
    visits every cell of the 2^15 x 2^15 grid with CONSECUTIVE keys
    always one Manhattan step apart (Morton jumps at power-of-two
    boundaries), so files sorted by ``hkey`` have tighter per-file
    min/max boxes in both dimensions and skip more at scan time.

    The xy2d fold runs entirely inside Catalyst's ``aggregate``
    higher-order function — JVM expression evaluation, no Python, a
    stateless narrow map (HOF lambdas are interpreted rather than
    whole-stage-codegen'd, which is why this key costs ~1s at sf0.1
    where the Morton magic-bits key costs ~0.1 — the price of exact
    unit-step locality; both are one-time write-path costs). The DuckDB
    oracle folds the identical packed-scalar recurrence with
    ``list_reduce``. The locality property (bijection +
    unit steps) is pinned exhaustively on a small grid in
    tests/test_props.py."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    keyed = ev.select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(0x7FFF)).cast("long").alias("x"),
        F.floor(F.unix_timestamp("ts") / 60)
        .cast("long")
        .bitwiseAND(F.lit(0x7FFF))
        .alias("y"),
    )
    return keyed.select("event_id", "x", "y", F.expr(_HILBERT_SPARK).alias("hkey"))


_TEMP_ALPHA = 0.3

_TEMP_MIX_ORACLE = f"""
WITH s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents WHERE source IS NOT NULL
  GROUP BY source)
SELECT source, n_docs,
       round(pow(n_docs, {_TEMP_ALPHA}) / SUM(pow(n_docs, {_TEMP_ALPHA})) OVER (), 6)
         AS weight,
       round(LEAST(1.0,
             pow(n_docs, {_TEMP_ALPHA}) / SUM(pow(n_docs, {_TEMP_ALPHA})) OVER ()
             * SUM(n_docs) OVER () / n_docs), 6) AS sample_rate
FROM s
"""


@REG.register("mixture_temperature_weights", oracle=_TEMP_MIX_ORACLE)
def mixture_temperature_weights(
    spark: SparkSession, sf_dir: str, alpha: float = _TEMP_ALPHA
) -> DataFrame:
    """Temperature-based source rebalancing weights (round 6) — the
    policy-table producer for `mixture_sample_by_source`: w_s ∝ n_s^α
    (α=0.3, the multilingual-pretraining temperature that upsamples
    small sources without letting them dominate; α=1 is proportional,
    α=0 uniform), plus the per-doc `sample_rate` (= w_s·N/n_s, capped at
    1) a stateless row predicate then applies.

    Plan: one per-source count aggregate (map-side combined), then the
    normalization over the SOURCES-sized frame — the whole-frame window
    runs on a handful of rows, which is exactly when an unpartitioned
    window is correct (the policy table is KB-sized at any corpus
    scale). Downstream, `mixture_sample_by_source`'s seeded-uniform
    predicate consumes these rates with zero shuffle over the corpus."""
    from pyspark.sql import Window

    s = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull())
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w_all = Window.partitionBy()  # sources-sized frame: fine by design
    pw = F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
    weight = pw / F.sum(pw).over(w_all)
    rate = F.least(
        F.lit(1.0),
        weight * F.sum("n_docs").over(w_all) / F.col("n_docs"),
    )
    return s.select(
        "source",
        "n_docs",
        F.round(weight, 6).alias("weight"),
        F.round(rate, 6).alias("sample_rate"),
    )


# ---------------------------------------------------------------------------
# Round 10: leakage-safe split assignment — the stage between dedup and
# training that the shard/pack/mixture keys above all assume has already
# happened correctly.
# ---------------------------------------------------------------------------

from .dedup import NGRAM_CLUSTER_CTES  # noqa: E402 — one pair graph, one oracle text

_SPLIT_ORACLE = (
    "WITH RECURSIVE "
    + NGRAM_CLUSTER_CTES
    + f""",
keyed AS (
  SELECT doc_id, cluster_id,
         md5(concat(CAST(cluster_id AS VARCHAR), ':', '{SEED}')) AS skey
  FROM labels),
b AS (
  SELECT doc_id, cluster_id,
         CAST(({_sql_nibble('skey', 1)} * 16 + {_sql_nibble('skey', 2)})
              % 100 AS INT) AS bucket
  FROM keyed)
SELECT doc_id, cluster_id,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""
)


@REG.register("split_assign_cluster_safe", oracle=_SPLIT_ORACLE)
def split_assign_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a seeded hash
    of the NEAR-DUP CLUSTER id, not the document id — so a document and
    its near-duplicates land in the same split BY CONSTRUCTION, and
    held-out evaluation can never be contaminated by a paraphrase of a
    training doc (doc-keyed random splits leak exactly this way; it is
    the split-time twin of the contamination_ngram_overlap check).

    Clusters are the transitive closure of the exact 3-gram-Jaccard pair
    graph (`dedup_ngram_jaccard` ≥ 0.5, `_hash_min_cc`), labeled by min
    member id; the bucket is the same md5-nibble formula as
    `shard_assign_shuffle` (the module's ONE hash idiom Spark and DuckDB
    compute bit-identically), 80/10/10 over buckets 0-99. Keyed on
    cluster_id, so every cluster maps to exactly one split
    (tests/test_split_cluster_safe.py asserts no pair straddles).

    At 100 TB: one CC pass over the candidate-sized pair graph (already
    required for dedup itself), then pure map-side arithmetic — the
    assignment adds no shuffle beyond the singleton fill-in join, and
    re-runs reproduce the same split for unchanged clusters (stable ids
    → stable buckets), which is what makes incremental corpus refreshes
    auditable. Output: (doc_id, cluster_id, split)."""
    from .dedup import _cluster_labels, _jaccard_pairs_shared

    pairs = _jaccard_pairs_shared(spark, sf_dir)
    labeled = _cluster_labels(spark, sf_dir, pairs)
    keyed = labeled.withColumn(
        "skey",
        F.md5(
            F.concat(_nullsafe_str(F.col("cluster_id")), F.lit(":"), F.lit(SEED))
        ),
    )
    bucket = ((_nibble("skey", 1) * 16 + _nibble("skey", 2)) % 100).cast("int")
    return keyed.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


_EPOCH_BUDGET_MULT = 2.0  # token budget = 2x the corpus (upsampling regime)
_EPOCH_CAP = 2.0  # no source repeats more than 2 epochs

_EPOCH_SCHEDULE_ORACLE = f"""
WITH s AS (
  SELECT source,
         SUM(len(regexp_split_to_array(lower(text), '\\s+'))) AS n_tokens
  FROM documents WHERE source IS NOT NULL GROUP BY source),
w AS (
  SELECT source, n_tokens,
         pow(n_tokens, 0.3) / SUM(pow(n_tokens, 0.3)) OVER () AS wt,
         SUM(n_tokens) OVER () * {_EPOCH_BUDGET_MULT} AS budget
  FROM s),
c AS (
  SELECT source, n_tokens, wt * budget AS desired,
         least(wt * budget, {_EPOCH_CAP} * n_tokens) AS granted0,
         CASE WHEN wt * budget > {_EPOCH_CAP} * n_tokens
              THEN 1 ELSE 0 END AS clipped
  FROM w),
r AS (
  SELECT *,
         SUM(desired - granted0) FILTER (clipped = 1) OVER () AS leftover,
         SUM(desired) FILTER (clipped = 0) OVER () AS open_mass
  FROM c)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(desired, 6) AS desired_tokens,
       round(CASE WHEN clipped = 1 THEN granted0
                  ELSE least(desired * (1 + COALESCE(leftover, 0)
                                            / open_mass),
                             {_EPOCH_CAP} * n_tokens) END, 6)
         AS granted_tokens,
       round(CASE WHEN clipped = 1 THEN granted0
                  ELSE least(desired * (1 + COALESCE(leftover, 0)
                                            / open_mass),
                             {_EPOCH_CAP} * n_tokens) END / n_tokens, 6)
         AS epochs,
       CAST(clipped AS INTEGER) AS clipped
FROM r
"""


@REG.register("mixture_epoch_schedule", oracle=_EPOCH_SCHEDULE_ORACLE)
def mixture_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-capped mixture schedule — the data-constrained-scaling step
    AFTER `mixture_temperature_weights` picks desired source shares
    (w_s ∝ n_s^0.3): a 2x-corpus token budget is allocated per source,
    but no source may repeat beyond _EPOCH_CAP epochs (Muennighoff et
    al. 2023: repeated tokens decay in value, so pipelines cap repeats
    and re-spend the excess). Sources whose desired allocation exceeds
    the cap are CLIPPED to cap·n_tokens; the clipped-off mass is
    redistributed in ONE pass to unclipped sources proportional to
    their desired share, re-capped (a second clip is NOT re-redistributed
    — documented single-round policy, deterministic on both engines;
    iterate externally if the residual matters).

    Plan: one map-side-combinable token-count agg per source, then every
    window runs on the SOURCES-sized frame (20 rows here, KB at any
    corpus scale) — the same policy-table posture as
    `mixture_temperature_weights`. Output: (source, n_tokens,
    desired_tokens, granted_tokens, epochs, clipped)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isNotNull()
    )
    s = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.lower("text"), r"\s+"))).alias("n_tokens")
    )
    w_all = Window.partitionBy()
    pw = F.pow(F.col("n_tokens").cast("double"), F.lit(0.3))
    wt = pw / F.sum(pw).over(w_all)
    budget = F.sum("n_tokens").over(w_all) * _EPOCH_BUDGET_MULT
    c = s.select(
        "source",
        "n_tokens",
        (wt * budget).alias("desired"),
        F.least(wt * budget, _EPOCH_CAP * F.col("n_tokens")).alias("granted0"),
        F.when(wt * budget > _EPOCH_CAP * F.col("n_tokens"), 1)
        .otherwise(0)
        .alias("clipped"),
    )
    r = c.select(
        "*",
        F.sum(F.when(F.col("clipped") == 1, F.col("desired") - F.col("granted0")))
        .over(w_all)
        .alias("leftover"),
        F.sum(F.when(F.col("clipped") == 0, F.col("desired")))
        .over(w_all)
        .alias("open_mass"),
    )
    granted = F.when(F.col("clipped") == 1, F.col("granted0")).otherwise(
        F.least(
            F.col("desired")
            * (1 + F.coalesce("leftover", F.lit(0.0)) / F.col("open_mass")),
            _EPOCH_CAP * F.col("n_tokens"),
        )
    )
    return r.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("desired", 6).alias("desired_tokens"),
        F.round(granted, 6).alias("granted_tokens"),
        F.round(granted / F.col("n_tokens"), 6).alias("epochs"),
        F.col("clipped").cast("int").alias("clipped"),
    )
