"""Stats-gated join strategy selection (round 6).

At 100 TB the same logical join wants three different physical plans
depending on the inputs' catalog stats and layout:

* one side under the broadcast budget        -> broadcast hash join
  (no shuffle at all; the small side ships to every executor);
* both sides bucketed on the join keys with  -> sort-merge join over
  compatible bucket counts                      co-located buckets
  (ZERO exchange on either side — the layout already paid the shuffle);
* otherwise                                  -> plain shuffle SMJ
  (both sides exchange on the key; AQE handles skew/coalescing).

Catalyst already picks broadcast-vs-shuffle from its size estimates and
uses bucket layouts when present, but it cannot CHOOSE to maintain a
bucketed layout, and its broadcast decision uses one global threshold.
This module is the planning half a pipeline owns: an explicit, testable
cost probe over the stats Spark itself exposes (optimized-plan
``sizeInBytes`` — fed by file sizes / catalog statistics — plus the
catalog's bucket spec), returning a decision the caller can log, audit,
and pin in tests. The three regimes are plan-asserted in
tests/test_bucketing.py.

Reference scope note: the reference (LDAClustering.scala) has no joins
beyond a vocabulary lookup; this belongs to the §2.9 scale battery
(bucketed-join elision was demonstrated in round 3; round 6 adds the
stats gate that PICKS it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table

REG = Registry()


_BYTE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def _parse_byte_string(conf: str) -> int:
    """Spark size-conf strings carry optional unit suffixes ('10MB', '1g',
    '10485760b', '-1'); mirror JavaUtils.byteStringAsBytes so a session
    configured with any legal spelling doesn't crash the probe."""
    import re

    m = re.fullmatch(r"\s*(-?\d+)\s*([a-zA-Z]*)\s*", conf)
    if not m:
        raise ValueError(f"unparseable size string: {conf!r}")
    suffix = m.group(2).lower()
    if suffix not in _BYTE_SUFFIX:
        raise ValueError(f"unknown size suffix in: {conf!r}")
    return int(m.group(1)) * _BYTE_SUFFIX[suffix]


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's own size estimate for the frame (bytes): file-source
    relations report parquet footer sizes, catalog tables report ANALYZE
    stats when present. This is exactly the number Catalyst's broadcast
    rule consults, so gating on it keeps our decision consistent with
    what the optimizer would believe."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def _bucket_spec(spark: SparkSession, ref: str | DataFrame):
    """(n_buckets, [bucket cols]) for a catalog table name, else None.
    Plain DataFrames (file scans, derived frames) carry no bucket layout
    by definition."""
    if not isinstance(ref, str):
        return None
    try:
        rows = spark.sql(f"DESCRIBE EXTENDED {ref}").collect()
    except Exception:
        return None
    info = {r["col_name"].strip(): (r["data_type"] or "").strip() for r in rows}
    if "Num Buckets" not in info or "Bucket Columns" not in info:
        return None
    try:
        n = int(info["Num Buckets"])
    except ValueError:
        return None
    cols = [
        c.strip().strip("`")
        for c in info["Bucket Columns"].strip("[]").split(",")
        if c.strip()
    ]
    return (n, cols) if n > 0 and cols else None


def _resolve(spark: SparkSession, ref: str | DataFrame) -> DataFrame:
    return spark.table(ref) if isinstance(ref, str) else ref


def choose_join_strategy(
    spark: SparkSession,
    left: str | DataFrame,
    right: str | DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    *,
    broadcast_threshold: int | None = None,
) -> dict:
    """The cost probe. Returns a decision record:
    {strategy: 'broadcast'|'bucketed'|'shuffle', broadcast_side:
    'left'|'right'|None, left_bytes, right_bytes, reason} — so callers
    can log WHY a plan was chosen (the difference between a planner and
    a heuristic is an auditable reason)."""
    ldf, rdf = _resolve(spark, left), _resolve(spark, right)
    if broadcast_threshold is None:
        conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        broadcast_threshold = _parse_byte_string(conf)
    lsz, rsz = _plan_size_bytes(ldf), _plan_size_bytes(rdf)

    if 0 <= broadcast_threshold and min(lsz, rsz) <= broadcast_threshold:
        side = "left" if lsz <= rsz else "right"
        return {
            "strategy": "broadcast",
            "broadcast_side": side,
            "left_bytes": lsz,
            "right_bytes": rsz,
            "reason": f"{side} side {min(lsz, rsz)} B <= broadcast budget "
            f"{broadcast_threshold} B: ship the dim, shuffle nothing",
        }

    lb, rb = _bucket_spec(spark, left), _bucket_spec(spark, right)
    if (
        lb is not None
        and rb is not None
        and lb[1] == [k.lower() for k in left_keys]
        and rb[1] == [k.lower() for k in right_keys]
        # equal counts co-locate 1:1; Spark can also read n/kn layouts,
        # but we only claim elision for the exact match we can assert
        and lb[0] == rb[0]
    ):
        return {
            "strategy": "bucketed",
            "broadcast_side": None,
            "left_bytes": lsz,
            "right_bytes": rsz,
            "reason": f"both sides bucketed by join keys into {lb[0]} "
            "buckets: SMJ reads co-located buckets, zero exchange",
        }

    return {
        "strategy": "shuffle",
        "broadcast_side": None,
        "left_bytes": lsz,
        "right_bytes": rsz,
        "reason": "no side under the broadcast budget and no compatible "
        "bucket layout: shuffle SMJ (AQE owns skew/coalescing)",
    }


def join_with_strategy(
    spark: SparkSession,
    left: str | DataFrame,
    right: str | DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    how: str = "inner",
    *,
    broadcast_threshold: int | None = None,
) -> tuple[DataFrame, dict]:
    """Apply the probe's decision: broadcast-hint the chosen small side,
    or emit the plain join (bucketed layouts need no hint — Catalyst
    uses them; the probe's value there is CHOOSING to route the join to
    the bucketed tables and asserting the elision). Returns
    (joined, decision)."""
    decision = choose_join_strategy(
        spark, left, right, left_keys, right_keys,
        broadcast_threshold=broadcast_threshold,
    )
    ldf, rdf = _resolve(spark, left), _resolve(spark, right)
    if decision["strategy"] == "broadcast":
        if decision["broadcast_side"] == "left":
            ldf = F.broadcast(ldf)
        else:
            rdf = F.broadcast(rdf)
    else:
        # enforce the probe's decision: without the hint Catalyst applies
        # its own (global) broadcast threshold, which may disagree with
        # the budget this call was given — a planner whose plan can
        # silently diverge from its decision record is not auditable
        ldf = ldf.hint("merge")
    cond = None
    for lk, rk in zip(left_keys, right_keys):
        c = ldf[lk] == rdf[rk]
        cond = c if cond is None else (cond & c)
    return ldf.join(rdf, cond, how), decision


_AUTO_JOIN_ORACLE = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@REG.register("join_auto_strategy", oracle=_AUTO_JOIN_ORACLE)
def join_auto_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stats-gated planner driving a real two-join query: orders ⋈
    customer ⋈ nation, each join routed through ``join_with_strategy``.
    At test SFs both dims fall under the broadcast budget so the probe
    picks broadcast twice (the decision record is logged into the plan
    via the hint); at 100 TB the same code picks bucketed or shuffle from
    the same stats. The oracle is the plain SQL join — the strategy must
    never change the answer."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j1, _ = join_with_strategy(
        spark, orders, customer, ["o_custkey"], ["c_custkey"]
    )
    j2, _ = join_with_strategy(
        spark, j1, nation, ["c_nationkey"], ["n_nationkey"]
    )
    return j2.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # sum in decimal for exactness, emit DOUBLE: the repo-wide money
        # convention (tpch_more.py:14-16) — the driver's value-hash
        # canonicalizes Spark Decimal vs DuckDB float64 differently, so a
        # DECIMAL-typed output column hash-mismatches even on exact values
        F.sum("price").cast("double").alias("total_price"),
    )
