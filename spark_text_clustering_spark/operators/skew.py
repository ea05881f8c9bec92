"""Skew-mitigation helpers: salted aggregation and salted broadcast-side
replication (docs/SCALE.md, Aggregations/Joins).

AQE's skew-join splitting covers sort-merge joins automatically; these
helpers cover the two cases it doesn't: skewed *aggregation* keys, and
hash joins where one key dominates. Salting is deterministic here
(``pmod(hash(...), n)``) so results are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    salt_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys: partial agg on
    (key, salt) → final agg on key.

    ``agg_exprs`` maps output column → 'sum'|'count'|'min'|'max' (the
    re-aggregatable functions: sum-of-sums, sum-of-counts, min-of-mins...).
    ``salt_cols`` feed the deterministic salt hash (any high-cardinality
    columns, e.g. a row id).
    """
    remerge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn in agg_exprs.values():
        if fn not in remerge:
            raise ValueError(f"{fn!r} is not re-aggregatable; use sum/count/min/max")

    salt = F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(n_salts)).alias("_salt")
    stage1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt")
    first_aggs = []
    for out, fn in agg_exprs.items():
        src = out.split("__", 1)[0] if "__" in out else out
        col = F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(src)
        first_aggs.append(col.alias(out))
    partial = stage1.agg(*first_aggs)
    final_aggs = [remerge[fn](out).alias(out) for out, fn in agg_exprs.items()]
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed large side against a small side by replicating the
    small side ``n_salts`` times and salting the large side's key — every
    hot key spreads over ``n_salts`` partitions instead of one straggler.

    The small side must be broadcastable (it is replicated n_salts×).
    """
    salted_large = skewed.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_large.join(F.broadcast(replicated_small), [key, "_salt"], how)
    return out.drop("_salt")
