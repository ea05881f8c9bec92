"""Event-funnel / cohort analytics and embedding-pooling operators.

Nothing like these exists in the reference (SURVEY §2.5/§2.9 — no joins,
no SQL); they round out the engine's product-analytics surface on the
driver's `events` table and the training-data-pipeline surface on
`embeddings`. All four are DuckDB-oracled.

Scale notes are per-operator docstrings; the common theme: everything is
a keyed aggregate or a dimension-wise re-key — no driver collects, no
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table
from ..session import ensure_utc

REG = Registry()


@REG.register(
    "embedding_centroid_per_label",
    oracle="""
    WITH flat AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings),
    dims AS (
      SELECT label, pos, AVG(val) AS v
      FROM flat GROUP BY label, pos)
    SELECT label, list(v ORDER BY pos) AS centroid
    FROM dims GROUP BY label
    """,
)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled centroid per label — the building block of IVF index
    builds, class prototypes, and k-means steps. Dimension-wise plan:
    posexplode re-keys the data to (label, dim), the avg is a partial+final
    hash agg over ~labels×64 groups, and the centroid is reassembled with
    a sort_array(collect_list(struct)) — collect_list here holds exactly
    64 scalars per group, bounded regardless of corpus size, so the
    operator is safe at 100 TB (the shuffle carries one row per
    (label, dim), not per vector)."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos0", "val"
        ),
    )
    dims = flat.groupBy("label", (F.col("pos0") + 1).alias("pos")).agg(
        F.avg("val").alias("v")
    )
    return dims.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
        ).alias("centroid")
    )


@REG.register(
    "higher_order_array_funcs",
    oracle="""
    SELECT vec_id,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           list_sum(list_transform(embedding,
                (x, i) -> CAST(x AS DOUBLE)
                          * CAST(embedding[len(embedding) + 1 - i] AS DOUBLE)))
             AS dot_reversed
    FROM embeddings
    """,
)
def higher_order_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — aggregate (fold), filter, zip_with —
    the JVM-side lambda surface that keeps per-element vector math out of
    Python UDFs entirely. All three expressions run inside whole-stage
    codegen over the array column; zero shuffles, zero Arrow transfers.
    The reversed-dot uses zip_with against reverse(), matching the
    oracle's index-lambda form."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.sqrt(
            F.aggregate(
                as_double, F.lit(0.0), lambda acc, x: acc + x * x
            )
        ).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.aggregate(
            F.zip_with(as_double, F.reverse(as_double), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("dot_reversed"),
    )


@REG.register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_buy
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS clicked_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS purchased_after_click
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): each step is a per-user
    MIN-timestamp aggregate joined to the previous step with a strict
    t > prev_t condition — the standard sequential-conversion shape. All
    three steps shuffle on user_id only (AQE reuses the partitioning);
    the final counts are three 1-row aggregates cross-joined, so nothing
    large ever leaves the user_id-keyed stages."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    return (
        v.agg(F.count(F.lit(1)).cast("long").alias("viewed"))
        .crossJoin(
            c.agg(F.count(F.lit(1)).cast("long").alias("clicked_after_view"))
        )
        .crossJoin(
            p.agg(F.count(F.lit(1)).cast("long").alias("purchased_after_click"))
        )
    )


@REG.register(
    "retention_cohort",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             CAST(floor(date_diff('day', f.cohort_day,
                                  CAST(date_trunc('day', e.ts) AS TIMESTAMP))
                        / 7) AS INTEGER) AS week_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id)
    SELECT cohort_day, week_offset, CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity GROUP BY cohort_day, week_offset
    """,
)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen day, counted
    once per (cohort, week-offset) they were active in. Two shuffles —
    user_id for the first-seen aggregate (reused by the join) and the
    tiny (cohort, offset) key for the final count. The DISTINCT collapses
    per-user-per-week duplicates before the count shuffle, so the final
    exchange carries at most users×weeks rows."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(
                F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "week_offset").agg(
        F.count(F.lit(1)).cast("long").alias("active_users")
    )
