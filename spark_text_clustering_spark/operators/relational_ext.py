"""Extended relational surface: as-of joins, sliding/session windows in
batch form, pivot/unpivot, grouping sets, subqueries (Spark SQL API),
string/date scalar functions, and TPC-H-shaped multi-join queries.

None of this exists in the reference (SURVEY §2.5 "not present" list) —
it's the engine completeness layer, all built-in Catalyst, all oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table
from ..session import ensure_utc
from ..sqlview import sql_over

REG = Registry()


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------


@REG.register(
    "join_asof",
    oracle="""
    WITH pairs AS (
      SELECT c.event_id AS click_id, v.event_id AS view_id, v.ts AS view_ts,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM events c JOIN events v
        ON c.user_id = v.user_id AND v.ts <= c.ts AND v.event_id <> c.event_id
      WHERE c.event_type = 'click' AND v.event_type = 'view')
    SELECT click_id, view_id, view_ts FROM pairs WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the most recent prior (or simultaneous)
    view by the same user. Implemented as equi-join on the user key + per-
    click rank — the classic Spark formulation when there's a partition key.

    Scale: the shuffle rides user_id; per-user pair count is |clicks|×|views|
    within a user. For key-less as-of joins, range-bucket event time and
    join bucket±1 (docs/SCALE.md).
    """
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").alias("c")
    v = ev.where(F.col("event_type") == "view").alias("v")
    pairs = c.join(
        v,
        (F.col("c.user_id") == F.col("v.user_id"))
        & (F.col("v.ts") <= F.col("c.ts"))
        & (F.col("v.event_id") != F.col("c.event_id")),
    )
    w = Window.partitionBy("c.event_id").orderBy(F.desc("v.ts"), F.desc("v.event_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("c.event_id").alias("click_id"),
            F.col("v.event_id").alias("view_id"),
            F.col("v.ts").alias("view_ts"),
        )
    )


@REG.register(
    "join_asof_keyless_bucketed",
    oracle="""
    WITH pairs AS (
      SELECT c.event_id AS click_id, v.event_id AS view_id, v.ts AS view_ts,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM events c JOIN events v
        ON v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 1 HOUR
       AND v.event_id <> c.event_id
      WHERE c.event_type = 'click' AND v.event_type = 'view')
    SELECT click_id, view_id, view_ts FROM pairs WHERE rn = 1
    """,
)
def join_asof_keyless_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEY-LESS bounded as-of join via the time-bucket ±1 trick — the
    mechanism docs/SCALE.md prescribes when there is no partition key to
    ride (``join_asof`` uses user_id; here ANY prior view within 1 hour
    qualifies, across all users).

    A key-less inequality join is a cartesian product to Catalyst (range
    join at best). Bucketing event time to the lookback interval (1 h)
    restores an equi-key: a view within (c.ts - 1h, c.ts] lives in the
    click's bucket or the one before, so joining on bucket ∈ {b, b-1}
    (probe side exploded to 2 rows — a constant factor, not a blow-up)
    turns the plan into a shuffled hash join on the bucket key whose
    per-task pair space is one bucket's worth of events, not the whole
    table. The residual exact time predicate + rank run inside buckets.
    Bounded lookback is what makes as-of tractable at 100 TB — unbounded
    "most recent ever" needs state the size of history.
    """
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    bucket = lambda col: (F.unix_timestamp(col) / 3600).cast("long")  # noqa: E731
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select("event_id", "ts", bucket(F.col("ts")).alias("b"))
        .withColumn("probe_b", F.explode(F.array(F.col("b"), F.col("b") - 1)))
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        bucket(F.col("ts")).alias("view_b"),
    )
    pairs = clicks.join(views, F.col("probe_b") == F.col("view_b")).where(
        (F.col("view_ts") <= F.col("ts"))
        & (F.col("view_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("view_id") != F.col("event_id"))
    )
    w = Window.partitionBy("event_id").orderBy(F.desc("view_ts"), F.desc("view_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("event_id").alias("click_id"), "view_id", "view_ts")
    )


# ---------------------------------------------------------------------------
# Sliding + session windows, batch form (streaming twins in streaming/windows)
# ---------------------------------------------------------------------------


@REG.register(
    "stream_sliding_agg",
    oracle="""
    WITH starts AS (
      SELECT event_type,
             unnest([make_timestamp((epoch_us(ts) // 10800000000) * 10800000000),
                     make_timestamp((epoch_us(ts) // 10800000000) * 10800000000 - 10800000000)])
               AS window_start,
             ts
      FROM events)
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM starts
    WHERE ts >= window_start AND ts < window_start + INTERVAL 6 HOUR
    GROUP BY 1, 2
    """,
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (6h every 3h) per event type — each event lands in
    two windows. The oracle materializes the same window-start arithmetic
    relationally (epoch-aligned, UTC)."""
    ensure_utc(spark)
    from ..streaming.windows import sliding_hourly_by_type

    return sliding_hourly_by_type(load_table(spark, sf_dir, "events"))


@REG.register(
    "stream_session_agg",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM g)
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s
    GROUP BY user_id, sid
    """,
)
def stream_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user, batch form.

    The oracle is the classic gaps-and-islands SQL (lag → new-session flag →
    running sum → group), proving Spark's ``session_window`` semantics
    (end = last event + gap) against first principles.
    """
    ensure_utc(spark)
    from ..streaming.windows import session_windows_per_user

    return session_windows_per_user(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Pivot / unpivot / grouping sets
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@REG.register(
    "pivot_agg",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}" for t in _EVENT_TYPES)}
    FROM events
    GROUP BY user_id
    """,
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into count columns (explicit value list → one pass,
    no distinct-values pre-query; the oracle is the FILTER formulation)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return out.na.fill(0, subset=list(_EVENT_TYPES))


@REG.register(
    "unpivot_stack",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure, l_extendedprice AS value FROM lineitem
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot two measures into (measure, value) rows via ``stack`` —
    narrow map, no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(2, 'quantity', l_quantity, 'extendedprice', l_extendedprice) AS (measure, value)"
        ),
    )


@REG.register(
    "grouping_sets_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL API — distinct from rollup/cube)."""
    li = load_table(spark, sf_dir, "lineitem")
    return sql_over(
        spark,
        """
        SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
        FROM {lineitem}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
        lineitem=li,
    )


# ---------------------------------------------------------------------------
# Subqueries (Spark SQL surface)
# ---------------------------------------------------------------------------


@REG.register(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (planned as a broadcast one-row join)."""
    o = load_table(spark, sf_dir, "orders")
    return sql_over(
        spark,
        """
        SELECT o_orderkey, o_totalprice
        FROM {orders}
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM {orders})
        """,
        orders=o,
    )


@REG.register(
    "correlated_exists",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
    """,
)
def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (decorrelated by Catalyst into a semi join)."""
    return sql_over(
        spark,
        """
        SELECT p_partkey, p_name FROM {part} p
        WHERE EXISTS (SELECT 1 FROM {lineitem} l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
        """,
        part=load_table(spark, sf_dir, "part"),
        lineitem=load_table(spark, sf_dir, "lineitem"),
    )


# ---------------------------------------------------------------------------
# Scalar function batteries
# ---------------------------------------------------------------------------


@REG.register(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 8) AS name_prefix,
           CAST(length(p_type) AS INTEGER) AS type_len,
           CAST(strpos(p_type, 'a') AS INTEGER) AS first_a,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar battery: upper/substring/length/instr/lpad/LIKE —
    all JVM codegen, matching ANSI semantics (1-based instr, 0 = absent)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_type").alias("type_len"),
        F.instr(F.col("p_type"), "a").alias("first_a"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.when(F.col("p_name").like("%a%"), F.lit(1)).otherwise(F.lit(0)).alias("has_a"),
    )


@REG.register(
    "date_extract_parts",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(day(ts) AS INTEGER) AS d,
           CAST(hour(ts) AS INTEGER) AS h,
           ts + INTERVAL 7 DAY AS ts_plus_week
    FROM events
    """,
)
def date_extract_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp part extraction + interval arithmetic (UTC-pinned)."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        (F.col("ts") + F.expr("INTERVAL 7 DAY")).alias("ts_plus_week"),
    )


@REG.register(
    "case_when_bucketing",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'high' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1
    """,
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-based bucketing + aggregation (constant-folded, codegen'd)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50_000, "low")
        .when(F.col("o_totalprice") < 200_000, "mid")
        .otherwise("high")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@REG.register(
    "null_handling",
    oracle="""
    SELECT c.c_custkey,
           coalesce(CAST(o.o_orderkey AS BIGINT), -1) AS order_or_default,
           (o.o_orderkey IS NULL) AS has_no_order,
           nullif(c.c_mktsegment, 'BUILDING') AS segment_or_null
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics battery: outer-join nulls, coalesce, IS NULL, nullif."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce(F.col("o_orderkey"), F.lit(-1).cast("long")).alias("order_or_default"),
        F.col("o_orderkey").isNull().alias("has_no_order"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment_or_null"),
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join queries (join ordering / broadcast showcases)
# ---------------------------------------------------------------------------


@REG.register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered 3-way join → agg → top-10.

    Scale: filters push to all three scans before the joins; customer
    (post-filter) broadcasts under AQE; orders⋈lineitem shuffles on
    orderkey. Top-10 is TakeOrderedAndProject.
    """
    ensure_utc(spark)
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp"))
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@REG.register(
    "tpch_q5_local_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with small-dim broadcasts
    (nation/region/supplier) over the fact chain."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Window battery 2: first/last value, ntile
# ---------------------------------------------------------------------------


@REG.register(
    "window_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full frame for last_value
    (default frame ends at CURRENT ROW — a classic SQL gotcha, stated)."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )


@REG.register(
    "window_ntile",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
    FROM orders
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles over a deterministic global order. Global windows are
    acceptable only on bounded outputs; for corpus-scale quantile bucketing
    use approx quantile cutpoints + a map-side CASE (docs/SCALE.md)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select("o_orderkey", F.ntile(4).over(w).alias("quartile"))


# ---------------------------------------------------------------------------
# Statistical aggregates + arg-min/max
# ---------------------------------------------------------------------------


@REG.register(
    "stats_agg",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 6) AS sd,
           round(var_samp(value), 6) AS var,
           round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_uid,
           round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS covar_uid
    FROM events
    GROUP BY event_type
    """,
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate battery (stddev/variance/correlation/
    covariance) — single-pass, mergeable moment sketches; rounded to absorb
    summation-order ulps."""
    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("var"),
        F.round(F.corr(F.col("value"), uid), 6).alias("corr_uid"),
        F.round(F.covar_samp(F.col("value"), uid), 6).alias("covar_uid"),
    )


@REG.register(
    "minmax_by_agg",
    oracle="""
    SELECT user_id,
           arg_max(event_id, ts ORDER BY ts, event_id) AS latest_event,
           arg_min(event_id, ts ORDER BY ts, event_id) AS earliest_event
    FROM events
    GROUP BY user_id
    """,
)
def minmax_by_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax over a different column than the one returned)
    — the aggregation form of the reference's argmax loop (T5)."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.expr("max_by(event_id, struct(ts, event_id))").alias("latest_event"),
        F.expr("min_by(event_id, struct(ts, event_id))").alias("earliest_event"),
    )


@REG.register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate pushes
    to parquet, zero joins, one partial-agg shuffle of a single row."""
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@REG.register(
    "upsert_merge",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS o_totalprice,
             'U' AS o_orderstatus
      FROM orders WHERE o_orderkey % 10 = 0)
    SELECT b.o_orderkey,
           coalesce(u.o_totalprice, b.o_totalprice) AS o_totalprice,
           coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
           (u.o_orderkey IS NOT NULL) AS was_updated
    FROM orders b LEFT JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
)
def upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert emulation without a table format: base LEFT JOIN
    updates + coalesce per column. At 100 TB this is the pattern behind
    snapshot+delta compaction jobs (or use a lakehouse format's MERGE INTO;
    the join shape is identical). The update set is derived (every 10th
    order re-priced) so the operator is self-contained and oracled."""
    base = load_table(spark, sf_dir, "orders")
    updates = (
        base.where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 2).cast("double").alias("u_price"),
            F.lit("U").alias("u_status"),
        )
    )
    j = base.join(updates, "o_orderkey", "left")
    return j.select(
        "o_orderkey",
        F.coalesce("u_price", "o_totalprice").alias("o_totalprice"),
        F.coalesce("u_status", "o_orderstatus").alias("o_orderstatus"),
        F.col("u_price").isNotNull().alias("was_updated"),
    )


@REG.register(
    "merge_full_clauses",
    oracle="""
    WITH t AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
    src AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 3 THEN 'D' ELSE 'U' END AS op,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS new_price
      FROM orders WHERE o_orderkey % 7 = 3 OR o_orderkey % 10 = 0
      UNION ALL
      SELECT -(o_orderkey + 1), 'I', CAST(1.0 AS DOUBLE)
      FROM orders WHERE o_orderkey % 13 = 0),
    j AS (
      SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
             t.o_totalprice, t.o_orderstatus, s.op, s.new_price
      FROM t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey)
    SELECT o_orderkey,
           CASE WHEN op IN ('U', 'I') THEN new_price ELSE o_totalprice END
             AS o_totalprice,
           CASE WHEN op = 'U' THEN 'U' WHEN op = 'I' THEN 'I'
                ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN op = 'U' THEN 'updated' WHEN op = 'I' THEN 'inserted'
                ELSE 'kept' END AS action
    FROM j WHERE op IS NULL OR op <> 'D'
    """,
)
def merge_full_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse-style MERGE INTO with ALL THREE clauses — WHEN MATCHED
    AND cond THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED
    THEN INSERT — expressed as one full-outer join + per-row CASE, the
    exact physical shape Delta/Iceberg MERGE compiles to. Extends
    ``upsert_merge`` (update-only). Clause precedence is the MERGE rule:
    first matching clause wins (DELETE before UPDATE here).

    The change set is derived from the target so the operator is
    self-contained: every 7th-ish key (k%7==3) is deleted, every 10th
    updated (re-priced), and an insert batch arrives under fresh
    strictly-negative keys -(k+1) (guaranteed not-matched; plain -k would
    collide on orderkey 0). At 100 TB the join shuffles on the
    merge key exactly once, and AQE turns it into a broadcast join
    whenever the change set is small — snapshot+delta compaction in one
    Catalyst plan."""
    t = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    key = F.col("o_orderkey")
    upd_del = t.where((key % 7 == 3) | (key % 10 == 0)).select(
        "o_orderkey",
        F.when(key % 7 == 3, "D").otherwise("U").alias("op"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 2)
        .cast("double")
        .alias("new_price"),
    )
    ins = t.where(key % 13 == 0).select(
        (-(key + 1)).alias("o_orderkey"),  # strictly negative: key 0 exists in orders
        F.lit("I").alias("op"),
        F.lit(1.0).alias("new_price"),
    )
    src = upd_del.unionByName(ins)
    j = t.join(src, "o_orderkey", "full_outer")
    op = F.col("op")
    return j.where(op.isNull() | (op != "D")).select(
        "o_orderkey",
        F.when(op.isin("U", "I"), F.col("new_price"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(op == "U", F.lit("U"))
        .when(op == "I", F.lit("I"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(op == "U", F.lit("updated"))
        .when(op == "I", F.lit("inserted"))
        .otherwise(F.lit("kept"))
        .alias("action"),
    )


@REG.register(
    "window_percent_rank",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist over a deterministic total order (rounded:
    both engines compute (rank-1)/(n-1) in double)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@REG.register(
    "histogram_bins",
    oracle="""
    SELECT CAST(floor(value / 10) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(MIN(value), 6) AS bin_min,
           round(MAX(value), 6) AS bin_max
    FROM events
    GROUP BY 1
    """,
)
def histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor bucketing — the single-pass
    profiling shape (vs ntile's global sort)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.floor(F.col("value") / 10).alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("bin_min"),
        F.round(F.max("value"), 6).alias("bin_max"),
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@REG.register(
    "profile_numeric",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col,
               round(MIN({c}), 6) AS min_v,
               round(MAX({c}), 6) AS max_v,
               round(AVG({c}), 6) AS mean_v,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM lineitem"""
        for c in _PROFILE_COLS
    ),
)
def profile_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (ANALYZE-style): per-column min/max/mean/nulls/
    distinct in ONE scan via a struct-per-column aggregate, then unpivoted.
    The oracle's UNION ALL form scans once per column — at 100 TB the
    single-scan shape is the difference between 1 and N passes."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(
            F.struct(
                F.round(F.min(c), 6).alias("min_v"),
                F.round(F.max(c), 6).alias("max_v"),
                F.round(F.avg(c), 6).alias("mean_v"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
                F.countDistinct(c).alias("n_distinct"),
            ).alias(c)
        )
    one_row = li.agg(*aggs)
    stacked = one_row.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("col"), F.col(c).alias("m"))
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("e")
    )
    return stacked.select(
        F.col("e.col").alias("col"),
        F.col("e.m.min_v").alias("min_v"),
        F.col("e.m.max_v").alias("max_v"),
        F.col("e.m.mean_v").alias("mean_v"),
        F.col("e.m.n_null").alias("n_null"),
        F.col("e.m.n_distinct").alias("n_distinct"),
    )


@REG.register(
    "tpch_q12_shipmode",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def tpch_q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional CASE aggregation (priority
    classes counted in one pass)."""
    ensure_utc(spark)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@REG.register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, t.total_qty
    FROM orders o
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 150) t
      ON o.o_orderkey = t.l_orderkey
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate subquery with HAVING driving a semi-ish
    join (large-volume orders). The HAVING prunes before the join — at
    100 TB the aggregate side shrinks to the qualifying keys only."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_totalprice", "total_qty"
    )


@REG.register(
    "table_diff_snapshot",
    oracle="""
    WITH b_core AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 3 THEN text || ' [v2]' ELSE text END AS text,
             lang, source, n_chars
      FROM documents WHERE doc_id % 10 <> 7),
    b_added AS (
      SELECT doc_id + 1000000000 AS doc_id, text, lang, source, n_chars
      FROM documents WHERE doc_id % 10 = 1),
    b AS (SELECT * FROM b_core UNION ALL SELECT * FROM b_added)
    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN (a.text IS DISTINCT FROM b.text)
                     OR (a.lang IS DISTINCT FROM b.lang)
                     OR (a.source IS DISTINCT FROM b.source)
                     OR (a.n_chars IS DISTINCT FROM b.n_chars)
                THEN 'changed' ELSE 'unchanged' END AS status
    FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    """,
)
def table_diff_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT DIFF — the dataset-versioning primitive a corpus pipeline
    runs between two builds of the same table: one co-partitioned FULL
    OUTER join on the key, then a per-column null-safe compare classifies
    every id as added / removed / changed / unchanged. No engine-specific
    row hash (xxhash64 vs DuckDB's hash would never agree): the compare
    is explicit IS-DISTINCT-FROM per column, portable and null-correct.
    Snapshot B is derived deterministically so the key is self-contained
    and oracled (every id%10==7 doc removed, ==3 text-amended, ==1
    duplicated at id+1e9 as an add). At 100 TB both snapshots bucket or
    repartition by the key → sort-merge join with map-side column
    compares, no shuffle beyond the two key exchanges and no full-row
    driver traffic; the (doc_id, status) output feeds the incremental
    stages (e.g. `incremental_dedup_minhash` takes the 'added' slice)."""
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    docs = load_table(spark, sf_dir, "documents").select(*cols)
    amended = F.when(
        F.col("doc_id") % 10 == 3, F.concat(F.col("text"), F.lit(" [v2]"))
    ).otherwise(F.col("text"))
    b_core = docs.where(F.col("doc_id") % 10 != 7).select(
        "doc_id", amended.alias("text"), "lang", "source", "n_chars"
    )
    b_added = docs.where(F.col("doc_id") % 10 == 1).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    b = b_core.unionByName(b_added)
    a, bb = docs.alias("a"), b.alias("b")
    j = a.join(bb, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
    col_changed = None
    for c in cols[1:]:
        diff = ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        col_changed = diff if col_changed is None else (col_changed | diff)
    return j.select(
        F.coalesce(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id"),
        F.when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(col_changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
