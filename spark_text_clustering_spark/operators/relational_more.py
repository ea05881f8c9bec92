"""Relational surface, part 3: null-aware anti join, exact quantiles,
regression/bitwise aggregate batteries, ordered string aggregation,
interval RANGE window frames, time-series gap-fill with forward fill,
and multi-granularity time rollups.

None of this exists in the reference (SURVEY §2.5 "not present" list);
it rounds out the engine so a reference user gets the full SQL surface
plus the time-series ops a 100 TB event pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table
from ..session import ensure_utc
from ..sqlview import sql_over

REG = Registry()


@REG.register(
    "anti_join_null_aware",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey NOT IN (SELECT NULLIF(c_custkey, -1) FROM customer
                            WHERE c_acctbal < 1000)
    """,
)
def anti_join_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a nullable subquery — SQL's three-valued NOT IN forces
    a null-aware anti join (NAAJ), a different physical operator than the
    left_anti equi-join (`join_anti` key): one NULL in the build side
    empties the result, so the build side must be broadcast whole. The
    NULLIF keeps the column nullable (plan-level NAAJ) while producing no
    runtime NULLs, so the output stays non-trivial."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return sql_over(
        spark,
        """
        SELECT o_orderkey, o_custkey FROM {orders}
        WHERE o_custkey NOT IN (SELECT NULLIF(c_custkey, -1) FROM {customer}
                                WHERE c_acctbal < 1000)
        """,
        orders=o,
        customer=c,
    )


@REG.register(
    "median_quantile_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(median(l_quantity), 4) AS med_qty,
           ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS med_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def median_quantile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / continuous quantiles per group (vs the sketch-based
    `percentile_approx` key). Exact percentile sorts within each group —
    at 100 TB reserve it for bounded-cardinality groups and use the
    t-digest approx elsewhere; rounded to 4dp to absorb interpolation
    ulps across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("med_price"),
    )


@REG.register(
    "regr_linear_agg",
    oracle="""
    SELECT ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    """,
)
def regr_linear_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression aggregates (slope/intercept/r²) — single-pass
    mergeable moment sketches, so they scale like any hash aggregate;
    rounded to absorb summation-order ulps between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).cast("long").alias("n"),
    )


@REG.register(
    "bitwise_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(bit_and(o_orderkey) AS BIGINT) AS band,
           CAST(bit_or(o_orderkey) AS BIGINT) AS bor,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS bxor
    FROM orders GROUP BY o_orderpriority
    """,
)
def bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates — commutative+associative, so they
    map-side combine perfectly (the building block for bitmap-style
    presence masks over partitioned keys)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bit_and("o_orderkey").cast("long").alias("band"),
        F.bit_or("o_orderkey").cast("long").alias("bor"),
        F.bit_xor("o_orderkey").cast("long").alias("bxor"),
    )


@REG.register(
    "listagg_ordered",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, '|' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG ... WITHIN GROUP). Expressed as
    array_sort ∘ collect_list ∘ array_join — the Spark-native form with
    deterministic output regardless of row arrival order. At scale the
    concatenated string is unbounded per key: cap with slice() before the
    join when keys are hot."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations")
    )


@REG.register(
    "window_range_interval",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trailing_30d_spend
    FROM orders
    """,
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed by time value, not row position: trailing-30-day
    spend per customer. Unlike the ROWS frames (`window_running_sum`),
    RANGE bounds are data-driven — the frame widens and narrows with
    order density. Decimal sums keep both engines bit-identical."""
    ensure_utc(spark)
    o = load_table(spark, sf_dir, "orders")
    return sql_over(
        spark,
        """
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                          RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS trailing_30d_spend
        FROM {orders}
        """,
        orders=o,
    )


@REG.register(
    "gap_fill_forward",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM events WHERE user_id < 20 GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events WHERE user_id < 20 GROUP BY 1, 2)
    SELECT g.user_id, g.hour,
           last_value(h.v IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
    FROM grid g LEFT JOIN hourly h
      ON g.user_id = h.user_id AND g.hour = h.hour
    """,
)
def gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: build each user's dense hourly grid
    (sequence + explode — no driver loop), left-join the sparse hourly
    sums, forward-fill with last(ignorenulls) over an ordered frame.
    The timeseries-DB `locf(time_bucket_gapfill(...))` operator in pure
    DataFrame form. Scale: grid size = span×keys, generated distributed;
    the join and window both ride the user_id partitioning — one
    shuffle total."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"))
    grid = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .withColumn("v_ff", F.last("v", ignorenulls=True).over(w))
        .select("user_id", "hour", "v_ff")
    )


@REG.register(
    "rollup_time_multigrain",
    oracle="""
    SELECT 'day' AS grain, date_trunc('day', ts) AS bucket, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'week', date_trunc('week', ts), event_type,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'month', date_trunc('month', ts), event_type,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
    FROM events GROUP BY 2, 3
    """,
)
def rollup_time_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the same measure at
    day/week/month grains in one result. Built hierarchically — the day
    aggregate is computed once and the coarser grains re-aggregate FROM
    the day level, so the raw table is scanned exactly once (at 100 TB
    the day→week/month re-agg touches ~1/1000th of the data; this is the
    materialized-rollup maintenance pattern)."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    day = ev.groupBy(
        F.date_trunc("day", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("_dec_total"),
    )
    day.cache()

    def _grain(df: DataFrame, name: str, trunc: str | None) -> DataFrame:
        if trunc is None:
            g = df
        else:
            g = df.groupBy(
                F.date_trunc(trunc, "bucket").alias("bucket"), "event_type"
            ).agg(F.sum("n").alias("n"), F.sum("_dec_total").alias("_dec_total"))
        return g.select(
            F.lit(name).alias("grain"),
            "bucket",
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("_dec_total").cast("double").alias("total"),
        )

    return (
        _grain(day, "day", None)
        .unionByName(_grain(day, "week", "week"))
        .unionByName(_grain(day, "month", "month"))
    )


@REG.register(
    "set_union_by_name_missing",
    oracle="""
    SELECT id, kind, price, amount FROM (
      SELECT o_orderkey AS id, 'order' AS kind, o_totalprice AS price
      FROM orders WHERE o_orderkey < 100
      UNION ALL BY NAME
      SELECT event_id AS id, 'event' AS kind, value AS amount
      FROM events WHERE event_id < 100)
    """,
)
def set_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two relations with partially disjoint
    columns unioned by NAME (not position), absent columns NULL-filled —
    `unionByName(allowMissingColumns=True)`, the append pattern when a
    100 TB table's schema grows over time. Both branches' filters still
    push to their own scans."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 100)
        .select(
            F.col("o_orderkey").alias("id"),
            F.lit("order").alias("kind"),
            F.col("o_totalprice").alias("price"),
        )
    )
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") < 100)
        .select(
            F.col("event_id").alias("id"),
            F.lit("event").alias("kind"),
            F.col("value").alias("amount"),
        )
    )
    return o.unionByName(e, allowMissingColumns=True)


@REG.register(
    "hll_sketch_build_merge",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
      FROM documents)
    SELECT lang, CAST(COUNT(DISTINCT token) AS BIGINT) AS exact_distinct,
           TRUE AS within_5pct
    FROM tok GROUP BY lang
    UNION ALL
    SELECT '__all__' AS lang, CAST(COUNT(DISTINCT token) AS BIGINT), TRUE
    FROM tok
    """,
)
def hll_sketch_build_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct-count sketches (DataSketches): build one
    sketch per language partition (`hll_sketch_agg`), then union them
    (`hll_union_agg`) into the corpus-wide estimate — the two-level
    pattern that lets 100 TB distinct counts pre-aggregate per
    partition/day and merge later without rescanning. Sketch estimates
    are engine-specific, so the hashable contract mirrors
    approx_count_distinct: exact counts + a Spark-computed ``within_5pct``
    flag on the sketch estimate (merged-union estimate for the
    ``__all__`` row); the oracle recomputes exact and asserts TRUE."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
    )
    per_lang = tokens.groupBy("lang").agg(
        F.hll_sketch_agg("token").alias("sketch"),
        F.count_distinct("token").cast("long").alias("exact_distinct"),
    )
    global_exact = tokens.agg(
        F.count_distinct("token").cast("long").alias("exact_distinct")
    )
    within = lambda est, exact: (  # noqa: E731
        F.abs(est - exact) <= 0.05 * exact
    ).alias("within_5pct")
    per_lang_out = per_lang.select(
        "lang",
        "exact_distinct",
        within(
            F.hll_sketch_estimate("sketch").cast("long"), F.col("exact_distinct")
        ),
    )
    merged_est = per_lang.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("long").alias("est")
    )
    all_row = merged_est.crossJoin(F.broadcast(global_exact)).select(
        F.lit("__all__").alias("lang"),
        "exact_distinct",
        within(F.col("est"), F.col("exact_distinct")),
    )
    return per_lang_out.unionByName(all_row)


@REG.register(
    "percentile_disc_group",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.5) AS p50,
           quantile_disc(l_quantity, 0.9) AS p90,
           quantile_disc(l_quantity, 0.99) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_disc_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (PERCENTILE_DISC WITHIN GROUP) — returns an
    actual data value, never an interpolation, so cross-engine results
    are exact with no rounding guard (contrast `median_quantile_agg`).
    The p50/p90/p99 latency-style battery every observability pipeline
    runs."""
    li = load_table(spark, sf_dir, "lineitem")
    return sql_over(
        spark,
        """
        SELECT l_returnflag,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY l_quantity) AS p99
        FROM {lineitem} GROUP BY l_returnflag
        """,
        lineitem=li,
    )


@REG.register(
    "mode_deterministic",
    oracle="""
    SELECT event_type, value AS mode_value, CAST(n AS BIGINT) AS n FROM (
      SELECT event_type, value, COUNT(*) AS n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY COUNT(*) DESC, value) AS rn
      FROM events GROUP BY event_type, value)
    WHERE rn = 1
    """,
)
def mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value, ties broken by value) —
    built-in mode() is tie-nondeterministic in both engines, so the
    engine exposes the count + windowed-rank form instead: two map-side-
    combined aggregations, no tie ambiguity, same plan family as top-k
    per group."""
    ev = load_table(spark, sf_dir, "events")
    counted = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), "value")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("value").alias("mode_value"),
            F.col("n").cast("long").alias("n"),
        )
    )


@REG.register(
    "freq_items_sketch",
    oracle="""
    WITH tot AS (SELECT COUNT(*) AS n FROM events),
    cnt AS (
      SELECT 'event_type' AS col, CAST(event_type AS VARCHAR) AS value,
             CAST(COUNT(*) AS BIGINT) AS n_occur
      FROM events WHERE event_type IS NOT NULL GROUP BY event_type
      UNION ALL
      SELECT 'user_id', CAST(user_id AS VARCHAR), CAST(COUNT(*) AS BIGINT)
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
    -- NULL policy stated explicitly (ADVICE r13): the engine's
    -- freqItems candidates and isin() verify both drop NULL values, so
    -- the oracle must too — a NULL group surviving GROUP BY would
    -- silently diverge on a future data-gen change.
    SELECT col, value, n_occur FROM cnt, tot WHERE 10 * n_occur > n
    """,
)
def freq_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT >10%-frequency items per column via the freqItems sketch →
    candidate → exact-verify pipeline (same pattern as
    ``heavy_hitters_cms``, sketches.py — promoted from rows-only to
    oracled in round 13 per VERDICT r12 #4).

    Pass 1: ``DataFrame.stat.freqItems`` (Karp-Papadimitriou-Shenker
    single-pass sketch, fixed <= 1/support counters per partition,
    merged associatively — no raw-data shuffle) yields a candidate
    SUPERSET: every value with frequency > support is guaranteed
    present; false positives are allowed. Pass 2 verifies exactly:
    re-scan filtered to the driver-sized candidate IN-list (<= 10
    values per column at support 0.1), groupBy-count the survivors,
    keep 10*count > total (integer math, no float threshold drift vs
    the oracle). The verify shuffle therefore carries only
    candidate-key rows — at 100 TB that is a few dozen groups, not the
    full value space, while the output is exact and plain-SQL-checkable.
    """
    ev = load_table(spark, sf_dir, "events")
    raw = ev.stat.freqItems(["event_type", "user_id"], 0.1).collect()[0]
    cand_type = list(raw["event_type_freqItems"])  # <= 10 values each:
    cand_user = list(raw["user_id_freqItems"])  # driver-sized by design
    total = ev.count()
    per_col = []
    for col, cands in (("event_type", cand_type), ("user_id", cand_user)):
        if not cands:
            continue
        per_col.append(
            ev.where(F.col(col).isin(cands))
            .groupBy(F.col(col).cast("string").alias("value"))
            .agg(F.count(F.lit(1)).alias("n_occur"))
            .where(F.lit(10) * F.col("n_occur") > F.lit(total))
            .select(F.lit(col).alias("col"), "value", "n_occur")
        )
    if not per_col:
        return spark.createDataFrame([], "col string, value string, n_occur long")
    out = per_col[0]
    for df in per_col[1:]:
        out = out.unionAll(df)
    return out


@REG.register(
    "sessionize_gap",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR date_diff('microsecond', LAG(ts) OVER w, ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged)
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS BIGINT) AS span_us,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sess GROUP BY 1, 2
    """,
)
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a new session starts when a user's gap to
    the previous event exceeds 30 minutes (lag + flag + running sum —
    the classic three-step), then per-session rollup (events, span,
    spend). The batch twin of `stream_session_agg`'s session_window,
    usable retroactively over the full history. Integer microsecond
    math end to end — no float drift vs the oracle. Scale: the lag
    window, the running sum, and the (user_id, session_no) aggregate
    all ride ONE hash partitioning on user_id; Catalyst plans a single
    Exchange, and per-user state is two longs. Skewed power users
    sessionize independently of everyone else."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 1_800_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn("session_no", F.sum("new_sess").over(run))
    return sess.groupBy("user_id", F.col("session_no").cast("long").alias("session_no")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).cast("long").alias("span_us"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


_GROUP_BY_ALL_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM {lineitem}
GROUP BY ALL
ORDER BY ALL
"""


@REG.register(
    "sql_group_order_by_all",
    oracle=_GROUP_BY_ALL_SQL.format(lineitem="lineitem"),
)
def sql_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL surface parity (round 6): GROUP BY ALL / ORDER BY ALL —
    the analyst-ergonomics clauses both Spark 4 and DuckDB resolve to
    "every non-aggregate select item". The SAME SQL text runs in both
    engines (the oracle IS the query), so this key also guards against
    the two engines diverging on the ALL-resolution rules. Plans
    identically to an explicit GROUP BY — one partial/final hash
    aggregate — so there is nothing scale-new here; the point is surface
    coverage."""
    return sql_over(
        spark, _GROUP_BY_ALL_SQL, lineitem=load_table(spark, sf_dir, "lineitem")
    )


@REG.register(
    "sessionize_paths_topk",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR date_diff('microsecond', LAG(ts) OVER w, ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged),
    paths AS (
      SELECT user_id, session_no,
             array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>') AS path
      FROM sess GROUP BY user_id, session_no),
    cnt AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
            FROM paths GROUP BY path)
    SELECT path, n_sessions FROM cnt
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def sessionize_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION PATH MINING — the navigation-sequence rollup on top of
    `sessionize_gap`'s session assignment: per session, the ordered
    sequence of event types truncated to the first 5 steps joins into a
    '>'-path string, and the top-20 most common paths come back — the
    "what do users actually do" query behind funnel design, and the
    sequence-mining shape (ordered collect → prefix slice → frequency)
    no other key exercises. Ordering inside a session is total
    (ts, event_id), so the path strings are deterministic on both
    engines. Scale: session assignment rides ONE hash partitioning on
    user_id (lag + running sum, as in sessionize_gap); the per-session
    collect is bounded by session length (gap-capped), the path
    frequency count is an ordinary map-side-combinable agg on a short
    string key, and top-20 is a TakeOrdered — no global sort of the
    session frame."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > 1_800_000_000
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn("session_no", F.sum("new_sess").over(run))
    paths = (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.array_join(
                F.slice(
                    F.transform(F.col("evs"), lambda s: s["event_type"]), 1, 5
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


@REG.register(
    "winsorize_clip_group",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             quantile_disc(l_quantity, 0.05) AS lo,
             quantile_disc(l_quantity, 0.95) AS hi
      FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN l.l_quantity < b.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN l.l_quantity > b.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           CAST(SUM(CAST(LEAST(GREATEST(l.l_quantity, b.lo), b.hi)
                         AS DECIMAL(18,2))) AS DOUBLE) AS clipped_sum
    FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def winsorize_clip_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group WINSORIZATION — the outlier treatment a feature-prep
    pipeline applies before scaling: values clip to the group's
    [p05, p95] band. Bounds use percentile_disc (actual data values,
    never an interpolation — the cross-engine-exact choice, cf.
    `percentile_disc_group`); the clipped sum aggregates in DECIMAL so
    the two engines' addition orders cannot diverge. Two passes over
    the fact in exchange for exact bounds: one grouped percentile agg
    (group-sized output, broadcast back) + one clip-and-aggregate pass
    riding a broadcast hash join — no row-level shuffle beyond the
    final group agg; the approximate-bounds variant at 100 TB swaps
    pass one for percentile_approx on the same plan. Output per group:
    (n, n_clipped_low, n_clipped_high, clipped_sum)."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = sql_over(
        spark,
        """
        SELECT l_returnflag AS rf,
               percentile_disc(0.05) WITHIN GROUP (ORDER BY l_quantity) AS lo,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY l_quantity) AS hi
        FROM {lineitem} GROUP BY l_returnflag
        """,
        lineitem=li,
    )
    j = li.join(F.broadcast(bounds), li["l_returnflag"] == bounds["rf"])
    clipped = F.least(F.greatest(F.col("l_quantity"), F.col("lo")), F.col("hi"))
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_quantity") < F.col("lo"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("l_quantity") > F.col("hi"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_high"),
        F.sum(clipped.cast("decimal(18,2)")).cast("double").alias("clipped_sum"),
    )
