"""Relational operator surface: scans, projections, filters, aggregations,
joins, set ops, windows, rollup/cube, approximate/date/JSON functions.

The reference implements none of this relationally (SURVEY §2.5: its only
"joins" are driver-side map lookups), but the rebuild's north star requires
the full surface. Everything here is built-in Catalyst — whole-stage
codegen, AQE, predicate pushdown, partition pruning all apply for free.

Numeric-determinism convention: money-magnitude double sums go through
``DECIMAL(18,2)`` so both Spark and the DuckDB oracle compute *exact*
arithmetic and then cast the identical exact value to double — this makes
the order-insensitive value hash stable regardless of partitioning/merge
order, which is also the behavior you want at 100 TB (no run-to-run drift).

Scale notes per operator are inline; the common themes:
* small dims (region/nation/supplier, derived vocab) → ``F.broadcast``;
* big⋈big (orders⋈lineitem) → shuffle hash/sort-merge on the join key with
  AQE skew splitting;
* aggregations rely on partial (map-side) aggregation before the shuffle;
* top-k is ``orderBy().limit(k)`` → ``TakeOrderedAndProject`` (never a full
  global sort);
* nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table
from ..session import ensure_utc
from ..sqlview import sql_over

REG = Registry()


def _dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Scans / projections / filters (SURVEY §2.1 S1, §2.2 P1, P8)
# ---------------------------------------------------------------------------


@REG.register(
    "scan_documents",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE n_chars > 0
    """,
)
def scan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with projection + pushed filter.

    Reference: whole-file corpus scan ``sc.wholeTextFiles``
    (LDAClustering.scala:113) — no pruning possible there. Here the parquet
    scan prunes to 4 columns and pushes ``n_chars > 0`` (visible as
    PushedFilters in .explain). At 100 TB this is the difference between
    reading 100 TB and reading the referenced columns only.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(F.col("n_chars") > 0).select("doc_id", "lang", "source", "n_chars")


@REG.register(
    "project_columns",
    oracle="""
    SELECT o_orderkey,
           o_totalprice,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 11 / 10 AS DOUBLE) AS price_with_fee
    FROM orders
    """,
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure projection with a computed column (reference P1: ``.map(_._2)``).

    Exact decimal arithmetic (×11/10) so Spark and the oracle agree bitwise.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_totalprice",
        (_dec("o_totalprice") * F.lit(11) / F.lit(10)).cast("double").alias("price_with_fee"),
    )


@REG.register(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive filter, pushed to the scan (reference P8:
    ``.filter(_._2.length > 0)``, LDAClustering.scala:139)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@REG.register(
    "string_split_join",
    oracle="""
    SELECT p_partkey,
           CAST(len(string_split(p_type, ' ')) AS INTEGER) AS n_words,
           string_split(p_type, ' ')[1] AS first_word,
           array_to_string(string_split(p_type, ' '), '_') AS type_joined
    FROM part
    """,
)
def string_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split/join scalar round-trip (reference P9: vocab ``mkString(",")`` /
    ``split(",")``, LDAClustering.scala:72, LDALoader.scala:43).

    Output is all-scalar by design: the intermediate array is exercised via
    size / element access / concat_ws rather than returned raw — external
    comparison harnesses (pandas-based canonicalizers) can't hash list
    cells, so every registered query keeps an atomic output schema (see
    tests/test_registry_schemas.py).
    """
    part = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    return part.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        words.getItem(0).alias("first_word"),
        F.concat_ws("_", words).alias("type_joined"),
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.3)
# ---------------------------------------------------------------------------


@REG.register(
    "sum_agg",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           SUM(l_quantity) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    """,
)
def sum_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sums (reference A2, LDAClustering.scala:150,197).

    Partial aggregation means one row crosses the shuffle per partition —
    constant network cost at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@REG.register("count_rows", oracle="SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem")
def count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-size count (reference A3: ``corpus.count()``,
    LDAClustering.scala:24)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@REG.register(
    "groupby_two_keys",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_two_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped two-key aggregation (reference A4's relational
    analogue, SURVEY §2.3). Low-cardinality keys → partial agg collapses
    nearly everything map-side; the shuffle moves ~|keys| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@REG.register(
    "groupby_count_collect",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           string_agg(source, ',' ORDER BY source) AS sources
    FROM documents
    GROUP BY lang
    """,
)
def groupby_count_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped count + collect_list (reference A5: books-per-topic driver
    arrays, LDALoader.scala:76-77,142-149 — rebuilt as a real aggregation).
    ``sort_array`` makes the collected list order-deterministic, and
    ``array_join`` serializes it to an atomic string column so external
    hashers can canonicalize the output (see tests/test_registry_schemas.py).
    Scale: collect_list per group is bounded by group size — fine for
    report-shaped outputs, not for unbounded groups."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(F.sort_array(F.collect_list("source")), ",").alias("sources"),
    )


@REG.register(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (reference A6, implicit via reduceByKey key-set,
    LDAClustering.scala:146). Planned as partial-dedup → shuffle → dedup."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.9 gap list — the reference has no shuffle joins at all)
# ---------------------------------------------------------------------------


@REG.register(
    "join_inner_shuffle",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_inner_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big⋈big equi-join → aggregation.

    Scale: both sides shuffle on orderkey (sort-merge or shuffled-hash by
    cost); AQE splits skewed keys. At 100 TB you'd bucket both tables on
    orderkey at write time to elide this shuffle entirely — see
    docs/SCALE.md.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
    )


@REG.register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@REG.register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one finished order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@REG.register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders. Same shape the
    rebuild uses for OOV-term detection (SURVEY §2.5 J2)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@REG.register(
    "join_range_theta",
    oracle="""
    SELECT a.event_id AS click_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases_within_1h
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    GROUP BY a.event_id
    """,
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta self-join on time proximity (equi on user_id + band on ts).

    Scale: the equi key (user_id) carries the shuffle; the time band is a
    post-shuffle filter, so cost is sum over users of |clicks|×|purchases|
    within a user — bounded, not a cross join. For band-only joins with no
    equi key, bucketize ts into interval-width buckets and join on bucket±1
    (see docs/SCALE.md).
    """
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    return (
        a.where(F.col("a.event_type") == "click")
        .join(
            b.where(F.col("b.event_type") == "purchase"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("a.event_id").alias("click_id"))
        .agg(F.count(F.lit(1)).alias("n_purchases_within_1h"))
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@REG.register(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — no shuffle at all (pure concatenation of partitions)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s)


@REG.register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — planned as an aggregate + semi join."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@REG.register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — planned as an aggregate + anti join.

    Note: ``subtract`` is EXCEPT DISTINCT; ``exceptAll().distinct()`` would
    be wrong (multiset difference keeps keys the left side has more copies
    of, even when the right side contains them).
    """
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@REG.register(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             CAST(rank() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
      FROM orders)
    WHERE rnk <= 10
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by price within each priority class via rank().

    Scale: one shuffle on the partition key; Spark pushes a per-partition
    top-k limit (WindowGroupLimit) before the full sort when a rank filter
    is present.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
        )
        .where(F.col("rnk") <= 10)
    )


@REG.register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event timelines (deterministic order via
    (ts, event_id))."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@REG.register(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend with an explicit ROWS frame.

    Decimal accumulation keeps the running sum exact (identical in any
    evaluation order — Spark's running aggregate vs DuckDB's segment tree).
    """
    ensure_utc(spark)
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------


@REG.register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — subtotal + grand-total rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows")
    )


@REG.register(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — all grouping-set combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows")
    )


# ---------------------------------------------------------------------------
# Approximate aggregates
# ---------------------------------------------------------------------------


@REG.register(
    "approx_count_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate per event type.

    HLL estimates differ engine-to-engine, so the hashable contract is:
    emit the EXACT distinct count plus a Spark-computed ``within_5pct``
    flag comparing the HLL estimate against it; the oracle recomputes the
    exact count and asserts TRUE. The HLL path is fully exercised while
    the output stays deterministic. At 100 TB HLL is THE way to count
    distincts — exact distinct is a full shuffle of the key universe,
    HLL sketches merge in constant space (the exact column here exists
    for verification, not for the production plan).
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_5pct"),
    )


@REG.register(
    "percentile_approx",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles per return flag.

    Spark's exact ``percentile`` matches DuckDB's ``quantile_cont``
    (continuous interpolation); the approximate KLL/GK path
    (``percentile_approx``) is exercised rows-only in unit tests. At scale
    prefer ``percentile_approx`` — mergeable sketch, single pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5D)").alias("median_qty"),
        F.expr("percentile(l_extendedprice, 0.9D)").alias("p90_price"),
    )


# ---------------------------------------------------------------------------
# Date/time + JSON scalar functions
# ---------------------------------------------------------------------------


@REG.register(
    "date_trunc_agg",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           SUM(value) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def date_trunc_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts via date_trunc (UTC-pinned so both engines bucket
    identically)."""
    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


@REG.register(
    "json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the string props column
    (``get_json_object`` — JVM-side, codegen'd)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@REG.register(
    "variant_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json once into a
    VariantType column, then variant_get typed extraction — the
    shredded-storage answer to schema-on-read JSON. Versus per-access
    get_json_object re-parsing (the json_extract key), a VARIANT column
    parses once and serves many extractions; at 100 TB the parse cost is
    paid at ingest and the binary encoding scans ~3-10x faster than raw
    JSON strings. Filter + aggregate run on the extracted long."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("pv")
    ).select(
        "event_type", F.variant_get("pv", "$.k", "long").alias("k")
    )
    return (
        v.where(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


@REG.register(
    "sql_udf_scalar_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sql_udf_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDF (Spark 4 CREATE FUNCTION ... RETURN expr):
    the function body is pure SQL, so Catalyst INLINES it into the plan —
    unlike Python UDFs there is no serialization boundary, and the
    aggregate below it still gets map-side combine and codegen. The
    decimal return type keeps the money sum exact (same discipline as the
    TPC-H battery)."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DECIMAL(24,4)
        RETURN CAST(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))
                    AS DECIMAL(24,4))
        """
    )
    return sql_over(
        spark,
        """
        SELECT l_returnflag,
               CAST(SUM(disc_price(l_extendedprice, l_discount)) AS DOUBLE)
                 AS revenue
        FROM {lineitem}
        GROUP BY l_returnflag
        """,
        lineitem=load_table(spark, sf_dir, "lineitem"),
    )


@REG.register(
    "sql_table_function_buckets",
    oracle="""
    WITH buckets AS (
      SELECT unnest(generate_series(1, 10)) AS bucket)
    SELECT b.bucket, CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines
    FROM buckets b
    LEFT JOIN lineitem l
      ON CAST(ceil(l.l_quantity / 5.0) AS INTEGER) = b.bucket
    GROUP BY b.bucket
    """,
)
def sql_table_function_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined TABLE function (CREATE FUNCTION ... RETURNS TABLE) used
    as a relation in FROM — a catalog-registered generator the optimizer
    sees as a plain subquery (here: a 10-row bucket dimension that
    broadcast-joins against quantity buckets, preserving empty buckets
    via LEFT JOIN). The SQL-body TVF inlines; contrast with the Python
    UDTF key (udtf_sentence_split), which crosses the Arrow boundary."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION qty_buckets(n INT)
        RETURNS TABLE(bucket INT)
        RETURN SELECT explode(sequence(1, n))
        """
    )
    return sql_over(
        spark,
        """
        SELECT b.bucket, COUNT(l.l_orderkey) AS n_lines
        FROM qty_buckets(10) b
        LEFT JOIN {lineitem} l
          ON CAST(ceil(l.l_quantity / 5.0) AS INT) = b.bucket
        GROUP BY b.bucket
        """,
        lineitem=load_table(spark, sf_dir, "lineitem"),
    ).select("bucket", F.col("n_lines").cast("long").alias("n_lines"))


@REG.register(
    "xml_parse_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def xml_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (Spark 4 from_xml): serialize each event to an
    XML fragment, then parse it back with a typed schema and aggregate
    from the PARSED struct only — a round-trip that proves the XML path
    end-to-end (concat serialization, from_xml schema projection, struct
    field access) while the oracle recomputes from the original columns.
    Parsing is JVM-side (no Python); at 100 TB XML decode cost is
    per-row but pipelined inside the scan stage with zero extra
    exchanges beyond the final agg."""
    ev = load_table(spark, sf_dir, "events")
    # coalesce: a missing '$.k' must yield an empty <k/> element, not
    # null-propagate through concat and erase the row's event_type
    xml = F.concat(
        F.lit("<event><type>"),
        F.col("event_type"),
        F.lit("</type><k>"),
        F.coalesce(F.get_json_object("props", "$.k"), F.lit("")),
        F.lit("</k></event>"),
    )
    parsed = ev.select(
        F.from_xml(xml, "type string, k long").alias("x")
    )
    return (
        parsed.groupBy(F.col("x.type").alias("event_type"))
        .agg(F.sum("x.k").cast("long").alias("sum_k"))
    )


@REG.register(
    "lateral_topn_per_key",
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 3) t
    """,
)
def lateral_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table with ORDER BY + LIMIT — top-3
    customers per nation expressed as a per-row subquery instead of the
    window-rank form (topk_per_group). Catalyst decorrelates the lateral
    into a join + per-key group limit, so the plan converges with the
    window version — the declarative surface differs, the physical plan
    should not. The Spark side also exercises parameterized spark.sql
    (named :k binding, no string splicing)."""
    return sql_over(
        spark,
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM {nation} n, LATERAL (
          SELECT c_name, c_acctbal FROM {customer} c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT :k) t
        """,
        sql_args={"k": 3},
        nation=load_table(spark, sf_dir, "nation"),
        customer=load_table(spark, sf_dir, "customer"),
    )
