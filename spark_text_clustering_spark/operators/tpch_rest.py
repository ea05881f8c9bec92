"""TPC-H-shaped query battery, part 3 (Q2/Q7/Q8/Q9/Q11/Q13/Q15/Q17/Q20).

Completes the 22-query TPC-H skeleton set on the driver's TPC-H-ish
testdata (none exist in the reference — SURVEY §2.5: it has no joins or
SQL at all). Schema adaptations, with the plan skeleton preserved:

- no ``partsupp`` table → ``lineitem`` is the part↔supplier relation;
  "supply cost" = MIN(l_extendedprice) per (part, supplier) (Q2), value =
  extendedprice sums (Q11), availqty = shipped quantity (Q20);
- no ``p_mfgr``/``p_container`` → ``p_brand``/``p_type`` filters;
- nation names are NATION_0..NATION_24, regions are the 5 TPC-H regions.

Money arithmetic goes through DECIMAL(18,2) exactly as in tpch_more.py so
Spark and DuckDB agree bit-for-bit; quantity sums/averages stay double —
quantities are integer-valued, so double summation is exact in any order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table
from ..session import ensure_utc

REG = Registry()

_DEC = "decimal(18,2)"


def _dec(c: str) -> F.Column:
    return F.col(c).cast(_DEC)


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


@REG.register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey, p.p_brand,
           CAST(c.supplycost AS DOUBLE) AS supplycost
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN eu ON eu.s_suppkey = c.l_suppkey
    WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
      AND c.supplycost = (SELECT MIN(c2.supplycost)
                          FROM cost c2 JOIN eu e2 ON e2.s_suppkey = c2.l_suppkey
                          WHERE c2.l_partkey = p.p_partkey)
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest regional supplier per part — a correlated
    MIN subquery decorrelated into an aggregate + self-join on the exact
    min value. At 100 TB the cost relation groups on (part, supp) once,
    the per-part min is a second partial agg on the same shuffle key
    prefix, and supplier/nation/region broadcast; the double MIN is exact
    so the equality join is safe (no epsilon needed)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supplycost")
    )
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_cost = cost.join(F.broadcast(eu), cost.l_suppkey == eu.s_suppkey)
    min_cost = eu_cost.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("supplycost").alias("min_cost")
    )
    return (
        eu_cost.join(
            min_cost,
            (eu_cost.l_partkey == min_cost.mc_partkey)
            & (eu_cost.supplycost == min_cost.min_cost),
        )
        .join(F.broadcast(p), eu_cost.l_partkey == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
    )


@REG.register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
                 CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
          FROM supplier s
          JOIN lineitem l ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l.l_shipdate >= TIMESTAMP '1996-01-01'
            AND l.l_shipdate < TIMESTAMP '1998-01-01') shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume by year. The two nation lookups
    broadcast; the symmetric nation-pair disjunction sits above them, so
    the only shuffles are lineitem⋈orders (orderkey) and orders⋈customer
    (custkey). The year extraction stays JVM-side (no UDF)."""
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@REG.register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
                 CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
                 n1.n_name AS supp_nation
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          JOIN region r ON n2.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
            AND o.o_orderdate >= TIMESTAMP '1996-01-01'
            AND o.o_orderdate < TIMESTAMP '1998-01-01') all_nations
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — the deepest join tree in TPC-H
    (7 relations). Part prunes lineitem first (broadcast), then the two
    fact shuffles (orderkey, custkey); every dimension broadcasts. The
    share is a conditional-sum / total-sum ratio computed from exact
    decimal sums, divided as doubles in both engines."""
    ensure_utc(spark)
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    zero = F.lit(0).cast(_DEC)
    joined = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == r.r_regionkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            F.col("supp_nation"),
        )
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


@REG.register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (SELECT n.n_name AS nation,
                 CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
                 CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                 - CAST(p.p_retailprice AS DECIMAL(18,2))
                   * CAST(l.l_quantity AS DECIMAL(18,2)) * 0.1 AS amount
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          WHERE p.p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-line profit by supplier nation and year. Supply
    cost is adapted to 10% of p_retailprice × quantity (testdata has no
    ps_supplycost). The LIKE filter on part prunes before the join;
    lineitem shuffles once on orderkey; supplier/nation broadcast. The
    decimal literal 0.1 keeps the whole amount expression in exact
    decimal arithmetic in both engines."""
    ensure_utc(spark)
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity") * F.lit("0.1").cast("decimal(2,1)")
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@REG.register(
    "tpch_q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS v
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey IN (3, 7, 11)
      GROUP BY l.l_partkey)
    SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(v AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) * 0.002 FROM val)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose inventory value exceeds a fraction of
    the national total — a grouped agg reused twice (per-part and global)
    with a scalar-subquery threshold. Spark computes the global sum from
    the same per-part aggregate (one shuffle, then a 1-row broadcast);
    both engines derive the threshold from identical decimal sums."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").where(
        F.col("s_nationkey").isin(3, 7, 11)
    )
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("v"))
    )
    total = val.agg((F.sum("v").cast("double") * F.lit(0.002)).alias("threshold"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("v").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
    )


@REG.register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey,
                 CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over customers — the canonical
    left-outer join with a non-key join predicate (the priority filter
    must stay in the ON clause, not WHERE, to preserve zero-order
    customers), then a re-aggregation of the aggregate. Two shuffles:
    custkey, then the tiny c_count key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@REG.register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top revenue supplier for a quarter — the revenue "view"
    is computed once and reused for both the per-supplier rows and the
    MAX scalar (Spark caches nothing here: the agg is cheap and AQE
    reuses the exchange). Equality against the max is exact because both
    sides are the same DECIMAL(18,2) sums; ties return multiple rows, as
    in the spec."""
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@REG.register(
    "tpch_q17_small_quantity",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_limit
          FROM lineitem GROUP BY l_partkey) lim ON lim.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < lim.qty_limit
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue — correlated AVG subquery
    decorrelated into a per-part aggregate joined back to lineitem. The
    0.2×avg threshold is identical in both engines because l_quantity is
    integer-valued (double sums of integers are exact in any order). At
    100 TB the per-part avg is a map-side-combine agg on the same
    partkey the probe join shuffles on — one exchange, reused."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    lim = li.groupBy(F.col("l_partkey").alias("lim_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(lim, F.col("lim_partkey") == li.l_partkey)
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@REG.register(
    "tpch_q20_dominant_supplier",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey, l.l_partkey, SUM(l.l_quantity) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%bolt%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey, l.l_partkey),
    tot AS (SELECT l_partkey, SUM(qty) AS part_qty FROM shipped GROUP BY l_partkey),
    dominant AS (
      SELECT DISTINCT sh.l_suppkey
      FROM shipped sh JOIN tot t ON sh.l_partkey = t.l_partkey
      WHERE sh.qty > 0.3 * t.part_qty)
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
    """,
)
def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding a dominant share of a part's
    annual shipments (stands in for the availqty > half-of-shipped
    predicate — testdata has no partsupp.availqty). Nested aggregation:
    (supp, part) qty → per-part total → share filter → DISTINCT semi
    join into supplier. Both aggs share the l_partkey shuffle prefix;
    quantity sums are exact integer-valued doubles, so the 0.3 share
    threshold is deterministic across engines."""
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    shipped = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("tot_partkey")).agg(
        F.sum("qty").alias("part_qty")
    )
    dominant = (
        shipped.join(tot, shipped.l_partkey == F.col("tot_partkey"))
        .where(F.col("qty") > F.lit(0.3) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )
