"""Remaining TPC-H query *shapes* (q2, q8, q9, q11-q22), adapted to the
driver testdata schema (no partsupp table; trimmed columns — see
TESTDATA.md). These extend the batch-analytics layer of SURVEY.md §7
Phase 5 with the operator patterns the first wave didn't cover:

- correlated scalar subqueries (q2, q11, q15, q17, q22)
- disjunctive predicate pushdown (q19)
- semi / anti join chains (q16, q20, q21, q22)
- left-join aggregation distribution (q13)
- conditional aggregation / ratio-of-sums (q8, q12, q14)

Numeric discipline (driver hash-compare, scripts/check_oracle.py):
monetary math in DECIMAL(18,2) with the final aggregate cast to
DECIMAL(18,4) so Spark and DuckDB render identical scales; ratios divide
the two exact decimal sums AS DOUBLE at the very end (IEEE division of
identical operands is deterministic); threshold comparisons against an
average are multiplied through (qty * k * cnt < sum) so no engine ever
computes an inexact avg.

Scale notes inline: every query is written for the 100 TB plan first —
broadcast the dimension tree, aggregate the fact table *before* joining
dimensions, keep scans pruned to the referenced columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .io import load_table as _t


def _dec(col, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


def _rev():
    """Exact decimal revenue term: extendedprice * (1 - discount)."""
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


# ------------------------------------------------------------------ q2
def q2_min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-min subquery — per p_type, the
    part(s) with the minimum retail price (stand-in for min supplycost;
    no partsupp table in the testdata).

    Spark plan: window min over p_type then filter-equal — one shuffle
    on p_type, no self-join. At 100 TB the window beats the
    agg-then-self-join rewrite because the part table is scanned once.
    """
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        part.withColumn("min_price", F.min("p_retailprice").over(w))
        .where(F.col("p_retailprice") == F.col("min_price"))
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    )


ORACLE_Q2 = """
SELECT p_type, p_partkey, p_name, p_retailprice
FROM part p
WHERE p_retailprice = (
  SELECT min(p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type)
ORDER BY p_type, p_partkey
"""


# ------------------------------------------------------------------ q8
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of EUROPE's PROMO-part revenue
    by order year. Ratio-of-sums via conditional aggregation — a single
    pass over the joined fact, not two queries.

    Broadcast chain: region→nation→customer (probe side of orders),
    nation→supplier, part filter broadcast onto lineitem. The only big
    shuffle is lineitem ⋈ orders.
    """
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cust = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.sum(_rev()).alias("_total")
    nat_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    ).alias("_nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(nat_vol, vol)
        .select(
            "o_year",
            (F.col("_nation").cast("double") / F.col("_total").cast("double")).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )


ORACLE_Q8 = """
SELECT o_year,
  CAST(nation_vol AS DOUBLE) / CAST(total_vol AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
    SUM(CASE WHEN n2.n_name = 'NATION_3'
        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        ELSE CAST(0 AS DECIMAL(18,2)) END) AS nation_vol,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_vol
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
  GROUP BY 1
) ORDER BY o_year
"""


# ------------------------------------------------------------------ q9
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'red' parts by supplier nation and
    year. Cost proxy = quantity * retailprice (no ps_supplycost in the
    testdata). The selective p_name filter broadcasts onto lineitem so
    the fact scan is pruned before any shuffle.
    """
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    amount = F.sum(
        _rev() - _dec("l_quantity") * _dec("p_retailprice") * F.lit("0.01").cast("decimal(4,2)")
    ).cast("decimal(18,4)").cast("double")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(amount.alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


ORACLE_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
  CAST(CAST(SUM(
    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
    - CAST(l_quantity AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2)) * CAST('0.01' AS DECIMAL(4,2))
  ) AS DECIMAL(18,4)) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ----------------------------------------------------------------- q11
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds 0.06% of global
    revenue — HAVING against a scalar subquery. Spark plan: aggregate
    once, derive the global total from the *aggregated* (tiny) result
    and broadcast it back; the 100 TB fact table is scanned exactly
    once.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    per_part = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("_value"))
    total = per_part.agg(F.sum("_value").alias("_total"))
    frac = F.lit("0.0006").cast("decimal(5,4)")
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("_value") > F.col("_total") * frac)
        .select(
            "l_partkey",
            F.col("_value").cast("decimal(18,4)").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


ORACLE_Q11 = """
SELECT l_partkey,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))))
  > (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))))
     FROM lineitem) * CAST('0.0006' AS DECIMAL(5,4))
ORDER BY part_value DESC, l_partkey
"""


# ----------------------------------------------------------------- q12
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high- vs low-priority line counts per ship
    year (no l_shipmode column — year plays the grouping role).
    Conditional count via sum(case) — single pass, map-side partials.
    """
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


ORACLE_Q12 = """
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY ship_year
"""


# ----------------------------------------------------------------- q13
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer,
    including zero-order customers — LEFT join with a join-side filter
    (the filter must live in the join condition, not a WHERE, or the
    zero bucket disappears), then a second tiny aggregation.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "5-LOW"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ----------------------------------------------------------------- q14
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: % of 1997 revenue from PROMO parts. Both sums
    are exact decimals; the single final division happens in double.
    Part (2k rows -> broadcast) joins onto the date-pruned fact scan.
    """
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(promo.alias("_promo"), F.sum(_rev()).alias("_total"))
        .select(
            (
                F.lit(100.0) * F.col("_promo").cast("double")
                / F.col("_total").cast("double")
            ).alias("promo_revenue")
        )
    )


ORACLE_Q14 = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
  AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
"""


# ----------------------------------------------------------------- q15
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max revenue in 1997H1 —
    scalar-max subquery over an aggregated view. The view is computed
    once and reused for both the max and the probe (Spark reuses the
    exchange; at scale this is one fact scan + one tiny broadcast).
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev()).cast("decimal(18,4)").alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("_max"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("_max"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


ORACLE_Q15 = """
WITH revenue AS (
  SELECT l_suppkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ----------------------------------------------------------------- q16
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute,
    excluding flagged suppliers via broadcast ANTI join (the NOT IN
    subquery). count(distinct) shuffles on the group key with partial
    distinct aggregation map-side.
    """
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#1").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ----------------------------------------------------------------- q17
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity Brand#3 lineitems
    (qty < 20% of the part's average). The correlated avg subquery is
    multiplied through — qty * 5 * cnt < sum(qty) — so both engines
    compare exact decimals; the per-part aggregate joins back via
    broadcast (2k parts) instead of a self-shuffle.
    """
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_brand = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = li_brand.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(_dec("l_quantity")).alias("_sum_qty"),
        F.count("*").alias("_cnt"),
    )
    return (
        li_brand.join(F.broadcast(per_part), F.col("l_partkey") == F.col("_pk"))
        .where(
            _dec("l_quantity") * F.lit(5) * F.col("_cnt") < F.col("_sum_qty")
        )
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


ORACLE_Q17 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part ON l_partkey = p_partkey
JOIN (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty, count(*) AS cnt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
  GROUP BY l_partkey
) agg ON l.l_partkey = agg.pk
WHERE p_brand = 'Brand#3'
  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
"""


# ----------------------------------------------------------------- q18
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind orders totalling > 300 units —
    HAVING on the fact aggregate, then dimensions joined onto the
    *small* survivor set (never onto the raw fact table).
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


ORACLE_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
"""


# ----------------------------------------------------------------- q19
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    predicate groups. The disjunction references both join sides, so it
    can't prune the scan — but the per-side conjuncts (brand IN,
    size/qty ranges) are pushed as residual filters; part broadcasts.
    """
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    g1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    g2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    g3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(g1 | g2 | g3)
        .agg(F.sum(_rev()).cast("decimal(18,4)").cast("double").alias("revenue"))
    )


ORACLE_Q19 = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ----------------------------------------------------------------- q20
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers that moved > 2500 units of PROMO
    parts — IN-subquery as a broadcast LEFT SEMI join onto the
    supplier dimension. The heavy work (fact aggregation) happens
    before any dimension join.
    """
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    movers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 2500)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        supp.join(F.broadcast(movers), supp.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


ORACLE_Q20 = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
  GROUP BY l_suppkey HAVING SUM(l_quantity) > 2500)
ORDER BY s_suppkey
"""


# ----------------------------------------------------------------- q21
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no commit/receipt dates): per
    supplier, count multi-supplier orders where THIS supplier returned
    items ('R') and no other supplier did.

    The oracle keeps the literal EXISTS / NOT-EXISTS formulation; the
    Spark plan uses the aggregation rewrite — per order, ``n_supp``
    distinct suppliers and ``n_ret`` distinct returners, then
    "EXISTS another supplier" ⇔ n_supp > 1 and "NOT EXISTS another
    returner" ⇔ n_ret == 1. One fact-table aggregation + one join on
    the aggregated (tiny) per-order summary replaces two self-joins
    over the distinct pair sets — at 100 TB that's one shuffle of the
    fact table instead of three. The oracle hash-match proves the
    rewrite's equivalence.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    is_ret = F.col("l_returnflag") == "R"
    # Two-level aggregate, no distinct-Expand anywhere: level 1 folds
    # the fact table to its distinct (order, supplier) pairs with a
    # has-returned flag (map-side combine does most of the work);
    # level 2 is pair-sized. When n_ret == 1 the sole returner IS
    # max(returner), so the qualifying (order, supplier) row comes
    # straight out of the summary — no second lineitem scan, no semi
    # join, and no countDistinct (whose Expand would push 2-3x the
    # fact-table rows through the shuffle).
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(is_ret.cast("int")).alias("has_ret")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("has_ret").alias("n_ret"),
        F.max(
            F.when(F.col("has_ret") == 1, F.col("l_suppkey"))
        ).alias("ret_supp"),
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_ret") == 1))
        .join(F.broadcast(supp), F.col("ret_supp") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


ORACLE_Q21 = """
WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
returned AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
SELECT s_name, count(*) AS numwait
FROM returned r
JOIN supplier ON r.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM pairs p
              WHERE p.l_orderkey = r.l_orderkey AND p.l_suppkey <> r.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM returned r2
                  WHERE r2.l_orderkey = r.l_orderkey AND r2.l_suppkey <> r.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


# ----------------------------------------------------------------- q22
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone idle, grouped by
    nation. The 'above average positive balance' threshold is
    multiplied through (bal * cnt > sum) to stay in exact decimals; the
    idle predicate is a LEFT ANTI join against recent order keys
    (no order since 2001-01-01 — the synthetic data gives every
    customer at least one lifetime order, so the literal TPC-H
    'no orders ever' predicate selects zero rows at every sf and would
    make the correctness check trivially green; 'idle since' keeps the
    scalar-subquery + anti-join shape non-degenerate: 29/285/2845 rows
    at sf0.001/0.01/0.1).
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    pos = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("_sum_bal"), F.count("*").alias("_cnt")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .where(_dec("c_acctbal") * F.col("_cnt") > F.col("_sum_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


ORACLE_Q22 = """
SELECT c_nationkey, count(*) AS numcust,
  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS totacctbal
FROM customer c, (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal, count(*) AS cnt
                  FROM customer WHERE c_acctbal > 0) pos
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""
