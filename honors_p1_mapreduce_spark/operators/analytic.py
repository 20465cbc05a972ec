"""Analytic-SQL surface: outer/anti joins, set operations, window
functions. Like ``relational.py`` this is capability fill-in beyond
the reference (which has no joins at all — SURVEY.md §2.4), in the
plan shapes that survive scale: every join is keyed, every window is
partitioned (no global ordering without a partition key), and all
float math rides the exact decimal-sum pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

# ---------------------------------------------- outer join distribution


def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: distribution of orders-per-customer INCLUDING
    zero-order customers — the left outer join whose unmatched side is
    the point. Two shuffles (join, then 2x count agg), both on keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count skips nulls
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


CUSTOMER_ORDER_COUNTS_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""

# --------------------------------------------------------- anti join


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-order customers per nation: LEFT ANTI join (probe-side
    discard, no fan-out, no null-handling foot-guns) + broadcast dim."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(nation, F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


CUSTOMERS_WITHOUT_ORDERS_ORACLE = """
SELECT n_name, count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
"""

# -------------------------------------------------------- set operations

SETOPS_Y1_FROM, SETOPS_Y1_TO = "1996-01-01", "1997-01-01"
SETOPS_Y2_FROM, SETOPS_Y2_TO = "1997-01-01", "1998-01-01"


def repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-set algebra across two order years: INTERSECT (active
    both years), EXCEPT (churned), UNION (active either).

    One job, one scan: the INTERSECT/EXCEPT/UNION cardinalities are all
    derivable from per-customer membership flags, so a single filtered
    pass over orders feeds one groupBy(custkey) flag-aggregate (shuffle
    carries only keys + two booleans) and a 1-row final agg. The round-3
    version ran three driver-side ``.count()`` actions — three jobs and
    three scans of orders — the exact ``.collect()``-shaped anti-pattern
    SURVEY §7.1 forswears; this is the same answer in one job at ~1/3
    the cost."""
    orders = load_table(spark, sf_dir, "orders")

    def in_span(lo: str, hi: str):
        return (F.col("o_orderdate") >= F.lit(lo).cast("timestamp")) & (
            F.col("o_orderdate") < F.lit(hi).cast("timestamp")
        )

    y1, y2 = in_span(SETOPS_Y1_FROM, SETOPS_Y1_TO), in_span(SETOPS_Y2_FROM, SETOPS_Y2_TO)
    flags = (
        orders.filter(y1 | y2)
        .groupBy("o_custkey")
        .agg(F.max(y1).alias("in_y1"), F.max(y2).alias("in_y2"))
    )
    # coalesce: F.sum over ZERO rows is NULL, but the oracle's scalar
    # COUNT subqueries (and the old three-count form) yield 0 when no
    # orders fall in either span — keep the engines agreeing there
    return flags.agg(
        F.coalesce(
            F.sum((F.col("in_y1") & F.col("in_y2")).cast("long")), F.lit(0)
        ).alias("n_both_years"),
        F.coalesce(
            F.sum((F.col("in_y1") & ~F.col("in_y2")).cast("long")), F.lit(0)
        ).alias("n_churned"),
        F.count("*").alias("n_either_year"),
    )


REPEAT_CUSTOMERS_ORACLE = f"""
WITH y1 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '{SETOPS_Y1_FROM} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{SETOPS_Y1_TO} 00:00:00'
),
y2 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '{SETOPS_Y2_FROM} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{SETOPS_Y2_TO} 00:00:00'
)
SELECT (SELECT count(*) FROM (SELECT * FROM y1 INTERSECT SELECT * FROM y2))
         AS n_both_years,
       (SELECT count(*) FROM (SELECT * FROM y1 EXCEPT SELECT * FROM y2))
         AS n_churned,
       (SELECT count(*) FROM (SELECT * FROM y1 UNION SELECT * FROM y2))
         AS n_either_year
"""

# ------------------------------------------------------ window functions

TOP_ORDERS_PER_CUST_K = 2


def top_orders_per_customer(
    spark: SparkSession, sf_dir: str, k: int = TOP_ORDERS_PER_CUST_K
) -> DataFrame:
    """Top-k orders by totalprice per customer — partitioned ranking
    window (shuffle on the partition key only; never a global sort)
    with deterministic (price DESC, orderkey ASC) tie-break. Restricted
    to one segment so output stays bounded."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
    )


def top_orders_per_customer_oracle(k: int = TOP_ORDERS_PER_CUST_K) -> str:
    return f"""
SELECT o_custkey, rank, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'MACHINERY'
)
WHERE rank <= {k}
"""


TOP_ORDERS_PER_CUSTOMER_ORACLE = top_orders_per_customer_oracle()


def monthly_revenue_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with a per-returnflag running total — aggregate
    then cumulative window. The window runs over the 2-year month
    spine per flag (tiny after aggregation); the cumulative sum runs
    on exact decimals and is cast to double only at the end, so both
    engines emit identical doubles in every prefix."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # month-truncate WITHOUT date_trunc: that builtin promotes
    # timestamp_ntz to session-tz TIMESTAMP, which would shift rendered
    # values under a non-UTC driver session; year()/month() are tz-free
    month = F.expr(
        "make_timestamp_ntz(year(l_shipdate), month(l_shipdate), 1, 0, 0, 0)"
    )
    monthly = li.groupBy(
        F.col("l_returnflag").alias("flag"), month.alias("month")
    ).agg(F.sum(rev.cast("decimal(27,6)")).alias("rev_dec"))
    w = (
        Window.partitionBy("flag")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "flag",
        "month",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("running_revenue"),
    )


MONTHLY_REVENUE_RUNNING_ORACLE = """
WITH monthly AS (
  SELECT l_returnflag AS flag,
         CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
           AS rev_dec
  FROM lineitem
  GROUP BY 1, 2
)
SELECT flag, month,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(SUM(rev_dec) OVER (PARTITION BY flag ORDER BY month
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         AS running_revenue
FROM monthly
"""
