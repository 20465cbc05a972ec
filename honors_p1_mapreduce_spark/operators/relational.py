"""Relational query surface over the driver's TPC-H-ish star schema.

The reference engine has NO joins — one ``input_path`` per job, no
second-input plumbing (mr/proto/mapreduce.proto:16; SURVEY.md §2.4) —
so this module is pure Spark-first capability fill-in: scan → filter →
join → aggregate → order/limit plans in the shapes a 100 TB cluster
wants.

Scale notes baked into every query:
- fixed-cardinality dimensions (region=5, nation=25 rows at ANY scale
  factor) are explicitly ``broadcast()`` — no shuffle for them, ever;
- fact-fact joins (orders⋈lineitem) stay shuffle hash/sort-merge on
  the join key and AQE handles skew/coalescing;
- every float aggregate goes through the exact decimal-sum pattern
  (``functions.numeric``) so the DuckDB oracle hash matches bit-exact
  regardless of partitioning/order;
- filters sit directly on the scans so Catalyst pushes them into the
  parquet reader (PushedFilters) and prunes columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum_col, dsum_expr, dsum_sql
from ..sources.tables import BROADCAST_TABLES, load_table


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table, broadcast-hinted when it's a fixed-size dimension."""
    df = load_table(spark, sf_dir, name)
    return F.broadcast(df) if name in BROADCAST_TABLES else df


# ------------------------------------------------------ pricing summary

PRICING_CUTOFF = "2000-09-02"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem.

    Single pruned scan (5 value cols + 3 key/filter cols) → partial+
    final hash aggregate on a 6-group key. No join, one shuffle of 6
    rows per map partition — the canonical 100 TB aggregation plan.
    Averages are computed as exact-decimal-sum / count in DOUBLE so
    both engines produce the identical IEEE result.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(PRICING_CUTOFF).cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    grouped = li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum_col("l_quantity", "sum_qty"),
        dsum_col("l_extendedprice", "sum_base_price"),
        dsum_expr(disc_price, "sum_disc_price"),
        dsum_expr(charge, "sum_charge"),
        F.count("*").alias("count_order"),
    )
    return grouped.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
        "count_order",
    )


PRICING_SUMMARY_ORACLE = f"""
WITH g AS (
  SELECT l_returnflag, l_linestatus,
         {dsum_sql('l_quantity', 'sum_qty', scale=2, precision=18)},
         {dsum_sql('l_extendedprice', 'sum_base_price', scale=2, precision=18)},
         {dsum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
         {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF} 00:00:00'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price,
       sum_charge, sum_qty / count_order AS avg_qty,
       sum_base_price / count_order AS avg_price, count_order
FROM g
"""

# ------------------------------------------------------- top revenue (Q3)

TOPREV_SEGMENT = "BUILDING"
TOPREV_DATE = "1998-01-01"
TOPREV_K = 10


def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: top-K unshipped-revenue orders for one segment.

    customer(filtered) ⋈ orders(filtered) ⋈ lineitem(filtered): both
    filters push into the scans, the orders⋈lineitem side is the big
    shuffle join, and the pre-filtered customer side shrinks to ~1/5
    of customers (AQE picks broadcast when it fits — at 100 TB it
    correctly stays a shuffle join). Top-K runs as a global
    TakeOrdered on the already-aggregated rows with a deterministic
    (revenue DESC, orderkey ASC) tie-break.
    """
    cutoff = F.lit(TOPREV_DATE).cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == TOPREV_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_expr(rev, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(TOPREV_K)
    )


TOP_REVENUE_ORACLE = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{TOPREV_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{TOPREV_DATE} 00:00:00'
  AND l_shipdate > TIMESTAMP '{TOPREV_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT {TOPREV_K}
"""

# ---------------------------------------------------- nation revenue (Q5)

NATREV_REGION = "ASIA"
NATREV_FROM = "1996-01-01"
NATREV_TO = "1998-01-01"


def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue by nation where customer and supplier
    share a nation, within one region and a two-year order window.

    Join order (big→small): lineitem ⋈ orders (shuffle, both filtered)
    ⋈ customer (shuffle) ⋈ supplier (broadcast: fixed small) with the
    c_nationkey = s_nationkey locality condition, then nation and
    region as broadcast dims. Only nation-level rows survive the final
    6-way plan — the aggregate output is 5 rows at any scale.
    """
    lo = F.lit(NATREV_FROM).cast("timestamp")
    hi = F.lit(NATREV_TO).cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    supp = dim(spark, sf_dir, "supplier")
    nation = dim(spark, sf_dir, "nation")
    region = dim(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == NATREV_REGION)
        .groupBy("n_name")
        .agg(dsum_expr(rev, "revenue"), F.count("*").alias("n_items"))
    )


NATION_REVENUE_ORACLE = f"""
SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{NATREV_REGION}'
  AND o_orderdate >= TIMESTAMP '{NATREV_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{NATREV_TO} 00:00:00'
GROUP BY n_name
"""

# ------------------------------------------------- order priority (Q4-ish)

PRIO_FROM = "1997-07-01"
PRIO_TO = "1997-10-01"


def order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority that had at least one line shipped AFTER the
    order date (late shipment), within one quarter.

    The existence test is a LEFT SEMI join — Spark never materializes
    the matching lineitem rows, just probes; at scale this is the
    shape that avoids both the fan-out join and a distinct.
    """
    lo = F.lit(PRIO_FROM).cast("timestamp")
    hi = F.lit(PRIO_TO).cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORDER_PRIORITY_ORACLE = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{PRIO_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{PRIO_TO} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""

# --------------------------------------------- region/nation acctbal roll-up


def region_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer account-balance roll-up through the broadcast dims.

    customer ⋈ nation ⋈ region with both dimension sides broadcast —
    zero shuffle until the final 25-group aggregate. This is the
    plan-shape witness for ``BROADCAST_TABLES``.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = dim(spark, sf_dir, "nation")
    region = dim(spark, sf_dir, "region")
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum_col("c_acctbal", "sum_acctbal"),
        )
        .withColumn("avg_acctbal", F.col("sum_acctbal") / F.col("n_customers"))
    )


REGION_ACCTBAL_ORACLE = f"""
WITH g AS (
  SELECT r_name, n_name, count(*) AS n_customers,
         {dsum_sql('c_acctbal', 'sum_acctbal', scale=2, precision=18)}
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name, n_customers, sum_acctbal,
       sum_acctbal / n_customers AS avg_acctbal
FROM g
"""

# ------------------------------------------------------ promo share (Q14)

PROMO_FROM = "1997-01-01"
PROMO_TO = "1997-04-01"


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: % of revenue from PROMO-type parts in a window.

    lineitem(filtered) ⋈ part on partkey with part broadcast
    (BROADCAST_TABLES); conditional exact-decimal sums, scalar output.
    """
    lo = F.lit(PROMO_FROM).cast("timestamp")
    hi = F.lit(PROMO_TO).cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    part = dim(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    agg = li.join(part, li.l_partkey == part.p_partkey).agg(
        dsum_expr(promo_rev, "promo_rev"), dsum_expr(rev, "total_rev")
    )
    return agg.select(
        "promo_rev",
        "total_rev",
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_pct"),
    )


PROMO_REVENUE_ORACLE = f"""
WITH g AS (
  SELECT
    {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 'promo_rev')},
    {dsum_sql('l_extendedprice * (1 - l_discount)', 'total_rev')}
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{PROMO_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{PROMO_TO} 00:00:00'
)
SELECT promo_rev, total_rev, 100.0 * promo_rev / total_rev AS promo_pct
FROM g
"""

# -------------------------------------- small-quantity revenue (Q17-ish)


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped: revenue from line items whose quantity is
    below 20% of their part's average quantity.

    The correlated scalar subquery becomes an aggregate-then-join:
    per-part averages (one shuffle, output = |parts| rows) joined back
    to lineitem on the part key. The per-part frame is orders of
    magnitude smaller than the fact table, so AQE broadcast-joins it
    at any realistic scale; avg is computed as exact-decimal sum /
    count so the 0.2x threshold is bit-identical in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    return (
        li.join(per_part, li.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            dsum_col("l_extendedprice", "total_price", scale=2, precision=18),
            F.count("*").alias("n_items"),
        )
    )


SMALL_QUANTITY_REVENUE_ORACLE = f"""
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
           AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT {dsum_sql('l_extendedprice', 'total_price', scale=2, precision=18)},
       count(*) AS n_items
FROM lineitem JOIN per_part ON l_partkey = pk
WHERE l_quantity < 0.2 * avg_qty
"""

# ------------------------------------------------- top supplier (Q15-ish)

TOPSUP_FROM = "1997-01-01"
TOPSUP_TO = "1997-04-01"


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: supplier(s) with maximum revenue in a window.

    The argmax is a join-back against the global max of the aggregated
    per-supplier frame (both tiny after aggregation; the max side is a
    1-row broadcast). Returns every tied supplier — deterministic
    without needing a tie-break.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(TOPSUP_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(TOPSUP_TO).cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        dsum_expr(rev, "total_revenue")
    )
    mx = per_supp.agg(F.max("total_revenue").alias("max_rev"))
    supp = dim(spark, sf_dir, "supplier")
    return (
        per_supp.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("sk") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


TOP_SUPPLIER_ORACLE = f"""
WITH per_supp AS (
  SELECT l_suppkey AS sk,
         {dsum_sql('l_extendedprice * (1 - l_discount)', 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TOPSUP_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{TOPSUP_TO} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM per_supp
JOIN supplier ON sk = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM per_supp)
"""

# ------------------------------------------------------------- rollup


def returns_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): per-group, per-flag
    subtotal, and grand-total rows from ONE shuffle (Spark expands the
    grouping sets map-side) — the hierarchy-totals companion to
    log_analyzer's GROUPING SETS."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        dsum_col("l_quantity", "sum_qty"),
    )


RETURNS_ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus, count(*) AS n_items,
       {dsum_sql('l_quantity', 'sum_qty', scale=2, precision=18)}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""
