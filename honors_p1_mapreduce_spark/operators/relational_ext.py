"""TPC-H shape completion: the five plan shapes `relational.py` lacked.

With this module every one of the 22 TPC-H query *shapes* has an analog
in the engine (see SURVEY.md §8.3).  The driver's star schema has no
``partsupp`` table and lineitem carries no commit/receipt dates or ship
mode, so Q2/Q12/Q20/Q21 are re-keyed onto the columns that exist —
lineitem doubles as the part↔supplier bridge — while preserving the
plan shape that makes each query interesting at 100 TB:

- Q6  → :func:`forecast_revenue`   — pure scan-filter-aggregate, zero joins
- Q2  → :func:`min_cost_supplier`  — correlated per-group MIN + join-back
- Q12 → :func:`priority_lines`     — fact-fact join + conditional counts
- Q20 → :func:`excess_shipments`   — nested semi-join chain off a HAVING agg
- Q21 → :func:`waiting_suppliers`  — EXISTS + NOT EXISTS self-correlation

The reference engine itself has no joins at all (one ``input_path`` per
job — mr/proto/mapreduce.proto:16; SURVEY.md §2.4), so like
``relational.py`` this is Spark-first capability fill-in, not parity.

Scale notes:
- every filter sits directly on the scan (PushedFilters); Q6 reads
  exactly 4 lineitem columns;
- fixed-cardinality dims (nation=25, region=5) ride ``broadcast()``;
  the filtered ``part`` slice in Q20 is broadcast after its LIKE filter;
- Q21's EXISTS/NOT EXISTS compile to LeftSemi/LeftAnti equi-joins on
  ``l_orderkey`` — three scans of the same fact co-partition on one
  key, no nested loops;
- float aggregates ride the exact decimal-sum pattern
  (``functions.numeric``) so DuckDB oracle hashes match bit-exact;
  MIN over doubles is order-insensitive and needs no decimal detour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum_expr, dsum_sql
from ..sources.tables import load_table
from .relational import dim

# ------------------------------------------------- forecast revenue (Q6)

FORECAST_FROM = "1996-01-01"
FORECAST_TO = "1997-01-01"
FORECAST_DISC_LO = 0.04
FORECAST_DISC_HI = 0.06
FORECAST_QTY = 24


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped revenue-change forecast: one scan, no joins.

    The canonical "how much bandwidth does the scan layer have" query:
    all three predicates push into the parquet reader, only 4 columns
    are read, and the aggregate collapses to one row per partition
    before the single-row final exchange.  At 100 TB this is I/O-bound
    by construction — there is nothing else in the plan.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(FORECAST_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(FORECAST_TO).cast("timestamp"))
        & (F.col("l_discount") >= FORECAST_DISC_LO)
        & (F.col("l_discount") <= FORECAST_DISC_HI)
        & (F.col("l_quantity") < FORECAST_QTY)
    )
    return li.agg(
        dsum_expr(F.col("l_extendedprice") * F.col("l_discount"), "forecast_revenue")
    )


FORECAST_REVENUE_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice * l_discount', 'forecast_revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{FORECAST_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{FORECAST_TO} 00:00:00'
  AND l_discount BETWEEN {FORECAST_DISC_LO} AND {FORECAST_DISC_HI}
  AND l_quantity < {FORECAST_QTY}
"""

# ---------------------------------------------- min-cost supplier (Q2)

MINCOST_REGION = "EUROPE"
MINCOST_SIZE = 10
MINCOST_TYPE = "STANDARD"


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped: per-part minimum-cost supplier via join-back.

    No ``partsupp`` table exists, so observed shipments are the
    part↔supplier bridge: a supplier's "cost" for a part is its
    cheapest shipped ``l_extendedprice``.  The shape is the Q2
    essential — a correlated per-group MIN evaluated as an aggregate,
    then joined back to recover the full qualifying rows (all ties
    kept, so the result is deterministic without a tie-break limit).

    Plan: lineitem ⋈ supplier (100 TB: shuffle join; supplier filtered
    through broadcast nation⋈region first) → partial agg per
    (part, supp) → per-part MIN as a *window* over the already-reduced
    frame (one extra exchange on l_partkey over ~|part×supp-in-region|
    rows) → filter cost == min.  The naive agg-then-join-back
    formulation re-derives the whole cost aggregate on both join
    sides — two full fact scans; the window form scans lineitem once.
    MIN over doubles is exact in both engines; no decimal needed.
    """
    region = dim(spark, sf_dir, "region").filter(F.col("r_name") == MINCOST_REGION)
    nation = dim(spark, sf_dir, "nation").join(
        region, F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    costs = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_size") <= MINCOST_SIZE) & (F.col("p_type") == MINCOST_TYPE)
        )
    )
    winners = (
        costs.withColumn(
            "min_cost", F.min("cost").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("cost") == F.col("min_cost"))
        .select("l_partkey", "l_suppkey", "min_cost")
    )
    supp_out = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        winners.join(part, winners.l_partkey == part.p_partkey)
        .join(supp_out, winners.l_suppkey == supp_out.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            "s_acctbal",
            "min_cost",
        )
    )


MIN_COST_SUPPLIER_ORACLE = f"""
WITH costs AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{MINCOST_REGION}'
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, min(cost) AS min_cost FROM costs GROUP BY l_partkey
)
SELECT p_partkey, p_name, s_name, n_name, s_acctbal, min_cost
FROM costs c
JOIN best b ON c.l_partkey = b.l_partkey AND c.cost = b.min_cost
JOIN part ON p_partkey = c.l_partkey
JOIN supplier ON c.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size <= {MINCOST_SIZE} AND p_type = '{MINCOST_TYPE}'
"""

# ----------------------------------------------- priority lines (Q12)

PRIORITY_FROM = "1997-01-01"
PRIORITY_TO = "1998-01-01"
HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: conditional counts after a fact-fact join.

    lineitem has no ship mode, so the group key is ``l_returnflag``;
    the shape survives intact: date-filtered lineitem ⋈ orders on the
    order key, then CASE-style conditional aggregation splitting line
    counts by order priority.  Counts use ``count(when(...))`` /
    ``count(*) FILTER`` so both engines return exact BIGINTs.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(PRIORITY_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(PRIORITY_TO).cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin(*HIGH_PRIORITIES)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(is_high, 1)).alias("high_line_count"),
            F.count(F.when(~is_high, 1)).alias("low_line_count"),
        )
    )


_HIGH_IN = ", ".join(f"'{p}'" for p in HIGH_PRIORITIES)

PRIORITY_LINES_ORACLE = f"""
SELECT l_returnflag,
       count(*) FILTER (WHERE o_orderpriority IN ({_HIGH_IN}))     AS high_line_count,
       count(*) FILTER (WHERE o_orderpriority NOT IN ({_HIGH_IN})) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{PRIORITY_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{PRIORITY_TO} 00:00:00'
GROUP BY l_returnflag
"""

# --------------------------------------------- excess shipments (Q20)

EXCESS_PART_SUFFIX = "gear"
EXCESS_QTY = 100


def excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped: nested semi-join chain off a HAVING aggregate.

    Suppliers who shipped more than ``EXCESS_QTY`` total units of any
    "…gear" part.  The Q20 essential — a part name slice feeding a
    per-(supplier, part) quantity aggregate with a HAVING threshold,
    collapsed to distinct suppliers and joined to the supplier dim —
    expressed over the lineitem bridge (no ``partsupp`` here).

    Plan: part LIKE-filter → **broadcast** into the lineitem scan (a
    map-side semi-join; the fact table never shuffles for the filter)
    → partial+final agg on (suppkey, partkey) → HAVING on the exact
    decimal sum → per-supplier count of qualifying parts → broadcast
    nation lookup.  One fact shuffle total.
    """
    gear = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").endswith(EXCESS_PART_SUFFIX))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity"
    )
    qualifying = (
        li.join(gear, li.l_partkey == gear.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum_expr(F.col("l_quantity"), "total_qty", scale=2, precision=18))
        .filter(F.col("total_qty") > EXCESS_QTY)
    )
    per_supp = qualifying.groupBy("l_suppkey").agg(
        F.count("*").alias("n_excess_parts")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = dim(spark, sf_dir, "nation")
    return (
        per_supp.join(supp, per_supp.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "n_excess_parts")
    )


EXCESS_SHIPMENTS_ORACLE = f"""
WITH qualifying AS (
  SELECT l_suppkey, l_partkey,
         {dsum_sql('l_quantity', 'total_qty', scale=2, precision=18)}
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%{EXCESS_PART_SUFFIX}'
  GROUP BY l_suppkey, l_partkey
  HAVING total_qty > {EXCESS_QTY}
),
per_supp AS (
  SELECT l_suppkey, count(*) AS n_excess_parts FROM qualifying GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, n_name, n_excess_parts
FROM per_supp
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
"""

# -------------------------------------------- waiting suppliers (Q21)

WAITING_K = 10


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: EXISTS + NOT EXISTS self-correlation, top-K.

    Suppliers who were the *sole* returner on a multi-supplier order:
    a returned ('R') line where another supplier has a line on the
    same order (EXISTS) but no other supplier returned on it
    (NOT EXISTS).  Without commit/receipt dates, ``l_returnflag='R'``
    stands in for "failed to meet the committed date"; the correlation
    structure — two self-references on the same fact keyed by
    ``l_orderkey`` — is the point.

    Plan: the EXISTS becomes a LeftSemi and the NOT EXISTS a LeftAnti
    equi-join on ``l_orderkey`` (extra non-equi suppkey predicate rides
    the join condition, not a nested loop); all three fact scans
    co-partition on the order key so AQE coalesces them onto one
    exchange layout.  Top-K is deterministic: (numwait DESC, s_name
    ASC) is a total order because s_name is unique per supplier.
    """
    li = load_table(spark, sf_dir, "lineitem")
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        F.col("l_returnflag").alias("o2_returnflag"),
    )
    waited = returned.join(
        others,
        (returned.l_orderkey == others.o2_orderkey)
        & (returned.l_suppkey != others.o2_suppkey),
        "leftsemi",
    )
    sole = waited.join(
        others.filter(F.col("o2_returnflag") == "R"),
        (waited.l_orderkey == F.col("o2_orderkey"))
        & (waited.l_suppkey != F.col("o2_suppkey")),
        "leftanti",
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        sole.join(supp, sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(WAITING_K)
    )


WAITING_SUPPLIERS_ORACLE = f"""
WITH returned AS (
  SELECT DISTINCT l_suppkey, l_orderkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT s_name, count(*) AS numwait
FROM returned r
JOIN supplier ON r.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = r.l_orderkey AND l2.l_suppkey <> r.l_suppkey
)
AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = r.l_orderkey AND l3.l_suppkey <> r.l_suppkey
      AND l3.l_returnflag = 'R'
)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT {WAITING_K}
"""

# ------------------------------------------------- revenue CUBE

def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (order year, order priority) of discounted
    revenue: every combination of subtotal — (year, priority),
    per-year, per-priority, grand total — in ONE pass.

    The multi-dimensional dashboard rollup: Spark compiles ``cube()``
    to a single Expand + hash-aggregate (each input row contributes to
    its 4 grouping sets map-side), so the fact is scanned and shuffled
    once no matter how many subtotal levels are served — at 100 TB
    this replaces 4 separate aggregation jobs. NULL dimension values
    are coalesced to sentinels (-1 / 'ALL') so the output is
    unambiguous and hash-comparable.

    Revenue rides the exact decimal-sum pattern; the year is extracted
    from the order date (the fact-fact join happens BEFORE the Expand,
    so each joined row is expanded, not re-joined per grouping set).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.year("o_orderdate").alias("o_year"),
        F.col("o_orderpriority").alias("priority"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return (
        j.cube("o_year", "priority")
        .agg(
            dsum_expr(F.col("rev"), "revenue"),
            F.count("*").alias("n_lines"),
        )
        .select(
            F.coalesce(F.col("o_year"), F.lit(-1)).alias("o_year"),
            F.coalesce(F.col("priority"), F.lit("ALL")).alias("priority"),
            "revenue",
            "n_lines",
        )
    )


REVENUE_CUBE_ORACLE = f"""
SELECT coalesce(CAST(year(o_orderdate) AS INT), -1) AS o_year,
       coalesce(o_orderpriority, 'ALL') AS priority,
       {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
       count(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY CUBE (year(o_orderdate), o_orderpriority)
"""
