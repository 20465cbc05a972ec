"""As-of (point-in-time) join — a custom operator Spark's joins lack.

Semantics: for every left event, attach the single most recent right
event by the same key at-or-before the left timestamp (the classic
"purchase → last preceding click" attribution / point-in-time-correct
feature lookup). Spark has no ASOF JOIN; a naive range join explodes
to O(|L|·|R|) per key. This implementation is the canonical
distributed as-of:

    union both sides tagged → ONE shuffle by key → sort by (ts, side)
    within partition → carry the right side forward with
    last(..., ignorenulls=True) over an unbounded-preceding row window
    → keep left rows.

Cost is one shuffle + one sort of |L|+|R| rows — the same plan a
100 TB time-series engine (kdb/QuestDB-style) distributes, with no
per-row probing and no fan-out. Ties: a right event at exactly the
left timestamp matches (right sorts before left at equal ts), and
right-side duplicates on (key, ts) are deduped to the max event id so
the answer is deterministic.

The DuckDB oracle is the built-in ``ASOF LEFT JOIN`` — same greatest-
ts-at-or-before semantics — making this a hash_match-checked custom
operator, not rows-only.

Reference scope note: the reference engine has no joins of any kind
(one input path per job — mr/proto/mapreduce.proto:16); this is
Spark-first capability fill-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

ASOF_LEFT_TYPE = "purchase"
ASOF_RIGHT_TYPE = "click"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Generic as-of join: left rows + most recent right row per key.

    ``left`` and ``right`` must share only the ``on`` column; all
    right columns (minus the key) are carried forward and NULL when no
    right row precedes the left timestamp.
    """
    r_cols = [c for c in right.columns if c != on and c != right_ts]
    l_side = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (on,)],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(right_ts),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in r_cols],
    )
    r_side = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (on,)
        ],
        F.col(right_ts),
        *[F.col(c) for c in r_cols],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_side.unionByName(r_side).select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in [right_ts, *r_cols]
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col(on),
        *[F.col(c) for c in left.columns if c != on],
        *[F.col(f"_asof_{c}").alias(c) for c in [right_ts, *r_cols]],
    )


def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute each purchase to the user's most recent prior click."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == ASOF_LEFT_TYPE).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = (
        ev.filter(F.col("event_type") == ASOF_RIGHT_TYPE)
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    return asof_join(
        purchases, clicks, on="user_id", left_ts="purchase_ts", right_ts="click_ts"
    )


PURCHASE_CLICK_ATTRIBUTION_ORACLE = f"""
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = '{ASOF_LEFT_TYPE}'
),
c AS (
  SELECT user_id, ts AS click_ts, max(event_id) AS click_id
  FROM events WHERE event_type = '{ASOF_RIGHT_TYPE}'
  GROUP BY user_id, ts
)
SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_ts, c.click_id
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
"""


# ------------------------------------------------------------ range join

RANGE_WINDOW = "6 hours"
_RANGE_INTERVAL = "INTERVAL 6 HOURS"
_RANGE_INTERVAL_SQL = "INTERVAL '6 hours'"


def error_click_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: clicks in the 6h before each error.

    Spark's planner turns a raw ``t BETWEEN x AND y`` join predicate
    into a per-key nested-loop — O(|L|·|R|) per user. The scalable
    idiom implemented here buckets both sides by a window equal to the
    range width and turns the range join into an EQUI-join: each error
    probes exactly 2 buckets (its own and the previous one — a
    6h-lookback interval can only span 2 consecutive 6h buckets), the
    shuffle is keyed on (user_id, bucket), and the residual range
    predicate filters within the matched bucket. Fan-out is a constant
    2 regardless of data size — this is the interval-join plan Flink
    and the range-join optimizers in Databricks/DuckDB use. The final
    left join restores errors with zero preceding clicks.

    Buckets come from ``F.window(ts).start`` — timezone-free on the
    tables' TIMESTAMP_NTZ columns, so results are identical under any
    driver session timezone.
    """
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.window("ts", RANGE_WINDOW).start.alias("bucket"),
    )
    ewin = F.window("error_ts", RANGE_WINDOW).start
    probes = errors.select(
        "error_id",
        "user_id",
        "error_ts",
        F.explode(
            F.array(ewin, ewin - F.expr(_RANGE_INTERVAL))
        ).alias("bucket"),
    )
    matched = (
        probes.join(clicks, ["user_id", "bucket"])
        .filter(
            (F.col("click_ts") >= F.col("error_ts") - F.expr(_RANGE_INTERVAL))
            & (F.col("click_ts") < F.col("error_ts"))
        )
        .groupBy("error_id")
        .agg(F.count("*").alias("n_clicks_6h"))
    )
    return errors.join(matched, "error_id", "left").select(
        "error_id",
        "user_id",
        "error_ts",
        F.coalesce(F.col("n_clicks_6h"), F.lit(0)).alias("n_clicks_6h"),
    )


ERROR_CLICK_CORRELATION_ORACLE = f"""
WITH e AS (
  SELECT event_id AS error_id, user_id, ts AS error_ts
  FROM events WHERE event_type = 'error'
),
c AS (
  SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
),
j AS (
  SELECT e.error_id, count(*) AS n_clicks_6h
  FROM e JOIN c ON e.user_id = c.user_id
    AND c.click_ts >= e.error_ts - {_RANGE_INTERVAL_SQL}
    AND c.click_ts <  e.error_ts
  GROUP BY e.error_id
)
SELECT e.error_id, e.user_id, e.error_ts,
       coalesce(j.n_clicks_6h, 0) AS n_clicks_6h
FROM e LEFT JOIN j USING (error_id)
"""
