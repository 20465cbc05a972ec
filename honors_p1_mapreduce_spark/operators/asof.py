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
