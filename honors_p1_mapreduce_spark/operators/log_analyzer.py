"""Q4 URL/log analyzer: multi-dimensional counts (SURVEY.md §2.3 Q4).

Reference semantics (documented only — mr/documentation.md:624-653):
from log lines emit counts keyed ``domain:<d>``, ``status:<s>``,
``domain_status:<d>:<s>``. The reference fakes a 3-dimensional
aggregation by key-prefixing inside one MapReduce job; the idiomatic
relational form is GROUPING SETS — ONE scan, one shuffle, all three
granularities, instead of three jobs or a unioned triple scan.

Mapped onto the driver's ``events`` table: domain := event_type,
status := weekday-of-ts (a second categorical dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views

_GROUPING_SQL = """
SELECT
  CASE
    WHEN event_type IS NOT NULL AND dow IS NOT NULL
      THEN 'type_dow:' || event_type || ':' || dow
    WHEN event_type IS NOT NULL THEN 'type:' || event_type
    ELSE 'dow:' || dow
  END AS dim_key,
  count(*) AS cnt
FROM (SELECT event_type, CAST(dayofweek(ts) AS STRING) AS dow FROM events)
GROUP BY GROUPING SETS ((event_type), (dow), (event_type, dow))
"""


def log_analyzer(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_GROUPING_SQL)


# DuckDB: dayofweek() is 0=Sunday..6 in DuckDB but 1=Sunday..7 in Spark;
# use an engine-neutral formulation (ISO day number via strftime) on both
# sides instead. Spark's dayofweek != DuckDB's — so the Spark SQL above
# uses dayofweek and the oracle converts DuckDB's to match:
LOG_ANALYZER_ORACLE = """
SELECT
  CASE
    WHEN event_type IS NOT NULL AND dow IS NOT NULL
      THEN 'type_dow:' || event_type || ':' || dow
    WHEN event_type IS NOT NULL THEN 'type:' || event_type
    ELSE 'dow:' || dow
  END AS dim_key,
  count(*) AS cnt
FROM (SELECT event_type, CAST(dayofweek(ts) + 1 AS VARCHAR) AS dow FROM events)
GROUP BY GROUPING SETS ((event_type), (dow), (event_type, dow))
"""
