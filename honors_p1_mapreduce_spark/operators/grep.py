"""Q2 grep: filter + count duplicate matching lines (SURVEY.md §2.3 Q2).

Reference semantics: case-insensitive regex search on each line
(pattern from env, default ``error`` — mr/examples/grep/mapper.py:15,29),
key = stripped matching line, count duplicates (grep/reducer.py:22-23).

Run over ``documents.text`` (the line-shaped table). The filter is a
plain predicate, so Catalyst pushes the scan down to (text) only and
the aggregate is partial+final — at scale this is a single pruned scan
plus a shuffle of the few matching distinct lines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

DEFAULT_PATTERN = os.environ.get("GREP_PATTERN", "stream.*join")


def grep_count(
    spark: SparkSession, sf_dir: str, pattern: str = DEFAULT_PATTERN
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.lower(F.col("text")).rlike(pattern))
        .select(F.trim(F.col("text")).alias("line"))
        .groupBy("line")
        .agg(F.count("*").alias("cnt"))
    )


GREP_COUNT_ORACLE = f"""
SELECT trim(text) AS line, count(*) AS cnt
FROM documents
WHERE regexp_matches(lower(text), '{DEFAULT_PATTERN}')
GROUP BY trim(text)
"""


def grep_total(spark: SparkSession, sf_dir: str, pattern: str = DEFAULT_PATTERN) -> DataFrame:
    """Scalar variant: how many lines match (the demo's headline number)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.lower(F.col("text")).rlike(pattern)).agg(
        F.count("*").alias("matches")
    )


GREP_TOTAL_ORACLE = f"""
SELECT count(*) AS matches FROM documents
WHERE regexp_matches(lower(text), '{DEFAULT_PATTERN}')
"""
