"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``honors_p1_mapreduce_spark.registry`` — the actual
engine lives in the package; see SURVEY.md §2 for the operator
inventory each entry corresponds to.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from honors_p1_mapreduce_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: word-count top-20 over sf0.001 documents."""
    return registry.QUERIES["wordcount_topk"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
