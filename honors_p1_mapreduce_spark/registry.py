"""Central query registry — the engine's analytics surface.

``QUERIES`` maps name -> (spark, sf_dir) -> DataFrame; ``ORACLES``
maps the same names to ANSI-SQL DuckDB twins (omitted for genuinely
non-SQL-expressible ops, which get the driver's rows-only check).
``__spark_entry__.py`` re-exports these to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import wordcount as _wc

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {
    "wordcount": _wc.wordcount,
    "wordcount_topk": _wc.wordcount_topk,
}

ORACLES: dict[str, str] = {
    "wordcount": _wc.WORDCOUNT_ORACLE,
    "wordcount_topk": _wc.WORDCOUNT_TOPK_ORACLE,
}
