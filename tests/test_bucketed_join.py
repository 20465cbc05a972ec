"""Bucketed co-located join: oracle parity + storage roundtrip."""

from __future__ import annotations

from pyspark.sql import functions as F

from honors_p1_mapreduce_spark.operators.relational import (
    BUCKETED_JOIN_BUCKETS,
    BUCKETED_JOIN_REVENUE_ORACLE,
    bucketed_join_revenue,
)
from honors_p1_mapreduce_spark.sources.tables import load_table

from .oracle import compare_query


def test_bucketed_join_matches_oracle(spark, sf_dir):
    compare_query(spark, sf_dir, bucketed_join_revenue, BUCKETED_JOIN_REVENUE_ORACLE)


def test_bucketed_publish_loses_nothing(spark, sf_dir):
    """The bucketed write→read roundtrip must preserve every row —
    compare read-back counts and an order-insensitive key checksum
    against the source parquet (the per-bucket layout must be a pure
    re-arrangement)."""
    bucketed_join_revenue(spark, sf_dir)  # (re)publishes both tables
    import re

    safe = re.sub(r"[^A-Za-z0-9_]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    for tbl, src, key in [
        (f"bj_lineitem_{safe}", "lineitem", "l_orderkey"),
        (f"bj_orders_{safe}", "orders", "o_orderkey"),
    ]:
        back = spark.table(tbl)
        source = load_table(spark, sf_dir, src)
        chk = lambda df: df.agg(
            F.count("*").alias("n"),
            F.sum(F.crc32(F.col(key).cast("string"))).alias("x"),
        ).collect()[0]
        a, b = chk(back), chk(source)
        assert (a["n"], a["x"]) == (b["n"], b["x"]), tbl
        # one file per bucket: the aligned pre-repartition worked
        files = back.inputFiles()
        assert len(files) == BUCKETED_JOIN_BUCKETS, tbl
