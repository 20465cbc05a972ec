from __future__ import annotations

from pyspark.sql import functions as F

from honors_p1_mapreduce_spark.functions.text import tokens_col
from honors_p1_mapreduce_spark.operators import wordcount as wc

from .oracle import compare_query


def test_wordcount_golden(spark):
    # mr/tests/test_mapreduce.py:36,79-82 golden fixture
    df = spark.createDataFrame(
        [("hello world",), ("hello python",), ("world of mapreduce",)], ["text"]
    )
    counts = dict(
        df.select(F.explode(tokens_col("text")).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    assert counts == {"hello": 2, "world": 2, "python": 1, "mapreduce": 1, "of": 1}


def test_wordcount_empty_input(spark):
    # empty-input job completes (mr/tests/test_mapreduce.py:84-115)
    df = spark.createDataFrame([], "text string")
    rows = (
        df.select(F.explode(tokens_col("text")).alias("w")).groupBy("w").count()
    ).collect()
    assert rows == []


def test_wordcount_oracle(spark, sf_dir):
    compare_query(spark, sf_dir, wc.wordcount, wc.WORDCOUNT_ORACLE)


def test_wordcount_topk_oracle(spark, sf_dir):
    compare_query(spark, sf_dir, wc.wordcount_topk, wc.WORDCOUNT_TOPK_ORACLE)
