"""Q1 word count (SURVEY.md §2.3 Q1).

Reference semantics: tokenize ``\\b\\w+\\b`` on the lowercased line,
emit ``(word, 1)``, sum per word (mr/examples/wordcount/mapper.py:8-11,
reducer.py:6-7). Expressed as explode + hash aggregate, which gives the
map-side partial aggregation (combiner) the reference lacks — at 100 TB
the shuffle carries one row per (partition, word), not one per token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_col, tokens_sql
from ..sources.tables import load_table


def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


WORDCOUNT_ORACLE = f"""
SELECT t.word AS word, count(*) AS cnt
FROM documents, unnest({tokens_sql('text')}) AS t(word)
GROUP BY t.word
"""


def wordcount_topk(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Q7 top-K over Q1 (mr/client/client.py:137-140, 'Top 10' demo).

    Deterministic ties: (cnt DESC, word ASC) is a total order here.
    TakeOrderedAndProject — no global sort materialization.
    """
    return wordcount(spark, sf_dir).orderBy(F.desc("cnt"), F.asc("word")).limit(k)


WORDCOUNT_TOPK_ORACLE = f"""
SELECT word, cnt FROM ({WORDCOUNT_ORACLE})
ORDER BY cnt DESC, word ASC LIMIT 20
"""
