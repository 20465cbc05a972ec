"""Q5 n-gram (bigram) extraction (SURVEY.md §2.3 Q5).

Reference semantics (documented only — mr/documentation.md:655-681):
emit adjacent word pairs per line, count globally. Implemented as an
array zip_with over the token array (no self-join, no window shuffle:
bigram construction is narrow per-row work; the only shuffle is the
final count aggregation, which is partially aggregated map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import bigrams_from_tokens, bigrams_sql, tokens_col
from ..sources.tables import load_table


def bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(tokens_col("text").alias("toks"))
        .select(F.explode(bigrams_from_tokens(F.col("toks"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )


BIGRAMS_ORACLE = f"""
SELECT b.bigram AS bigram, count(*) AS cnt
FROM documents, unnest({bigrams_sql('text')}) AS b(bigram)
GROUP BY b.bigram
"""


def bigrams_topk(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    return bigrams(spark, sf_dir).orderBy(F.desc("cnt"), F.asc("bigram")).limit(k)


def ngrams(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """General word n-grams (the reference's ngram example is
    n-generic — mr/documentation.md:655-681); same explode → hash-agg
    plan as bigrams, shingle construction over the once-materialized
    token array."""
    from ..functions.text import shingles_from_tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(tokens_col("text").alias("toks"))
        .select(F.explode(shingles_from_tokens(F.col("toks"), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
    )


def trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngrams(spark, sf_dir, n=3)


def _trigrams_oracle() -> str:
    from ..functions.text import shingles_sql

    return f"""
SELECT g.ngram AS ngram, count(*) AS cnt
FROM documents, unnest({shingles_sql('text', 3)}) AS g(ngram)
GROUP BY g.ngram
"""


TRIGRAMS_ORACLE = _trigrams_oracle()


BIGRAMS_TOPK_ORACLE = f"""
SELECT bigram, cnt FROM ({BIGRAMS_ORACLE})
ORDER BY cnt DESC, bigram ASC LIMIT 25
"""
