"""Q3 inverted index (SURVEY.md §2.3 Q3).

Reference semantics (mr/examples/inverted_index/mapper.py:21-37,
reducer.py:23-26): per-document tokenize lowercased content, dedup
within the doc, drop words of length <= 2, output
``word -> sorted distinct doc ids joined by ','``.

The driver's ``documents`` table is already (doc_id, text), so the
reference's ``doc_id: content`` line-parsing step appears only in the
text-file variant (``inverted_index_from_lines``), including its
skip-malformed-lines rule.

Scale shape: explode -> distinct(word, doc_id) is a partial-agg'd
shuffle; collect_set is bounded by docs-per-word. The string join is
done AFTER sort_array so output is deterministic (the reference
reducer sorts too). doc_ids sort numerically (they are bigints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_col, tokens_sql
from ..sources.tables import load_table


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.col("doc_id"), F.explode(tokens_col("text")).alias("word"))
        .filter(F.length("word") > 2)
        .groupBy("word")
        .agg(
            F.array_join(F.array_sort(F.collect_set("doc_id")), ",").alias("doc_ids"),
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
        )
    )


INVERTED_INDEX_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, t.word AS word
  FROM documents, unnest({tokens_sql('text')}) AS t(word)
  WHERE length(t.word) > 2
)
SELECT word,
       array_to_string(list_sort(list_distinct(list(doc_id))), ',') AS doc_ids,
       count(DISTINCT doc_id) AS n_docs
FROM tok GROUP BY word
"""


def inverted_index_from_lines(spark: SparkSession, lines: DataFrame) -> DataFrame:
    """Reference-exact variant over DataFrame[value: string] lines shaped
    ``doc_id: content``; malformed lines (no ':') are skipped
    (mr/examples/inverted_index/mapper.py:23-25)."""
    parsed = (
        lines.filter(F.col("value").contains(":"))
        .select(
            F.trim(F.substring_index("value", ":", 1)).alias("doc_id"),
            F.expr("substring(value, instr(value, ':') + 1)").alias("content"),
        )
        .filter(F.col("doc_id") != "")
    )
    return (
        parsed.select("doc_id", F.explode(tokens_col("content")).alias("word"))
        .filter(F.length("word") > 2)
        .groupBy("word")
        .agg(F.array_join(F.array_sort(F.collect_set("doc_id")), ",").alias("doc_ids"))
    )
