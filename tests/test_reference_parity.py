"""Oracle-parity tests for the reference query library (SURVEY.md §2.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from honors_p1_mapreduce_spark import registry
from honors_p1_mapreduce_spark.operators.inverted_index import (
    inverted_index_from_lines,
)

from .oracle import compare_query

# every registered oracle-backed query (wordcount has its own golden
# test; new queries get parity coverage automatically on registration)
PARITY = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", PARITY)
def test_oracle_parity(spark, sf_dir, name):
    compare_query(spark, sf_dir, registry.QUERIES[name], registry.ORACLES[name])


def test_inverted_index_golden(spark):
    # reference semantics: skip malformed lines, drop len<=2 words,
    # distinct sorted doc ids (mr/examples/inverted_index/*)
    lines = spark.createDataFrame(
        [
            ("doc2: spark spark engine",),
            ("doc1: engine of spark",),
            ("malformed line without separator -- skipped? no colon",),
            ("doc3: ab of xy",),  # all words len<=2 -> contributes nothing
        ],
        ["value"],
    )
    out = {r["word"]: r["doc_ids"] for r in inverted_index_from_lines(spark, lines).collect()}
    assert out == {"spark": "doc1,doc2", "engine": "doc1,doc2"}


def test_dedup_minhash_rows_only(spark, sf_dir):
    # rows-only check (no SQL oracle): deterministic across two runs
    df1 = registry.QUERIES["dedup_minhash"](spark, sf_dir)
    r1 = sorted(tuple(r) for r in df1.collect())
    r2 = sorted(tuple(r) for r in registry.QUERIES["dedup_minhash"](spark, sf_dir).collect())
    assert r1 == r2
    for _, _, est in r1:
        assert 0.0 <= est <= 1.0


def test_minhash_estimates_track_true_jaccard(spark, sf_dir):
    """MinHash est within a loose band of true shingle Jaccard on real pairs."""
    from honors_p1_mapreduce_spark.operators import dedup as dd

    true_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(spark, sf_dir, threshold=0.0)
        .filter(F.col("jaccard") >= 0.3)
        .collect()
    }
    if not true_pairs:
        pytest.skip("no high-jaccard pairs at this sf")
    est_pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dd.dedup_minhash_pairs(spark, sf_dir, threshold=0.0).collect()
    }
    found = sum(1 for p in true_pairs if p in est_pairs)
    assert found >= len(true_pairs) * 0.5  # LSH recall on strong pairs
