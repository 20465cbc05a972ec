"""Golden tests for distributed BPE merge training (operators/bpe.py;
oracle parity for the full 10-round trajectory runs via the registry
sweep in test_reference_parity.py)."""

from __future__ import annotations

from honors_p1_mapreduce_spark.operators.bpe import bpe_train_merges_from


def test_bpe_classic_merges(spark):
    """The Sennrich et al. worked example: on {low x5, lower x2,
    newest x6, widest x3} the first merge is (e,s) with count 9 (tie
    with (s,t) broken lexicographically) and the second is (es,t)."""
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    out = bpe_train_merges_from(spark, docs, n_merges=3).collect()
    got = [(r["merge_rank"], r["merge_left"], r["merge_right"], r["pair_count"]) for r in out]
    assert got[0] == (1, "e", "s", 9)
    assert got[1] == (2, "es", "t", 9)
    assert len(got) == 3


def test_bpe_greedy_nonoverlap(spark):
    """'aaaa' x3: pair (a,a) counts every adjacent slot (3 per word),
    and applying the merge left-to-right greedily yields (aa)(aa), so
    the next round's top pair is (aa,aa)."""
    docs = spark.createDataFrame([(1, "aaaa aaaa aaaa")], ["doc_id", "text"])
    out = bpe_train_merges_from(spark, docs, n_merges=2).collect()
    got = [(r["merge_left"], r["merge_right"], r["pair_count"]) for r in out]
    assert got[0] == ("a", "a", 9)   # 3 adjacent pairs x 3 occurrences
    assert got[1] == ("aa", "aa", 3)


def test_bpe_stops_when_fully_merged(spark):
    """A single repeated 2-char word merges once, then no pairs
    remain — the trainer stops early instead of erroring."""
    docs = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
    out = bpe_train_merges_from(spark, docs, n_merges=5).collect()
    assert [(r["merge_left"], r["merge_right"]) for r in out] == [("a", "b")]
