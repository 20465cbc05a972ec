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


def test_bpe_incremental_matches_full_recompute(spark):
    """The delta-maintained pair-count path (auto-selected only above
    BPE_INCREMENTAL_MIN_VOCAB words in production) must produce the
    bit-identical merge trajectory to full per-round recompute —
    forced here on the classic corpus plus a tie-heavy one."""
    for text in [
        " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3),
        "aaaa aaab abab baba aa ab ba bb aaaa abab",
    ]:
        docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        inc = bpe_train_merges_from(spark, docs, n_merges=6, incremental=True)
        full = bpe_train_merges_from(spark, docs, n_merges=6, incremental=False)
        assert [tuple(r) for r in inc.collect()] == [tuple(r) for r in full.collect()]


def test_bpe_stops_when_fully_merged(spark):
    """A single repeated 2-char word merges once, then no pairs
    remain — the trainer stops early instead of erroring."""
    docs = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
    out = bpe_train_merges_from(spark, docs, n_merges=5).collect()
    assert [(r["merge_left"], r["merge_right"]) for r in out] == [("a", "b")]


# ---- hypothesis differential vs a pure-Python reference ------------
# the DuckDB oracle runs the same dataflow in SQL; this is an
# independent reimplementation (Counter + list rewrite) so a shared
# misconception cannot pass both.

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="abc", min_size=1, max_size=6)
CORPUS = st.lists(WORD, min_size=1, max_size=12)


def _expected_merges(words: list[str], n_merges: int):
    vocab = Counter(words)
    syms = {w: list(w) for w in vocab}
    out = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, cnt in vocab.items():
            s = syms[w]
            for j in range(len(s) - 1):
                counts[(s[j], s[j + 1])] += cnt
        if not counts:
            break
        # tie-break: count DESC, then pair ASC lexicographically
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        (a, b), total = top
        out.append((rank, a, b, total))
        for w in syms:
            s, new, j = syms[w], [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    new.append(a + b)
                    j += 2
                else:
                    new.append(s[j])
                    j += 1
            syms[w] = new
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(CORPUS)
def test_bpe_matches_python_reference(spark, corpus):
    docs = spark.createDataFrame([(1, " ".join(corpus))], ["doc_id", "text"])
    got = [
        (r["merge_rank"], r["merge_left"], r["merge_right"], r["pair_count"])
        for r in bpe_train_merges_from(spark, docs, n_merges=4).collect()
    ]
    assert got == _expected_merges(corpus, 4)
