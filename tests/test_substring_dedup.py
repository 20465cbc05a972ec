"""Golden + invariant tests for duplicated-substring span detection
(operators/substring_dedup.py; oracle parity runs via the registry
sweep in test_reference_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from honors_p1_mapreduce_spark.operators.substring_dedup import (
    SPAN_K,
    substring_spans_from,
)


def _spans(spark, rows, **kw):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substring_spans_from(docs, **kw).collect()
    }


def test_shared_substring_is_found_exactly(spark):
    shared = " ".join(f"tok{i}" for i in range(12))  # 12-token duplicate
    rows = [
        (1, f"alpha beta {shared} gamma delta epsilon zeta eta theta"),
        (2, f"one two three four five six {shared} seven eight nine ten"),
        (3, "completely unrelated text with no overlap at all here now"),
    ]
    out = _spans(spark, rows)
    # doc 1: shared occupies token positions 2..13; doc 2: 6..17
    assert (1, 2, 13) in out
    assert (2, 6, 17) in out
    assert not any(d == 3 for d, _, _ in out)


def test_below_k_duplicates_are_ignored(spark):
    shared = " ".join(f"tok{i}" for i in range(SPAN_K - 1))  # k-1 tokens
    rows = [
        (1, f"alpha beta {shared} gamma"),
        (2, f"{shared} zeta eta theta iota kappa"),
    ]
    assert _spans(spark, rows) == set()


def test_overlapping_hits_merge_into_one_span(spark):
    # a 2k-token duplicate produces k+1 overlapping gram hits per doc
    # that must merge to ONE maximal span, not k+1 fragments
    shared = " ".join(f"tok{i}" for i in range(2 * SPAN_K))
    rows = [(1, f"x y {shared}"), (2, f"{shared} p q r")]
    out = _spans(spark, rows)
    assert out == {(1, 2, 2 * SPAN_K + 1), (2, 0, 2 * SPAN_K - 1)}


def test_within_doc_repeat_alone_is_not_cross_doc(spark):
    # the same k-gram twice in ONE doc only -> not duplicated across
    # documents (min_docs counts DISTINCT docs)
    shared = " ".join(f"tok{i}" for i in range(SPAN_K))
    rows = [
        (1, f"{shared} middle words here {shared}"),
        (2, "totally different content in this document entirely okay"),
    ]
    assert _spans(spark, rows) == set()


# ---- hypothesis differential vs a pure-Python reference ------------
# the DuckDB oracle re-expresses the SAME algorithm in SQL, so a shared
# misconception would pass both; this reference is an independent
# reimplementation (dict-of-sets + linear merge), breaking that
# correlation.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

DOC = st.lists(st.sampled_from("abcde"), min_size=0, max_size=14)
CORPUS = st.lists(DOC, min_size=2, max_size=6)


def _expected_spans(docs: list[list[str]], k: int, min_docs: int):
    gram_docs: dict[tuple, set[int]] = {}
    for i, toks in enumerate(docs):
        for p in range(len(toks) - k + 1):
            gram_docs.setdefault(tuple(toks[p : p + k]), set()).add(i)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= min_docs}
    out = set()
    for i, toks in enumerate(docs):
        hits = [p for p in range(len(toks) - k + 1) if tuple(toks[p : p + k]) in dup]
        j = 0
        while j < len(hits):
            start = hits[j]
            end = hits[j]
            while j + 1 < len(hits) and hits[j + 1] <= hits[j] + k:
                j += 1
                end = hits[j]
            out.add((i, start, end + k - 1))
            j += 1
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(CORPUS)
def test_spans_match_python_reference(spark, corpus):
    k = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substring_spans_from(docs, k=k).collect()
    }
    assert got == _expected_spans(corpus, k=3, min_docs=2)


# --------------------- corpus rewrite: dedup_substring_cut (r14)


def _cut(spark, rows, **kw):
    from honors_p1_mapreduce_spark.operators.substring_dedup import (
        substring_cut_from,
    )

    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["cleaned_text"])
        for r in substring_cut_from(docs, **kw).collect()
    }


def test_cut_removes_every_occurrence_and_keeps_the_rest(spark):
    shared = " ".join(f"tok{i}" for i in range(12))
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"one two three {shared} four five"),
        (3, "unrelated text with no overlap at all"),
    ]
    got = _cut(spark, rows)
    # the duplicated run is cut from BOTH docs (mask semantics —
    # docstring), surrounding unique tokens survive in order
    assert got[1] == (16, 12, "alpha beta gamma delta")
    assert got[2] == (17, 12, "one two three four five")
    # an untouched doc passes through byte-identical
    assert got[3] == (7, 0, "unrelated text with no overlap at all")


def test_cut_entirely_duplicated_doc_cleans_to_empty(spark):
    shared = " ".join(f"tok{i}" for i in range(SPAN_K + 2))
    rows = [(1, shared), (2, f"{shared} trailing unique words here")]
    got = _cut(spark, rows)
    assert got[1] == (SPAN_K + 2, SPAN_K + 2, "")
    assert got[2] == (
        SPAN_K + 6,
        SPAN_K + 2,
        "trailing unique words here",
    )


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(CORPUS)
def test_cut_matches_python_reference(spark, corpus):
    """The rewrite is exactly 'drop every token inside an expected
    span' — pinned against the same python span reference the span
    finder uses, token by token."""
    from honors_p1_mapreduce_spark.operators.substring_dedup import (
        substring_cut_from,
    )

    k = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["cleaned_text"])
        for r in substring_cut_from(docs, k=k).collect()
    }
    spans = _expected_spans(corpus, k=k, min_docs=2)
    for i, toks in enumerate(corpus):
        cut = set()
        for d, s, e in spans:
            if d == i:
                cut.update(range(s, e + 1))
        kept = [t for p, t in enumerate(toks) if p not in cut]
        assert got[i] == (len(toks), len(cut), " ".join(kept))


def test_cut_oracle_parity(spark, sf_dir):
    from honors_p1_mapreduce_spark.operators.substring_dedup import (
        DEDUP_SUBSTRING_CUT_ORACLE,
        dedup_substring_cut,
    )
    from tests.oracle import compare_query

    compare_query(
        spark, sf_dir, dedup_substring_cut, DEDUP_SUBSTRING_CUT_ORACLE
    )


def test_cut_stored_cycle_is_bit_identical_to_online(spark, sf_dir):
    """The stored cycle (duplicated grams -> parquet -> read back ->
    rewrite) must reproduce the online cut exactly — int64 gram
    hashes survive parquet losslessly, so one oracle gates both
    registered paths (the bpe/pq/winnow/media registered-cycle
    pattern)."""
    from honors_p1_mapreduce_spark.operators.substring_dedup import (
        dedup_substring_cut,
        dedup_substring_cut_stored,
    )

    online = {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["cleaned_text"])
        for r in dedup_substring_cut(spark, sf_dir).collect()
    }
    stored = {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["cleaned_text"])
        for r in dedup_substring_cut_stored(spark, sf_dir).collect()
    }
    assert online == stored
    assert any(v[1] > 0 for v in online.values())  # non-vacuous
