"""Winnowing fingerprint properties (oracle parity is covered by
test_reference_parity via the registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from honors_p1_mapreduce_spark.operators import winnow as wn


def _fps(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return wn.winnow_fingerprints_from(df)


def test_winnowing_match_guarantee(spark):
    # Schleimer et al.: a shared substring of length >= W + K - 1
    # guarantees at least one shared fingerprint. The two docs share a
    # long middle run with different prefixes/suffixes.
    shared = "the quick brown fox jumps over the lazy dog again and again"
    fps = _fps(
        spark,
        [(1, f"alpha beta {shared} gamma delta"), (2, f"zeta eta {shared} theta")],
    )
    a = {r["fp_hash"] for r in fps.filter(F.col("doc_id") == 1).collect()}
    b = {r["fp_hash"] for r in fps.filter(F.col("doc_id") == 2).collect()}
    assert a & b


def test_winnowing_density(spark):
    # expected fingerprint density ~ 2/(W+1) of gram positions; allow
    # a wide band (the bound is asymptotic, text is small)
    text = " ".join(f"token{i} filler words here" for i in range(200))
    fps = _fps(spark, [(1, text)])
    n_fp = fps.count()
    n_grams = len("".join(c for c in text.lower() if c.isalnum())) - wn.K + 1
    density = n_fp / n_grams
    assert 0.5 * 2 / (wn.W + 1) <= density <= 2.5 * 2 / (wn.W + 1)


def test_short_docs_emit_nothing(spark):
    # fewer normalized chars than one full window -> no fingerprints
    fps = _fps(spark, [(1, "tiny doc"), (2, "x" * (wn.K + wn.W - 2))])
    assert fps.count() == 0


def test_oversized_docs_truncate_to_prefix(spark, monkeypatch):
    # docs longer than the pos-encoding capacity are deterministically
    # truncated to the prefix, never fingerprinted with corrupted
    # (pos-bleeds-into-hash) encodings. Shrink the cap to keep the
    # test cheap; the arithmetic is scale-independent.
    long_text = "".join(f"word{i} " for i in range(400))  # ~2.8k normalized chars
    cap = 100
    monkeypatch.setattr(wn, "_MAX_NORM_CHARS", cap)
    capped = {
        (r["fp_hash"], r["fp_pos"])
        for r in _fps(spark, [(1, long_text)]).collect()
    }
    # manually pre-truncated doc must produce the identical set
    norm_prefix = "".join(c for c in long_text.lower() if c.isalnum())[:cap]
    manual = {
        (r["fp_hash"], r["fp_pos"])
        for r in _fps(spark, [(1, norm_prefix)]).collect()
    }
    assert capped == manual
    assert capped  # prefix is long enough to emit fingerprints
    # every pos fits the (shrunk) prefix
    assert all(pos <= cap - wn.K for _, pos in capped)


def test_neardup_agrees_with_minhash_family(spark, sf_dir):
    # winnowing's near-dup verdicts should largely coincide with the
    # n-gram Jaccard detector on the same corpus
    from honors_p1_mapreduce_spark.operators import dedup as dd

    jac = {
        (r["doc_a"], r["doc_b"])
        for r in dd.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    win = {
        (r["doc_a"], r["doc_b"])
        for r in wn.winnow_neardup(spark, sf_dir).collect()
    }
    if not jac:
        return
    overlap = len(jac & win) / len(jac)
    assert overlap >= 0.6, f"winnow/jaccard overlap {overlap:.2f}"
