"""Curation-operator semantics on synthetic frames (oracle parity on
the driver corpus is covered by test_reference_parity via the
registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from honors_p1_mapreduce_spark.operators import curation as cu


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_contamination_flags_copied_eval_text(spark):
    # doc 20 is eval (20 % 20 == 0); doc 1 embeds its text verbatim,
    # doc 2 shares nothing.
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [
            (20, eval_text),
            (1, f"intro words {eval_text} closing remarks here"),
            (2, "completely different content with no shared phrases at all ok"),
        ],
    )
    out = cu.contamination_check_from(docs, n=5, min_overlap=3).collect()
    assert [(r["train_doc"], r["eval_doc"]) for r in out] == [(1, 20)]
    # doc 1 contains every eval 5-gram -> full coverage
    assert out[0]["coverage"] == 1.0


def test_contamination_df_cap_drops_boilerplate(spark):
    # the same boilerplate sentence appears in eval and MANY train
    # docs; with df_cap below that document frequency, no pair fires.
    boiler = "this document is provided as is without any warranty whatsoever"
    docs = _docs(spark, [(20, boiler)] + [(i, boiler) for i in range(1, 6)])
    out = cu.contamination_check_from(docs, n=5, min_overlap=1, df_cap=3)
    assert out.count() == 0


def test_bloom_prefilter_matches_exact_contamination(spark, sf_dir):
    """r15 library surface: the Bloom-prefiltered contamination path
    must produce EXACTLY contamination_check's rows (false positives
    cancel in the shared exact tail) and pass the shared oracle —
    the bloom_pruned_join filter-cancels-out proof pattern applied to
    the decontamination family."""
    from .oracle import compare_query

    exact = {
        (r["train_doc"], r["eval_doc"], r["n_overlap"], r["coverage"])
        for r in cu.contamination_check(spark, sf_dir).collect()
    }
    bloom = {
        (r["train_doc"], r["eval_doc"], r["n_overlap"], r["coverage"])
        for r in cu.decontaminate_bloom_prefilter(spark, sf_dir).collect()
    }
    assert exact == bloom and exact  # equal AND non-trivial
    compare_query(
        spark,
        sf_dir,
        cu.decontaminate_bloom_prefilter,
        cu.DECONTAMINATE_BLOOM_PREFILTER_ORACLE,
    )


def test_containment_pairs_directional_golden(spark, sf_dir):
    """The doc-in-doc detector: a short doc quoted wholesale inside a
    long one must emit (inner=short, outer=long) with containment 1.0
    and NOT the reverse direction (whose containment is the small
    fraction Jaccard would also report); oracle parity on the driver
    corpus closes the loop."""
    from .oracle import compare_query

    from honors_p1_mapreduce_spark.operators import dedup as dd

    inner = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    outer = (
        "intro passage before the quote "
        + inner
        + " and a long closing discussion follows with many more"
        " unrelated tokens trailing the quotation to dilute jaccard"
        " far below any symmetric threshold used here"
    )
    docs = spark.createDataFrame(
        [(1, inner), (2, outer), (3, "nothing shared with the others at all")],
        ["doc_id", "text"],
    )
    rows = {
        (r["inner_doc"], r["outer_doc"]): r["containment"]
        for r in dd.containment_pairs_from(docs, n=5, threshold=0.5).collect()
    }
    assert rows == {(1, 2): 1.0}
    # full mutual near-dups legitimately emit BOTH directions
    dup = spark.createDataFrame(
        [(1, inner), (2, inner)], ["doc_id", "text"]
    )
    both = {
        (r["inner_doc"], r["outer_doc"])
        for r in dd.containment_pairs_from(dup, n=5, threshold=0.5).collect()
    }
    assert both == {(1, 2), (2, 1)}
    compare_query(
        spark, sf_dir, dd.containment_pairs, dd.CONTAINMENT_ORACLE
    )


def test_contamination_stored_cycle_matches_online(spark, sf_dir, tmp_path):
    """The stored-registry cycle must be bit-identical to the online
    scan on the same corpus (md5-hex shingles survive parquet
    losslessly; the informative-key set freezes at build), so the
    SAME oracle gates both paths — exact-tier lifecycle parity with
    decontaminate_stored and the media *_decontaminate_stored
    cycles. Serving from the index must not re-tokenize eval (the
    plan reads the parquet registry, pinned by the scan count)."""
    from .oracle import compare_query

    idx = str(tmp_path / "contam_idx")
    cu.contamination_write_index(spark, sf_dir, idx)
    online = sorted(
        map(tuple, cu.contamination_check(spark, sf_dir).collect())
    )
    served = sorted(
        map(tuple, cu.contamination_from_index(spark, sf_dir, idx).collect())
    )
    assert online == served and online  # bit-identical AND non-trivial
    compare_query(
        spark, sf_dir, cu.contamination_stored, cu.CONTAMINATION_STORED_ORACLE
    )


def test_streaming_contamination_matches_batch(spark, sf_dir, tmp_path):
    """Draining the document stream's train split through the
    per-micro-batch scan against the STORED benchmark registry must
    reproduce the batch contamination_from_index answer exactly —
    the informative-key set and eval sizes are frozen in the index,
    so per-doc output depends only on the static registry and
    micro-batch boundaries cannot matter."""
    from honors_p1_mapreduce_spark.streaming.curation import (
        read_contamination_from_store,
        streaming_contamination,
    )

    idx = str(tmp_path / "contam_idx")
    store = str(tmp_path / "flagged")
    ckpt = str(tmp_path / "contam_ckpt")
    cu.contamination_write_index(spark, sf_dir, idx)
    streaming_contamination(spark, sf_dir, idx, store, ckpt)
    streamed = sorted(
        map(tuple, read_contamination_from_store(spark, store).collect())
    )
    batch = sorted(
        map(tuple, cu.contamination_from_index(spark, sf_dir, idx).collect())
    )
    assert streamed == batch and streamed  # equal AND non-vacuous


def test_repetition_signals_detect_loops(spark):
    docs = _docs(
        spark,
        [
            (1, "spam ham " * 30),  # one bigram dominates
            (2, " ".join(f"w{i}" for i in range(40))),  # all distinct
            (3, "single"),  # <2 tokens -> zeroed features
        ],
    )
    rows = {r["doc_id"]: r for r in cu.repetition_signals_from(docs).collect()}
    assert rows[1]["top_bigram_frac"] > 0.4
    assert rows[1]["dup_trigram_frac"] > 0.9
    # distinct tokens: every bigram/trigram unique
    assert rows[2]["top_bigram_frac"] == 1.0 / rows[2]["n_bigrams"]
    assert rows[2]["dup_trigram_frac"] == 0.0
    assert rows[3]["n_bigrams"] == 0
    assert rows[3]["top_bigram_frac"] == 0.0


def test_pii_scrub_removes_injected_and_inline_pii(spark):
    docs = _docs(
        spark,
        [(1, "mail me at someone@corp.example.org or ping 192.168.1.77 today")],
    )
    out = cu.pii_scrub_from(docs).collect()[0]
    # 1 inline + 1 injected of each kind
    assert out["n_emails"] == 2
    assert out["n_ipv4"] == 2
    # scrubbing is idempotent and actually removed the originals:
    # rebuild the salted text and check the digest differs from raw
    scrubbed = (
        cu.pii_scrub_from(docs)
        .select("scrubbed_md5")
        .collect()[0]["scrubbed_md5"]
    )
    raw_salted_md5 = (
        _docs(spark, [(1, "mail me at someone@corp.example.org or ping 192.168.1.77 today")])
        .select(
            F.md5(
                F.concat(
                    F.col("text"),
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".7"),
                )
            ).alias("m")
        )
        .collect()[0]["m"]
    )
    assert scrubbed != raw_salted_md5


def test_pii_scrub_is_case_insensitive(spark):
    # mixed/upper-case PII must be counted and redacted, not leaked
    docs = _docs(
        spark,
        [(1, "reach John.Doe@Example.COM or MIXED@Sub.Domain.Org please")],
    )
    out = cu.pii_scrub_from(docs).collect()[0]
    assert out["n_emails"] == 3  # 2 inline mixed-case + 1 injected
    # the scrubbed digest must not contain the mixed-case address: scrub
    # manually and compare digests
    expected = (
        docs.select(
            F.md5(
                F.regexp_replace(
                    F.regexp_replace(
                        F.concat(
                            F.col("text"),
                            F.lit(" contact user"),
                            F.col("doc_id").cast("string"),
                            F.lit("@example.com from 10.0."),
                            (F.col("doc_id") % 256).cast("string"),
                            F.lit(".7"),
                        ),
                        cu.EMAIL_RE,
                        "<EMAIL>",
                    ),
                    cu.IPV4_RE,
                    "<IP>",
                )
            ).alias("m")
        ).collect()[0]["m"]
    )
    assert out["scrubbed_md5"] == expected
    # and the pattern itself catches the canonical mixed-case example
    import re as _re

    assert _re.fullmatch(cu.EMAIL_RE, "John.Doe@Example.COM")


def test_importance_sample_contract(spark, sf_dir):
    """Quality-weighted sampling: p_keep respects the proportional
    rule, realized keep rate lands near the target, kept docs have
    higher mean quality than the corpus, and decisions are
    deterministic across runs."""
    from pyspark.sql import functions as F

    from honors_p1_mapreduce_spark.operators.importance import (
        IMPORTANCE_RATE,
        importance_sample,
    )

    out = importance_sample(spark, sf_dir)
    r = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("kept").cast("int")).alias("k"),
        F.avg("quality").alias("mq"),
        F.avg(F.when(F.col("kept"), F.col("quality"))).alias("mkq"),
        F.max("p_keep").alias("maxp"),
        F.min("p_keep").alias("minp"),
    ).collect()[0]
    assert 0.0 <= r["minp"] and r["maxp"] <= 1.0
    assert abs(r["k"] / r["n"] - IMPORTANCE_RATE) < 0.1  # realized ~ target
    assert r["mkq"] > r["mq"]  # the uplift the sampler exists for
    a = sorted(tuple(x) for x in out.collect())
    b = sorted(tuple(x) for x in importance_sample(spark, sf_dir).collect())
    assert a == b


def test_importance_sample_matches_python_reference(spark, sf_dir):
    """Independent recompute of p_keep and the md5-uniform keep
    decision in pure Python over the engine's own quality values —
    breaks Spark/DuckDB correlated-failure risk for the sampling
    arithmetic (mean, clamp, hash threshold)."""
    import hashlib

    from honors_p1_mapreduce_spark.operators.importance import (
        IMPORTANCE_RATE,
        IMPORTANCE_SEED,
        importance_sample,
    )
    from honors_p1_mapreduce_spark.operators.text_analysis import quality_score

    q = {r["doc_id"]: r["quality"] for r in quality_score(spark, sf_dir).collect()}
    from decimal import Decimal

    mean_q = float(
        sum(Decimal(str(round(v, 8))).quantize(Decimal("1e-8")) for v in q.values())
    ) / len(q)
    # NB: python round-half-even at 1e-8 == both engines' decimal cast
    got = {
        r["doc_id"]: (r["p_keep"], r["kept"])
        for r in importance_sample(spark, sf_dir).collect()
    }
    for doc_id, quality in q.items():
        p = min(IMPORTANCE_RATE * quality / mean_q, 1.0)
        h = hashlib.md5(f"{IMPORTANCE_SEED}{doc_id}".encode()).hexdigest()
        u = int(h[:8], 16) / 4294967296.0
        assert abs(got[doc_id][0] - p) < 1e-12, doc_id
        assert got[doc_id][1] == (u < p), doc_id


def test_sample_exact_k_contract(spark, sf_dir):
    """Exactly k rows, deterministic across runs, a subset relation
    under growing k, and a TakeOrdered plan (no global sort)."""
    from honors_p1_mapreduce_spark.operators.pipeline import sample_exact_k
    from honors_p1_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    s100 = sample_exact_k(docs, 100)
    ids1 = {r["doc_id"] for r in s100.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in sample_exact_k(docs, 100).select("doc_id").collect()}
    assert len(ids1) == 100 and ids1 == ids2
    ids200 = {r["doc_id"] for r in sample_exact_k(docs, 200).select("doc_id").collect()}
    assert ids1 <= ids200
    plan = s100._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_lm_stored_model_roundtrip_bit_identical(spark, sf_dir, tmp_path):
    """The stored-model cycle (train -> parquet score table ->
    read-back -> score) must reproduce the online lm_interp_score
    BIT-identically on the training corpus — ppm scores are exact
    integers, so the parquet roundtrip is lossless."""
    from honors_p1_mapreduce_spark.operators.lm_quality import (
        lm_interp_score,
        lm_score_with,
        lm_write_model,
    )

    d = str(tmp_path / "lm_model")
    lm_write_model(spark, sf_dir, d)
    stored = sorted(map(tuple, lm_score_with(spark, sf_dir, d).collect()))
    online = sorted(map(tuple, lm_interp_score(spark, sf_dir).collect()))
    assert stored == online
    assert stored  # non-vacuous
    # the artifact really is the model: |bigram vocab| rows, int scores
    model = spark.read.parquet(d + "/bigram_scores")
    assert model.columns == ["bg", "pi_ppm"]
    assert model.count() == model.select("bg").distinct().count()
