#!/usr/bin/env python
"""Probe: incremental pair-count maintenance vs full per-round
recompute for BPE training (operators/bpe.py).

Round 5 shipped a trainer that re-exploded the ENTIRE vocab into pair
rows every merge round — fine at the demo's 10 merges, 32 K full
shuffles at a production 32 K-merge run. Round 6 delta-maintains the
pair-count frame above ``BPE_INCREMENTAL_MIN_VOCAB`` words. This
probe measures both strategies on two corpora:

1. the sf0.01 documents corpus — vocab of ~31 words, where the delta
   machinery's fixed per-round job overhead LOSES to the trivial
   full explode (which is why the trainer is hybrid);
2. a synthetic realistic-vocabulary corpus (150 K distinct words,
   zipf-ish counts) — where the full per-round explode dominates and
   delta maintenance wins; also records the per-round touched-vocab
   fraction, the quantity incremental cost scales with.

Asserts trajectory identity between the strategies on both corpora.
Prints one JSON line.
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from honors_p1_mapreduce_spark.operators.bpe import (  # noqa: E402
    _pair_counts,
    _SEP,
    _wrap_chars,
    bpe_train_merges_from,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402
from honors_p1_mapreduce_spark.sources.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
N_MERGES = 20
SYN_VOCAB = 150_000


def synthetic_docs(spark):
    """150 K distinct random words, zipf-ish counts, one word per doc
    row — the trainer re-derives (word, cnt) by tokenizing, so word
    frequency is carried by row repetition of the head words."""
    rng = random.Random(7)
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(rng.choice(letters) for _ in range(rng.randint(5, 12)))
        for _ in range(SYN_VOCAB)
    ]
    rows = [(i, w) for i, w in enumerate(words)]
    # head words repeated so top pairs are non-degenerate
    rows += [(SYN_VOCAB + j, words[j % 500]) for j in range(20_000)]
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(32)


def timed_train(spark, docs, incremental):
    t0 = time.perf_counter()
    out = [
        tuple(r)
        for r in bpe_train_merges_from(
            spark, docs, n_merges=N_MERGES, incremental=incremental
        ).collect()
    ]
    return out, round(time.perf_counter() - t0, 2)


def touched_fractions(spark, docs):
    """Instrumented incremental loop: per-round touched-vocab share."""
    vocab = (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z0-9_]+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select(_wrap_chars(F.col("word")).alias("w"), "cnt")
        .localCheckpoint()
    )
    n_vocab = vocab.count()
    n_parts = vocab.rdd.getNumPartitions()
    counts = _pair_counts(vocab).localCheckpoint()
    fracs = []
    for _ in range(N_MERGES):
        row = counts.orderBy(F.desc("total"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not row:
            break
        a, b = row[0]["a"], row[0]["b"]
        pat = f"{_SEP}{a}{_SEP}{_SEP}{b}{_SEP}"
        touched = vocab.filter(F.col("w").contains(pat))
        fracs.append(round(touched.count() / n_vocab, 5))
        merged = touched.select(
            F.expr(
                f"replace(w, '{_SEP}{a}{_SEP}{_SEP}{b}{_SEP}', '{_SEP}{a}{b}{_SEP}')"
            ).alias("w"),
            "cnt",
        )
        delta = _pair_counts(touched).select(
            "a", "b", (-F.col("total")).alias("total")
        ).unionAll(_pair_counts(merged))
        counts = (
            counts.unionAll(delta)
            .groupBy("a", "b")
            .agg(F.sum("total").alias("total"))
            .filter(F.col("total") > 0)
            .localCheckpoint()
        )
        vocab = (
            vocab.filter(~F.col("w").contains(pat))
            .unionAll(merged)
            .coalesce(n_parts)
            .localCheckpoint()
        )
    return fracs


def main() -> None:
    spark = get_spark(app_name="probe_bpe_incremental")
    out = {"probe": "bpe_incremental", "n_merges": N_MERGES}

    docs_small = load_table(spark, SF_DIR, "documents")
    m_inc, t_inc = timed_train(spark, docs_small, incremental=True)
    m_full, t_full = timed_train(spark, docs_small, incremental=False)
    assert m_inc == m_full, "small-corpus trajectory mismatch"
    out["small_corpus"] = {
        "sf_dir": SF_DIR,
        "incremental_s": t_inc,
        "full_recompute_s": t_full,
        "winner": "full_recompute" if t_full < t_inc else "incremental",
    }

    docs_big = synthetic_docs(spark).localCheckpoint()
    m_inc, t_inc = timed_train(spark, docs_big, incremental=True)
    m_full, t_full = timed_train(spark, docs_big, incremental=False)
    assert m_inc == m_full, "big-corpus trajectory mismatch"
    fracs = touched_fractions(spark, docs_big)
    out["big_corpus"] = {
        "distinct_words": SYN_VOCAB,
        "incremental_s": t_inc,
        "full_recompute_s": t_full,
        "speedup": round(t_full / t_inc, 2),
        "winner": "full_recompute" if t_full < t_inc else "incremental",
        "touched_vocab_fraction": fracs,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
