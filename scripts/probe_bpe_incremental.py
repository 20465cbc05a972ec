#!/usr/bin/env python
"""Probe: incremental pair-count maintenance vs full per-round
recompute for BPE training (operators/bpe.py).

Round 5 shipped a trainer that re-exploded the ENTIRE vocab into
pair rows every merge round — fine at the demo's 10 merges, 32 K
full shuffles at a production 32 K-merge run. Round 6 delta-maintains
the pair-count frame: each round touches only the words containing
the merged pair. This probe measures, on the sf0.01 documents corpus:

1. identical merge trajectories (incremental vs a full-recompute
   twin kept inline here) at N_MERGES;
2. per-round wall time for each, plus the fraction of vocab words
   the incremental round actually touched — the quantity the
   per-round cost now scales with.

Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from honors_p1_mapreduce_spark.functions.text import tokens_col  # noqa: E402
from honors_p1_mapreduce_spark.operators.bpe import (  # noqa: E402
    _pair_counts,
    _SEP,
    _wrap_chars,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402
from honors_p1_mapreduce_spark.sources.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
N_MERGES = 40


def seed_vocab(spark):
    return (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select(_wrap_chars(F.col("word")).alias("w"), "cnt")
        .localCheckpoint()
    )


def train_full(spark, n_merges):
    """The round-5 structure: full pair recompute every round."""
    vocab = seed_vocab(spark)
    merges, round_s = [], []
    for rank in range(1, n_merges + 1):
        t0 = time.perf_counter()
        row = (
            _pair_counts(vocab)
            .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not row:
            break
        a, b, total = row[0]["a"], row[0]["b"], row[0]["total"]
        merges.append((rank, a, b, int(total)))
        vocab = vocab.select(
            F.expr(
                f"replace(w, '{_SEP}{a}{_SEP}{_SEP}{b}{_SEP}', "
                f"'{_SEP}{a}{b}{_SEP}')"
            ).alias("w"),
            "cnt",
        ).localCheckpoint()
        round_s.append(round(time.perf_counter() - t0, 3))
    return merges, round_s


def train_incremental(spark, n_merges):
    """The round-6 trainer, instrumented per round with touched-word
    fraction (same dataflow as bpe_train_merges_from)."""
    vocab = seed_vocab(spark)
    n_vocab = vocab.count()
    counts = _pair_counts(vocab).localCheckpoint()
    merges, round_s, touched_frac = [], [], []
    for rank in range(1, n_merges + 1):
        t0 = time.perf_counter()
        row = (
            counts.orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not row:
            break
        a, b, total = row[0]["a"], row[0]["b"], row[0]["total"]
        merges.append((rank, a, b, int(total)))
        pat = f"{_SEP}{a}{_SEP}{_SEP}{b}{_SEP}"
        touched = vocab.filter(F.col("w").contains(pat))
        n_touched = touched.count()
        merged = touched.select(
            F.expr(
                f"replace(w, '{_SEP}{a}{_SEP}{_SEP}{b}{_SEP}', "
                f"'{_SEP}{a}{b}{_SEP}')"
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
            .localCheckpoint()
        )
        round_s.append(round(time.perf_counter() - t0, 3))
        touched_frac.append(round(n_touched / n_vocab, 4))
    return merges, round_s, touched_frac


def main() -> None:
    spark = get_spark(app_name="probe_bpe_incremental")
    t0 = time.perf_counter()
    m_inc, inc_s, frac = train_incremental(spark, N_MERGES)
    inc_total = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    m_full, full_s = train_full(spark, N_MERGES)
    full_total = round(time.perf_counter() - t0, 2)
    assert m_inc == m_full, (m_inc[:3], m_full[:3])
    print(
        json.dumps(
            {
                "probe": "bpe_incremental",
                "sf_dir": SF_DIR,
                "n_merges": len(m_inc),
                "trajectory_identical": True,
                "incremental_total_s": inc_total,
                "full_recompute_total_s": full_total,
                "speedup": round(full_total / inc_total, 2),
                "incremental_round_s": inc_s,
                "full_round_s": full_s,
                "touched_vocab_fraction": frac,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
