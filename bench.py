#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced with a cheap action (count on the already-reduced
result) — results are small aggregates, so the measured time is the
real scan/shuffle/agg work, not driver-side row shipping.

Methodology note (round 5): two identical back-to-back runs on
local[32] measured 91.3 s vs 109.6 s total with per-query deltas of
±0.2-1.3 s and NO code change between them — single-run per-query
times at sub-second scales carry ~±30% environmental noise (JVM
warm-up, page cache, CPU contention). Treat cross-round per-query
regressions under ~2x at the sub-2-second scale as noise unless a
plan diff confirms them; the round-4 "relational drift" (e.g.
market_share 1.13 -> 1.72 s) was exactly this — round-5 re-runs of
the same code measured 1.22 s and 1.44 s.

Protocol change (round 8, per the round-7 advisor): the build-once
session memos are reset between timed queries, so every recorded
time — both min-of-two samples — is a COLD run of the full query
including any artifact build. Memo-backed families (bpe_*, pack_*,
winnow_*, similarity_pq_*) therefore read higher than round 7, where
the second sample was a memo hit; compare those against r7's FIRST
samples in BENCH_r07's runs array. A fixed-size calibration shuffle
is timed before/after the suite ("calibration_sec") to normalize the
110-136 s host band.

Round 9 (per the r8 verdict): the headline stays the cold min-of-two,
and a warm pass records per-query WARM times ("warm" in
BENCH_FULL.json: an untimed run builds the query's own memos, the
timed run measures the memo-hit path, memos reset after — the
production artifact-reuse number, order-independent and without
cross-family memo accumulation), so a future protocol change never
again makes rounds non-commensurable. The printed line
also carries "value_normalized": total * (CAL_REF / median
calibration) with CAL_REF = 0.5 s — a host-speed-corrected total
comparable across rounds without archaeology. Round 11 (r10 verdict
#4): the normalizer is the MEDIAN of 2*CAL_SAMPLES samples (5 before
+ 5 after the suite; was mean-of-2, which let one noisy 0.6 s shuffle
move the normalized headline ~10%), and the line records
"calibration_spread_pct" ((q3-q1)/median, the relative INTERQUARTILE
spread — see the rationale at CAL_SPREAD_BOUND_PCT; the r11 advisor
caught this docstring saying (max-min)/median, which reads 2-3x the
printed value on the same samples) as the headline's error bar with
the documented bound CAL_SPREAD_BOUND_PCT — normalized
deltas inside the spread are host noise, not regressions. Read "warm" per-query against the raw
"runs" samples, not against the min-of-two headline: warm is a single
sample, so for non-memo queries it carries single-run noise and only
the memo-backed families (bpe_*, pack_*, winnow_*, similarity_pq_*,
*_stored) are expected to read materially below their cold times.
The warm pass costs one extra untimed run per query; that is the
price of a steady-state number that cannot be perturbed by registry
order or by other families' resident memo blocks.

Round 15 (r14 verdict #5): "value_normalized" now divides by the
median of the NORMALIZER workload (norm_calibration: compute-bound
per-row md5, seconds long, so its own jitter is a few percent — the
short ~0.4 s shuffle it replaces moved three same-tree normalized
totals 23 % apart) and the line carries the normalizer's own IQR
spread + "normalizer_ok" as the normalized headline's error bar. The
short shuffle stays as the pre-flight gate and the historical
"calibration_sec" host band. Pre-r15 value_normalized numbers are NOT
comparable with r15+ ones; the raw "value" is the unbroken series.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

# Every registered query is benched, so BENCH_r{N} is automatically a
# superset of prior rounds as the surface grows. Protocol change
# (round 12, r11 verdict #5): queries are timed in a FIXED CANONICAL
# order — name-sorted — independent of the registry's window rotation.
# Through r11 the bench ran in registry order, so rotation moved every
# query's position each round and the measured position effect (see
# the note at CAL_SPREAD_BOUND_PCT: winnow_index_retract 2.92 s at
# position 1 vs 5.46 s at position ~100, zero code change) leaked into
# cross-round per-query deltas. Name-sorted order pins each query's
# JVM/page-cache context across rounds; a query's position now only
# shifts when a NEIGHBOR (by name) registers, which the round notes
# can call out. r11-vs-r12 per-query deltas are the LAST rotation-
# contaminated comparison; from r12 on, compare like-for-like.
HEADLINE: tuple[str, ...] = tuple(sorted(registry.QUERIES))


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    # r13 verdict #4: three consecutive driver runs produced
    # calibration-invalid suites (IQR 32 %, 35.8 %, 63.1 % > 30 %)
    # discovered only AFTER ~240 s of timed queries. The pre-flight
    # measures the calibration FIRST and refuses to start the suite
    # on a host whose pre-suite spread alone breaks the bound — a
    # ~3 s early abort (distinct exit code, retryable) instead of a
    # wasted invalid suite. Default ON; --no-preflight-gate restores
    # the old behavior for debugging on known-noisy hosts.
    gate = ap.add_mutually_exclusive_group()
    gate.add_argument(
        "--preflight-gate", dest="preflight", action="store_true",
        default=True,
    )
    gate.add_argument(
        "--no-preflight-gate", dest="preflight", action="store_false",
    )
    args = ap.parse_args(argv)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")

    names = [n for n in HEADLINE if n in registry.QUERIES]
    if not names:
        sys.exit("bench: HEADLINE/registry intersection is empty")
    # warm the JVM + parquet footers once so per-query numbers are steady-state
    registry.QUERIES[names[0]](spark, sf_dir).count()

    # Spike guard (round 6, made uniform round 7 per advisor): deep
    # into a 100-query single-JVM run, a RANDOM query occasionally
    # measures 3-14x its steady-state time (multi-second whole-JVM
    # slow window — GC pause / codegen storm; reproduced:
    # similarity_pq_topk 29.3 s and token_len_histogram 9.1 s in
    # full-bench runs vs 4.5 s / 0.65 s on 3 standalone repeats each,
    # a different query spiking each run). The slow window spans
    # back-to-back re-measures, so EVERY query gets a second pass at
    # the END of the bench (temporally separated, after an explicit
    # full GC); min-of-two is the headline. Round 6 re-ran only
    # queries whose first run crossed 0.8 s — the advisor flagged the
    # asymmetric sampling, so the policy is now uniform and both raw
    # samples are recorded under "runs" in BENCH_FULL.json for audit.

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).count()
        secs = time.perf_counter() - t0
        # Cache policy: operators persist() intermediates for their own
        # multi-consumer plans and leave cleanup to the caller that
        # materializes the result; dropping them here keeps a long
        # suite from accumulating executor-memory pressure and keeps
        # per-query timings independent. The build-once session memos
        # (PQ codebooks, BPE merges, word-id maps, winnow fingerprints)
        # survive clearCache by design, so they are reset explicitly —
        # otherwise the min-of-two second pass of every memo-backed
        # query measures memo lookup, not the query, and first-run
        # times depend on registry order (round-7 advisor finding).
        # Headline numbers are therefore COLD per-query times.
        spark.catalog.clearCache()
        registry.reset_memos()
        return secs

    def calibration() -> float:
        """Fixed-size shuffle job timed as a host-speed scalar: a
        constant 32M-row range, hash-aggregated over 1024 keys across
        32 shuffle partitions. Identical work every run, independent
        of SF, so cross-round per-query deltas can be read against
        the host band (round-7 verdict asked for this — totals
        wobbled 110-136 s across identical trees)."""
        from pyspark.sql import functions as F

        t0 = time.perf_counter()
        (
            spark.range(0, 32_000_000, 1, 32)
            .groupBy((F.col("id") % 1024).alias("k"))
            .count()
            .count()
        )
        return round(time.perf_counter() - t0, 3)

    def norm_calibration() -> float:
        """The NORMALIZER workload (r15, r14 verdict #5): the short
        shuffle above is ~0.35-0.8 s of mostly fixed scheduling +
        shuffle-setup overhead — three calibration-valid runs of
        essentially the same tree normalized 23 % apart because
        ``value_normalized`` divided by that one noisy scalar
        (149.5/278.5/342.6 across the r13-r14 artifacts). Measured on
        this host: growing the shuffle's row count 8x moved its median
        ~10 % (schedule-bound, not compute-bound), so a longer SHUFFLE
        is not a steadier normalizer — a longer COMPUTE is. This shape
        is per-row md5 over a codegen'd range: linear CPU work that
        runs seconds long, so per-sample jitter (GC pauses, scheduling
        gaps) is amortized to a few percent instead of ~25 %. The
        short shuffle stays as the pre-flight gate (its job is a ~3 s
        abort on noisy hosts) and as the historical host band;
        ``value_normalized`` divides by THIS workload's median, with
        the normalizer's own IQR spread printed next to it."""
        from pyspark.sql import functions as F

        t0 = time.perf_counter()
        (
            spark.range(0, NORM_CAL_ROWS, 1, 32)
            .select(F.md5(F.col("id").cast("string")).alias("h"))
            .groupBy(F.substring("h", 1, 2).alias("k"))
            .agg(F.count("*").alias("c"), F.max("h").alias("m"))
            .count()
        )
        return round(time.perf_counter() - t0, 3)

    def timed_warm(name: str) -> float:
        # warm = the query's OWN artifacts already built (production
        # steady state): one untimed run builds the memos, the timed
        # run measures the memo-hit path, then memos reset. Isolating
        # per query keeps the number order-independent and stops ALL
        # families' memo blocks accumulating across the 140+-query
        # pass — the first r9 protocol (leave every memo in place)
        # measured a 38.5 s "warm" for a 0.85 s query because the
        # whole suite's checkpoint blocks were resident at once.
        registry.QUERIES[name](spark, sf_dir).count()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).count()
        secs = time.perf_counter() - t0
        spark.catalog.clearCache()
        registry.reset_memos()
        return secs

    def timed_stages() -> dict[str, dict[str, float]]:
        # Stage attribution for the train-included stored cycles (r9
        # verdict #7): the most expensive bench entries are cold
        # train+write+serve composites, so a round-over-round
        # regression needs to know WHICH stage moved. Each family's
        # stages run cold (memos reset before), sequentially, against
        # the same artifact dir the registered query uses; the splits
        # are metadata only — the headline stays the registered
        # query's cold min-of-two.
        out: dict[str, dict[str, float]] = {}
        for qname, build in _stage_splits(spark, sf_dir).items():
            spark.catalog.clearCache()
            registry.reset_memos()
            parts: dict[str, float] = {}
            for stage_name, fn in build:
                t0 = time.perf_counter()
                fn()
                parts[stage_name] = round(time.perf_counter() - t0, 3)
            out[qname] = parts
        spark.catalog.clearCache()
        registry.reset_memos()
        return out

    calibration()  # throwaway: compile the calibration shape once so
    # the recorded samples measure host speed, not codegen
    # r10 verdict #4: a 2-sample MEAN let one noisy shuffle move
    # value_normalized ~10% on a round where raw and warm totals both
    # improved. Protocol from r11: CAL_SAMPLES samples before AND
    # after the suite, normalized by the MEDIAN of all of them
    # (robust to a GC pause landing in one sample), with the
    # per-sample spread recorded so the normalized headline carries
    # its own error bar (build_output documents the bound).
    cal_start = [calibration() for _ in range(CAL_SAMPLES)]
    if args.preflight:
        # retry the 5-sample pre-flight a few times before refusing:
        # a single GC-pause-contaminated batch passes on re-sample,
        # while a persistently noisy host (the r11-r13 driver hosts)
        # aborts in seconds with a distinct, driver-retryable code.
        attempt = 1
        while _cal_spread_pct(cal_start) > CAL_SPREAD_BOUND_PCT:
            if attempt >= PREFLIGHT_ATTEMPTS:
                print(
                    json.dumps(
                        {
                            "metric": "headline_queries_total",
                            "error": "preflight_calibration_failed",
                            "calibration_sec": cal_start,
                            "calibration_spread_pct": _cal_spread_pct(
                                cal_start
                            ),
                            "bound_pct": CAL_SPREAD_BOUND_PCT,
                            "attempts": attempt,
                            "detail": (
                                "host too noisy for a valid suite; "
                                "retry on a quieter host or pass "
                                "--no-preflight-gate"
                            ),
                        }
                    )
                )
                spark.stop()
                sys.exit(PREFLIGHT_EXIT_CODE)
            attempt += 1
            time.sleep(5)
            cal_start = [calibration() for _ in range(CAL_SAMPLES)]
    norm_calibration()  # throwaway: compile the normalizer shape
    # PRE-suite samples only feed the normalizer: run-1 measurement
    # read pre [3.612, 3.464, 3.711] vs post [10.273, 4.264, 4.141] —
    # the post-suite JVM is systematically ~15 % slower (165 queries
    # of heap churn), so mixing phases bakes JVM lifecycle into the
    # normalizer. Every bench run samples PRE at the same lifecycle
    # point (fresh session + one warm query + the short-cal batch),
    # which is the apples-to-apples scalar; POST is recorded after an
    # explicit full GC as a drift diagnostic, never as normalizer
    # input.
    # r16 protocol (r15 verdict #5): normalizer samples are taken at
    # THREE fixed lifecycle points bracketing the timed window — pre
    # (before the first cold pass), mid (between the two cold passes,
    # right after the same System.gc every run), and end (right after
    # the second pass) — each tagged with its suite-clock offset, and
    # value_normalized divides by the TIME-WEIGHTED median so host
    # drift during the ~15-25 min suite is represented in proportion
    # to the wall-clock it affected. The lifecycle points are the
    # SAME every run (the r15 apples-to-apples argument, applied at
    # three points instead of one), so JVM-age bias is constant
    # cross-round and cancels in comparisons.
    suite_t0 = time.perf_counter()

    norm_retry_counts: dict[str, int] = {}

    def timed_norm_samples(
        n: int, settle: bool = False, group: str = ""
    ) -> list[tuple[float, float]]:
        # settle (r16 A/B/A finding): the FIRST normalizer sample
        # taken right after a 300 s query pass is consistently
        # inflated 15-60 % (6.24/4.55/5.32/4.84 s firsts vs
        # 3.85-4.04 s seconds across runs 2-4 — async cleanup +
        # cache-state settling), which poisoned the 2-sample groups'
        # spread gate. One UNTIMED settling run before the counted
        # samples removes it — the same role the pre-suite
        # norm_calibration() throwaway plays for the pre group.
        def batch(do_settle: bool) -> list[tuple[float, float]]:
            if do_settle:
                norm_calibration()
            return [
                (round(time.perf_counter() - suite_t0, 3), norm_calibration())
                for _ in range(n)
            ]

        samples = batch(settle)
        # r17 (r16 verdict #4): the r16 driver line carried red gates
        # because the host turned noisy AFTER the preflight passed —
        # the gate only ever sampled the pre-suite window. Apply the
        # preflight's retry-on-noisy pattern at EVERY pause point:
        # when this group's within-spread breaks the normalizer
        # bound, re-settle and re-sample once and keep the quieter
        # group. Bounded cost (one settling run + n samples, paid
        # only on a noisy window); retries are recorded per group in
        # the full file so a retried line is auditable.
        spread = _cal_spread_pct([v for _, v in samples])
        if spread > NORM_SPREAD_BOUND_PCT:
            retry = batch(True)
            norm_retry_counts[group] = norm_retry_counts.get(group, 0) + 1
            if _cal_spread_pct([v for _, v in retry]) < spread:
                samples = retry
        return samples

    norm_pre = timed_norm_samples(NORM_CAL_SAMPLES, group="pre")
    first = {name: timed(name) for name in names}
    spark._jvm.System.gc()
    norm_mid = timed_norm_samples(NORM_CAL_MID_SAMPLES, settle=True, group="mid")
    second = {name: timed(name) for name in names}
    norm_fin = timed_norm_samples(NORM_CAL_MID_SAMPLES, settle=True, group="end")
    norm_window = round(time.perf_counter() - suite_t0, 3)
    warm = {name: timed_warm(name) for name in names}
    stages = timed_stages()
    cal_end = [calibration() for _ in range(CAL_SAMPLES)]
    spark._jvm.System.gc()
    norm_end = [norm_calibration() for _ in range(NORM_CAL_POST_SAMPLES)]
    runs = {n: [round(first[n], 3), round(second[n], 3)] for n in names}
    timings = {n: min(r) for n, r in runs.items()}

    # previous round's committed full file (read BEFORE the overwrite
    # below): feeds the mover detection so the printed line surfaces
    # any query whose time moved >MOVER_RATIO cross-round
    prev_timings = _prev_timings_for(sf)

    line, full = build_output(
        timings,
        sf,
        runs=runs,
        calibration=cal_start + cal_end,
        warm={n: round(w, 3) for n, w in warm.items()},
        stages=stages,
        norm_calibration=[v for _, v in norm_pre],
        norm_calibration_post=norm_end,
        norm_timed={
            "pre": norm_pre,
            "mid": norm_mid,
            "end": norm_fin,
            "window_sec": norm_window,
            "retries": norm_retry_counts,
        },
        prev_timings=prev_timings,
    )
    Path("BENCH_FULL.json").write_text(json.dumps(full, indent=1) + "\n")
    print(line)
    spark.stop()


CAL_REF = 0.5  # reference calibration seconds for cross-round norm
CAL_SAMPLES = 5  # calibration samples taken before AND after the suite
# Normalizer workload (r15, r14 verdict #5 — see norm_calibration's
# docstring for the measured rationale): per-row md5 over a range,
# sized to run seconds long so the normalizer's own jitter is a few
# percent, not the short shuffle's ~25 %. NORM_CAL_REF plays CAL_REF's
# role for value_normalized; the bound gates "normalizer_ok" (the
# normalized headline is only comparable across rounds when the
# NORMALIZER ITSELF was steady — the r13/r14 numbers failed exactly
# this, invisibly). 5 pre-suite samples feed the normalizer; 3
# post-suite samples (after a full GC) feed only the drift
# diagnostic: ~35 s of one-time overhead total.
NORM_CAL_ROWS = 192_000_000
NORM_CAL_REF = 4.0
NORM_CAL_SAMPLES = 5  # PRE-suite samples
# 3 counted samples at EACH mid-suite pause point, after one untimed
# settling run (r16; the A/B/A showed every group's first
# post-activity sample inflated 15-60 % while the settled ones sat
# within ~4 % — see timed_norm_samples)
NORM_CAL_MID_SAMPLES = 3
NORM_CAL_POST_SAMPLES = 3  # post-suite, drift diagnostic only
NORM_SPREAD_BOUND_PCT = 10.0
# The within-run IQR UNDERSTATES the cross-run error: the 5 pre
# samples share one ~20 s host window (autocorrelated), and the r15
# back-to-back A/B/A (R15_BENCH_AB.json) measured within-run spreads
# of 1.7 %/3.4 % while the normalizer medians of the two runs sat
# 7.2 % apart (suite raw totals: 2.0 % apart). The printed error band
# is therefore floored at the measured between-run drift — a
# cross-round normalized delta inside the band is host noise. Under
# the pre-r15 short-shuffle protocol the same comparison read 23 %.
NORM_BAND_FLOOR_PCT = 10.0
# Pre-flight gate (r13 verdict #4): abort before the timed suite when
# the pre-suite calibration spread alone exceeds the bound. Distinct
# exit code so the driver can tell "noisy host, retry" from a crash.
PREFLIGHT_ATTEMPTS = 3
PREFLIGHT_EXIT_CODE = 3
# Mover surfacing (r15 verdict #6): a query re-enters the printed
# line — ahead of the slowest-first fill — when its cold min-of-two
# moved by more than this ratio vs the previous round's committed
# BENCH_FULL.json, so the driver-visible line itself surfaces
# regressions in fast queries instead of deferring to the full-file
# diff. The absolute floor keeps sub-noise ratio flips on
# sub-half-second queries from burning line slots.
MOVER_RATIO = 1.5
MOVER_ABS_FLOOR_SEC = 0.3


def _prev_timings_for(
    sf: float, path: str = "BENCH_FULL.json"
) -> dict[str, float] | None:
    """The previous round's committed per-query timings for the mover
    pass — ONLY when that full file was produced at the SAME scale
    factor (r16 advisor: a prev file from a different sf would flag
    nearly every query as a >MOVER_RATIO mover and flood the printed
    line's query slots with noise)."""
    try:
        prev_full = json.loads(Path(path).read_text())
    except (OSError, ValueError):
        return None
    if isinstance(prev_full.get("queries"), dict) and prev_full.get("sf") == sf:
        return prev_full["queries"]
    return None


def _weighted_median(timed_samples: list[tuple[float, float]], window: float) -> float:
    """Time-weighted median of (offset_sec, value) normalizer samples
    over the suite window [0, window] (r16, r15 verdict #5): each
    sample's weight is the Voronoi span of suite wall-clock nearest
    to its offset, so a sample taken mid-suite represents the hours
    of queries around it, not 1/n of the vote. The r15 protocol's 5
    PRE-only samples shared one ~20 s host window and missed drift
    that happened mid-suite — back-to-back identical runs normalized
    8.6 % apart while their within-run spreads read 1.7 %/3.4 %."""
    pts = sorted(timed_samples)
    if not pts:
        return 0.0
    bounds = [0.0]
    for i in range(len(pts) - 1):
        bounds.append((pts[i][0] + pts[i + 1][0]) / 2)
    bounds.append(max(window, pts[-1][0]))
    weighted = sorted(
        (v, bounds[i + 1] - bounds[i]) for i, (_, v) in enumerate(pts)
    )
    total_w = sum(w for _, w in weighted)
    acc = 0.0
    for v, w in weighted:
        acc += w
        if acc >= total_w / 2:
            return v
    return weighted[-1][0]


def _cal_median(samples: list[float]) -> float:
    """The ONE median definition the normalizer, calibration_sec,
    and the spread's denominator all share — a later change (e.g.
    statistics.median or different even-n handling) cannot silently
    diverge the spread from the printed normalizer (r14 review; the
    same drift class the r11 advisor caught in the spread docs)."""
    s = sorted(samples)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _cal_spread_pct(samples: list[float]) -> float:
    """Relative IQR spread (q3-q1)/median in percent — the ONE spread
    definition shared by the pre-flight gate and build_output (two
    near-copies would drift; the r11 advisor caught exactly such a
    doc/IQR mismatch)."""
    s = sorted(samples)
    median = _cal_median(samples)
    if median <= 0:
        return 0.0
    n = len(s)
    q1, q3 = s[n // 4], s[(3 * n) // 4]
    return round(100.0 * (q3 - q1) / median, 1)
# Documented variance bound (r10 verdict #4): the normalized headline
# is trustworthy when the calibration samples' relative INTERQUARTILE
# spread ((q3 - q1) / median) stays under this; the printed line
# carries the measured spread so a cross-round value_normalized delta
# smaller than the spread is read as host noise, not a regression.
# IQR, not range: with 10 samples of a ~0.45 s shuffle the min/max
# range routinely spans ±30% (single GC pauses), while the IQR of the
# same samples sits near 20% — and the MEDIAN normalizer is by
# construction insensitive to those tails (r11 run: samples
# 0.366..0.612, median 0.452, IQR spread 22%, range spread 54%).
CAL_SPREAD_BOUND_PCT = 30.0
# POSITION EFFECT (measured r11): a query's bench position shifts its
# cold time — winnow_index_retract read 2.92 s at registry position 1
# in r10 (first timed query after calibration, fresh JVM/page-cache
# state) and 5.46 s at position ~100 in r11 with ZERO code change
# (isolated fresh-session reruns of BOTH trees measure ~5.1-5.9 s, so
# the steady-state cost was always ~5.5 s and the r10 number was
# flattered by first position). Cross-round per-query comparisons are
# only meaningful between similar window positions; rotation-induced
# moves of this size are protocol artifacts, not regressions.
# Killed at the root in r12 (r11 verdict #5): HEADLINE is name-sorted,
# so a query's bench position no longer depends on where the registry
# rotation put it — see the protocol note at HEADLINE.


def _stage_splits(spark, sf_dir: str) -> dict[str, list[tuple[str, object]]]:
    """Per-stage runners for the train-included stored-cycle queries:
    query name -> ordered (stage, thunk) list reproducing the
    registered query's phases against the same artifact dirs. Reaches
    one module-private helper (_artifact_dir) on purpose — the splits
    must measure the exact paths the registered queries run."""
    from honors_p1_mapreduce_spark.operators import bpe_encode as bpx
    from honors_p1_mapreduce_spark.operators import lm_quality as lm
    from honors_p1_mapreduce_spark.operators import pq
    from honors_p1_mapreduce_spark.operators import winnow as wn
    from honors_p1_mapreduce_spark.operators.bpe_encode import _artifact_dir
    from honors_p1_mapreduce_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    d_pq = _artifact_dir(spark, sf_dir, f"pq_index_{pq.PQ_CELLS}c{pq.PQ_ITER}i")
    d_incr = _artifact_dir(spark, sf_dir, f"pq_incr_{pq.PQ_CELLS}c{pq.PQ_ITER}i")
    d_tok = _artifact_dir(spark, sf_dir, "bpe_tokenizer")
    d_lm = _artifact_dir(spark, sf_dir, "lm_model")
    d_lmc = _artifact_dir(spark, sf_dir, "lm_counts")
    d_wix = _artifact_dir(spark, sf_dir, "winnow_index")
    d_rfull = _artifact_dir(spark, sf_dir, "winnow_index_rtr_full")
    d_rtr = _artifact_dir(spark, sf_dir, "winnow_index_rtr")

    def _removed():
        return (
            load_table(spark, sf_dir, "documents")
            .select("doc_id")
            .filter(F.col("doc_id") % wn.RETRACT_MOD == wn.RETRACT_RESIDUE)
        )

    return {
        "pq_search_stored": [
            ("train_write", lambda: pq.pq_write_index(spark, sf_dir, d_pq)),
            ("serve", lambda: pq.pq_search_index(spark, sf_dir, d_pq).count()),
        ],
        "pq_search_appended": [
            (
                "train_write_base",
                lambda: pq.pq_write_base_index(spark, sf_dir, d_incr),
            ),
            ("append", lambda: pq.pq_append_index(spark, sf_dir, d_incr)),
            (
                "serve",
                lambda: pq.pq_search_index(spark, sf_dir, d_incr).count(),
            ),
        ],
        "bpe_encode_ids_stored": [
            (
                "train_write",
                lambda: bpx.bpe_write_tokenizer(spark, sf_dir, d_tok),
            ),
            (
                "serve",
                lambda: bpx.bpe_encode_ids_with(spark, sf_dir, d_tok).count(),
            ),
        ],
        "lm_score_stored": [
            ("train_write", lambda: lm.lm_write_model(spark, sf_dir, d_lm)),
            (
                "serve",
                lambda: lm.lm_score_with(spark, sf_dir, d_lm).count(),
            ),
        ],
        "decontaminate_stored": [
            (
                "extract_write",
                lambda: wn.winnow_write_index(spark, sf_dir, d_wix),
            ),
            (
                "serve",
                lambda: wn.decontaminate_from_index(spark, d_wix).count(),
            ),
        ],
        "winnow_index_retract": [
            (
                "extract_write",
                lambda: wn.winnow_write_index(spark, sf_dir, d_rfull),
            ),
            (
                "retract",
                lambda: wn.winnow_retract_index(
                    spark, d_rfull, d_rtr, _removed()
                ),
            ),
            (
                "serve",
                lambda: wn.decontaminate_from_index(spark, d_rtr).count(),
            ),
        ],
        "lm_model_retract": [
            ("train_write", lambda: lm.lm_write_counts(spark, sf_dir, d_lmc)),
            (
                "retract_serve",
                lambda: lm.lm_retract_with(spark, sf_dir, d_lmc).count(),
            ),
        ],
    }


def build_output(
    timings: dict[str, float],
    sf: float,
    runs: dict[str, list[float]] | None = None,
    calibration: list[float] | None = None,
    warm: dict[str, float] | None = None,
    stages: dict[str, dict[str, float]] | None = None,
    norm_calibration: list[float] | None = None,
    norm_calibration_post: list[float] | None = None,
    norm_timed: dict | None = None,
    prev_timings: dict[str, float] | None = None,
) -> tuple[str, dict]:
    """(printed JSON line, full-detail dict). The PRINTED line must
    stay well under 2000 bytes — the driver records only the last
    2000 bytes of this process's output and parses the JSON line out
    of that window (round 4's line grew past it and the driver
    recorded parsed=null). The line carries the total over ALL
    queries plus the slowest queries that fit the byte budget; full
    per-query detail goes to BENCH_FULL.json. Budget invariance is
    pinned by tests/test_cli.py::test_bench_line_fits_record_window
    for the real registry at any plausible timing magnitudes."""
    total = round(sum(timings.values()), 3)
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": sf,
    }
    if runs is not None:
        # both raw samples per query (uniform min-of-two protocol,
        # round 7) so protocol vs real speedups stay auditable
        full["runs"] = runs
    if calibration is not None:
        # fixed-size shuffle job timed before the first and after the
        # last pass: a host-speed scalar for normalizing cross-round
        # deltas (identical work every run, independent of SF)
        full["calibration_sec"] = calibration
    if warm is not None:
        # third-pass per-query times with memos left in place — the
        # artifact-reuse steady state (r8 verdict #3); headline stays
        # the cold min-of-two
        full["warm"] = warm
        full["warm_total"] = round(sum(warm.values()), 3)
    if stages is not None:
        # per-stage attribution for the train-included stored cycles
        # (r9 verdict #7): cold, sequential, same artifact dirs as the
        # registered queries — so regressions name the stage that moved
        full["stages"] = stages
    # seed the headline wordcount only when it actually ran — a run
    # without it must not report a fabricated 0.0 s timing
    shown: dict[str, float] = {k: timings[k] for k in ("wordcount",) if k in timings}
    # bytes for the "queries" dict. Reduced 1600 -> 1400 in r15: the
    # norm_* fields added ~140 bytes and the committed r15 line
    # measured 1987/2000 — one extra digit in the totals (a 1000+ s
    # round) would have truncated the driver's parse (the round-4
    # parsed=null failure). The guard test now builds the line WITH
    # every optional field at wide magnitudes. Reduced 1400 -> 1300
    # in r17: calibration_within_spread_pct + calibration_drift_pct +
    # norm_retries added ~100 bytes.
    budget = 1300
    # MOVERS first (r15 verdict #6): the slowest-first fill hides a
    # regression in a FAST query (a 0.3 s -> 1.2 s query never makes
    # the top-~40 cut), so any query whose time moved more than
    # MOVER_RATIO vs the previous round's committed BENCH_FULL file
    # claims a line slot ahead of the merely-slow. The absolute floor
    # keeps sub-noise flips (0.05 s -> 0.09 s is 1.8x but meaningless
    # under the measured per-query jitter) from burning slots. Biggest
    # absolute delta first, so when many move the worst always fit.
    movers: list[str] = []
    if prev_timings:
        for name, secs in timings.items():
            prev = prev_timings.get(name)
            if prev is None or min(secs, prev) <= 0:
                continue
            ratio = max(secs, prev) / min(secs, prev)
            if ratio > MOVER_RATIO and abs(secs - prev) >= MOVER_ABS_FLOOR_SEC:
                movers.append(name)
        movers.sort(key=lambda n: -abs(timings[n] - prev_timings[n]))
        for name in movers:
            if name in shown:
                continue
            if len(json.dumps({**shown, name: timings[name]})) > budget:
                break
            shown[name] = timings[name]
    for name, secs in sorted(timings.items(), key=lambda kv: -kv[1]):
        if name in shown:
            continue
        if len(json.dumps({**shown, name: secs})) > budget:
            break
        shown[name] = secs
    line_dict = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": shown,
        "n_queries": len(timings),
        "detail": "BENCH_FULL.json",
        "sf": sf,
    }
    if prev_timings:
        # how many >MOVER_RATIO movers exist vs the previous round's
        # full file (all of them are in "queries" unless the byte
        # budget overflowed — full list in BENCH_FULL.json "movers")
        line_dict["n_movers"] = len(movers)
        full["movers"] = movers
    if calibration is not None:
        # r11 protocol: median of 2*CAL_SAMPLES samples (was mean of
        # 2), plus the relative spread as the normalized headline's
        # error bar — a cross-round value_normalized delta within the
        # spread is host noise by definition. The full sample list
        # stays in BENCH_FULL.json; the line carries the summary.
        cal_median = _cal_median(calibration)
        line_dict["calibration_sec"] = round(cal_median, 3)
        if cal_median > 0:
            spread_pct = _cal_spread_pct(calibration)
            line_dict["calibration_spread_pct"] = spread_pct
            # r17 (the r16 normalizer-gate decision applied to the
            # legacy short-shuffle gate): the samples are two
            # temporal groups — CAL_SAMPLES before the suite and
            # CAL_SAMPLES after — so the POOLED IQR conflates
            # within-window noise with cross-suite host drift (r17
            # run2: within-group spreads 21.7 %/26.8 % vs pooled
            # 40.2 %, purely because the host sped up between the
            # windows ~25 min apart). The gate reads the max
            # WITHIN-group spread, exactly as normalizer_ok has
            # since r16; the pooled figure keeps its key (series
            # unchanged) and the between-group drift is reported
            # alongside as the diagnostic it is.
            half = len(calibration) // 2
            groups = (
                [calibration[:half], calibration[half:]]
                if half >= 2
                else [calibration]
            )
            within_cal = max(_cal_spread_pct(g) for g in groups)
            line_dict["calibration_within_spread_pct"] = within_cal
            if len(groups) == 2:
                m1 = _cal_median(groups[0])
                m2 = _cal_median(groups[1])
                line_dict["calibration_drift_pct"] = (
                    round(100.0 * abs(m2 - m1) / m1, 1) if m1 > 0 else 0.0
                )
            line_dict["calibration_ok"] = within_cal <= CAL_SPREAD_BOUND_PCT
            if norm_calibration is None:
                # pre-r15 protocol (kept for old-artifact tooling):
                # normalize by the short shuffle — known-noisy, see
                # the r14 verdict #5 finding at norm_calibration
                line_dict["value_normalized"] = round(
                    total * CAL_REF / cal_median, 3
                )
            full["calibration_median"] = round(cal_median, 3)
            full["calibration_spread_pct"] = spread_pct
    if norm_calibration is not None:
        # r15 protocol (r14 verdict #5): value_normalized divides by
        # the compute-bound NORMALIZER's PRE-suite median, and carries
        # the normalizer's OWN spread as its error bar — a normalized
        # total is only cross-round comparable when normalizer_ok is
        # true on BOTH rounds and the delta exceeds both spreads.
        # NOT comparable with pre-r15 value_normalized numbers (those
        # divided by the short shuffle; the raw "value" is the
        # unbroken cross-round series). Post-suite samples, when
        # given, yield a drift diagnostic only (see the main()-side
        # note: the post-suite JVM measured ~15 % slower).
        full["norm_calibration_sec"] = norm_calibration
        norm_median = _cal_median(norm_calibration)
        if norm_timed is not None and norm_median > 0:
            # r16 protocol (r15 verdict #5): the normalizer is the
            # TIME-WEIGHTED median over samples taken at three fixed
            # lifecycle points (pre / mid / end of the timed window),
            # so mid-suite host drift — which the pre-only r15 median
            # missed entirely — moves the normalizer in proportion to
            # the wall-clock it affected. normalizer_ok gates on the
            # max WITHIN-group spread: between-group differences are
            # the drift this protocol exists to absorb, not noise.
            # The flat PRE median stays in the full file
            # (norm_pre_median) so r15<->r16 normalized numbers keep
            # one comparable series during the protocol change.
            groups = {
                g: norm_timed[g] for g in ("pre", "mid", "end") if norm_timed.get(g)
            }
            all_samples = [s for g in groups.values() for s in g]
            w_median = _weighted_median(all_samples, norm_timed["window_sec"])
            group_medians = {
                g: round(_cal_median([v for _, v in s]), 3)
                for g, s in groups.items()
            }
            within = max(_cal_spread_pct([v for _, v in s]) for s in groups.values())
            gm = sorted(group_medians.values())
            drift_pct = (
                round(100.0 * (gm[-1] - gm[0]) / gm[0], 1) if gm[0] > 0 else 0.0
            )
            line_dict["norm_calibration_sec"] = round(w_median, 3)
            line_dict["norm_calibration_spread_pct"] = within
            line_dict["normalizer_ok"] = within <= NORM_SPREAD_BOUND_PCT
            line_dict["value_normalized"] = round(
                total * NORM_CAL_REF / w_median, 3
            )
            line_dict["normalized_band_pct"] = max(within, NORM_BAND_FLOOR_PCT)
            line_dict["norm_suite_drift_pct"] = drift_pct
            full["norm_timed"] = norm_timed
            full["norm_calibration_median"] = round(w_median, 3)
            full["norm_group_medians"] = group_medians
            full["norm_pre_median"] = round(norm_median, 3)
            full["norm_calibration_spread_pct"] = within
            full["norm_suite_drift_pct"] = drift_pct
            retries = norm_timed.get("retries") or {}
            if retries:
                full["norm_retry_counts"] = retries
                line_dict["norm_retries"] = sum(retries.values())
            if norm_calibration_post:
                # keep the post-suite drift series the legacy branch
                # emitted (r16 advisor: this branch silently dropped
                # norm_calibration_post_* while main() still paid the
                # ~NORM_CAL_POST_SAMPLES runs collecting it); drift is
                # vs the PRE median, same as the legacy series.
                post_median = _cal_median(norm_calibration_post)
                full["norm_calibration_post_sec"] = norm_calibration_post
                full["norm_calibration_post_median"] = round(post_median, 3)
                line_dict["norm_drift_pct"] = round(
                    100.0 * (post_median - norm_median) / norm_median, 1
                )
        elif norm_median > 0:
            norm_spread = _cal_spread_pct(norm_calibration)
            line_dict["norm_calibration_sec"] = round(norm_median, 3)
            line_dict["norm_calibration_spread_pct"] = norm_spread
            line_dict["normalizer_ok"] = norm_spread <= NORM_SPREAD_BOUND_PCT
            line_dict["value_normalized"] = round(
                total * NORM_CAL_REF / norm_median, 3
            )
            # the honest error bar: within-run spread floored at the
            # measured between-run drift (see NORM_BAND_FLOOR_PCT)
            line_dict["normalized_band_pct"] = max(
                norm_spread, NORM_BAND_FLOOR_PCT
            )
            full["norm_calibration_median"] = round(norm_median, 3)
            full["norm_calibration_spread_pct"] = norm_spread
            if norm_calibration_post:
                post_median = _cal_median(norm_calibration_post)
                full["norm_calibration_post_sec"] = norm_calibration_post
                full["norm_calibration_post_median"] = round(post_median, 3)
                line_dict["norm_drift_pct"] = round(
                    100.0 * (post_median - norm_median) / norm_median, 1
                )
    if warm is not None:
        line_dict["warm_total"] = round(sum(warm.values()), 3)
    line = json.dumps(line_dict)
    return line, full


if __name__ == "__main__":
    main()
