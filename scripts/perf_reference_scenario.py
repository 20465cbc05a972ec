#!/usr/bin/env python
"""Reproduce the reference's published benchmark scenario at its own
scale (BASELINE.md / SURVEY.md §6): word count over ~50 MB / 500 K
lines, 16 map / 8 reduce tasks, plus the straggler A/B.

Measurements (one JSON line at the end):

1. ``native_s``  — the Catalyst wordcount plan over the generated file.
2. ``generic_s`` — the same job through the ``map_reduce`` escape hatch
   (the apples-to-apples analog of the reference's Python mapper/
   reducer path; reference baseline: ~20 s, ~2.5 MB/s).
3. ``straggler_s`` — one map partition's FIRST attempt sleeps
   ``STRAGGLE_S`` seconds (task-attempt-aware, so a speculative backup
   copy would not sleep), measuring the un-mitigated straggler cost.

HONEST LIMITATION: Spark's speculation monitor thread only starts on
a real cluster scheduler — ``TaskSchedulerImpl.start()`` guards it
with ``!isLocal`` — so the reference's 60 s -> 25 s A/B
(design.md:110-114) cannot be exercised on local[N]; the engine
carries the knob-for-knob conf (multiplier 1.5, quantile 0.25,
asserted in tests/test_engine_runtime.py) and the attempt-aware
straggler injector here is cluster-ready: on a multi-executor
deployment the backup attempt (attemptNumber > 0) skips the sleep and
wins. The JSON reports ``speculation_local_note`` accordingly.

Deterministic input: seeded word salad under /tmp.
"""

from __future__ import annotations

import json
import random
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from honors_p1_mapreduce_spark.functions.text import tokens_col  # noqa: E402
from honors_p1_mapreduce_spark.mapreduce import map_reduce  # noqa: E402
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402
from honors_p1_mapreduce_spark.sources.text import read_text_lines  # noqa: E402

N_LINES = 500_000
WORDS_PER_LINE = 12
NUM_MAPS = 16
NUM_REDUCES = 8
# must comfortably exceed the job's ~10 s of real work or the sleeping
# partition hides inside the other waves' wall-clock
STRAGGLE_S = 20.0
CPUS = 4  # the reference ran 4 workers x 1 CPU

VOCAB = [f"word{i:04d}" for i in range(5_000)]


def generate_input(path: str) -> int:
    rng = random.Random(42)
    with open(path, "w") as f:
        for _ in range(N_LINES):
            f.write(" ".join(rng.choice(VOCAB) for _ in range(WORDS_PER_LINE)))
            f.write("\n")
    return Path(path).stat().st_size


def wc_map(line):
    import re

    for tok in re.findall(r"[a-z0-9_]+", line.lower()):
        yield tok, 1


def wc_reduce(key, values):
    yield key, sum(int(v) for v in values)


def native_wordcount(lines):
    return (
        lines.select(F.explode(tokens_col("value")).alias("word"))
        .groupBy("word")
        .count()
    )


def straggler_stage(df, sleep_s: float):
    """Identity mapInPandas stage whose partition-0 FIRST attempt
    sleeps — the reference's SIMULATE_STRAGGLER analog
    (mr/worker/worker.py:25,90-92) made attempt-aware so speculative
    backup copies run at full speed."""
    from pyspark import TaskContext

    def _f(batches):
        ctx = TaskContext.get()
        if ctx is not None and ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            time.sleep(sleep_s)
        yield from batches

    return df.mapInPandas(_f, schema="value string")


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="spark_graft_perf_")
    inp = f"{tmp}/wc_input.txt"
    size = generate_input(inp)
    out: dict[str, object] = {
        "metric": "reference_scenario",
        "input_mb": round(size / 1e6, 1),
        "n_lines": N_LINES,
        "reference_baseline_s": 20.0,
        "reference_straggler_on_s": 25.0,
        "reference_straggler_off_s": 60.0,
    }

    # baseline + generic escape hatch in one default session
    spark = get_spark(app_name="perf-baseline", cpus=CPUS)
    lines = read_text_lines(spark, inp, min_partitions=NUM_MAPS)
    lines.count()
    t0 = time.perf_counter()
    n_native = native_wordcount(lines).count()
    out["native_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n_generic = map_reduce(lines, wc_map, wc_reduce, num_partitions=NUM_REDUCES).count()
    out["generic_s"] = round(time.perf_counter() - t0, 2)
    assert n_native == n_generic, (n_native, n_generic)
    out["distinct_words"] = n_native

    t0 = time.perf_counter()
    native_wordcount(straggler_stage(lines, STRAGGLE_S)).count()
    out["straggler_s"] = round(time.perf_counter() - t0, 2)
    out["speculation_conf"] = {
        "spark.speculation": spark.conf.get("spark.speculation"),
        "multiplier": spark.conf.get("spark.speculation.multiplier"),
        "quantile": spark.conf.get("spark.speculation.quantile"),
    }
    out["speculation_local_note"] = (
        "Spark starts the speculation monitor only on non-local schedulers "
        "(TaskSchedulerImpl.start guards with !isLocal); the straggler "
        "injector is attempt-aware so backups win on a real cluster"
    )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
