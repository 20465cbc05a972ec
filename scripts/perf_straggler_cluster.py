#!/usr/bin/env python
"""Measure the straggler-mitigation A/B on a REAL cluster scheduler.

The reference's flagship result is speculative re-execution of
straggling tasks: design.md:111-114 reports 60 s -> 25 s (2.4x) on a
worker with an injected 3x slowdown (mapreduce-reference/
coordinator/server.py:291-356 launches backup copies; worker.py:25,
90-92 injects the slowdown). This engine carries the knob-for-knob
conf (session.py: spark.speculation=true, multiplier 1.5, quantile
0.25), but `local[N]` NEVER exercises it — TaskSchedulerImpl starts
the speculation monitor only on non-local schedulers.

`local-cluster[...]` runs the real scheduler but STILL cannot place a
backup: TaskSetManager.dequeueSpeculativeTask refuses to schedule a
speculative copy on the same HOST as the running attempt, and every
local-cluster executor shares one host (measured: the straggler arm
ran 31 s with zero backups). So this script builds a real standalone
cluster whose 4 workers each bind a DISTINCT loopback address
(127.0.0.2-5 — all locally bindable with no system config), making
them distinct hosts to the scheduler; backups then place and win.

Three arms, fresh SparkContext each (spark.speculation is fixed at
context start):

1. baseline        — no straggler injected, speculation on;
2. straggler_off   — partition 0's first attempt sleeps STRAGGLE_S,
                     speculation OFF: the job eats the whole sleep;
3. straggler_on    — same injected straggler, speculation ON: the
                     monitor sees 15/16 map tasks finish fast, fires
                     a backup on another host (the injector is
                     attempt-aware: attemptNumber > 0 skips the
                     sleep), and the backup wins.

Backup-task evidence comes from the app's own REST API
(/api/v1/.../taskList rows with speculative=true and their status).
Prints one JSON line; manages the master/worker processes itself.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from honors_p1_mapreduce_spark.functions.text import tokens_col  # noqa: E402

N_LINES = 200_000
WORDS_PER_LINE = 12
NUM_MAPS = 16
NUM_REDUCES = 8
STRAGGLE_S = 20.0
N_WORKERS = 4
MASTER_URL = "spark://127.0.0.1:7077"
UI_PORT = 4057

VOCAB = [f"word{i:04d}" for i in range(5_000)]
SPARK_CLASS = "/opt/spark/bin/spark-class"


def generate_input(path: str) -> None:
    rng = random.Random(42)
    with open(path, "w") as f:
        for _ in range(N_LINES):
            f.write(" ".join(rng.choice(VOCAB) for _ in range(WORDS_PER_LINE)))
            f.write("\n")


def start_cluster(log_dir: str) -> list[subprocess.Popen]:
    """Standalone master on 127.0.0.1 plus N_WORKERS workers, each
    registered under its own loopback address => distinct hosts."""
    procs = []
    env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1", SPARK_NO_DAEMONIZE="1")
    procs.append(
        subprocess.Popen(
            [SPARK_CLASS, "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8091"],
            env=env,
            stdout=open(f"{log_dir}/master.log", "w"),
            stderr=subprocess.STDOUT,
        )
    )
    _wait_http("http://127.0.0.1:8091/json/", 30)
    for i in range(2, 2 + N_WORKERS):
        host = f"127.0.0.{i}"
        wenv = dict(
            os.environ,
            SPARK_LOCAL_IP=host,
            SPARK_LOCAL_HOSTNAME=host,
            SPARK_NO_DAEMONIZE="1",
        )
        procs.append(
            subprocess.Popen(
                [SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
                 MASTER_URL, "--host", host, "--cores", "1",
                 "--memory", "1500m", "--webui-port", f"809{i}"],
                env=wenv,
                stdout=open(f"{log_dir}/worker{i}.log", "w"),
                stderr=subprocess.STDOUT,
            )
        )
    # wait for all workers to register
    for _ in range(60):
        info = json.load(urllib.request.urlopen("http://127.0.0.1:8091/json/"))
        if len(info.get("workers", [])) >= N_WORKERS:
            break
        time.sleep(1)
    else:
        raise RuntimeError("workers failed to register")
    return procs


def _wait_http(url: str, timeout_s: int) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            urllib.request.urlopen(url, timeout=2)
            return
        except Exception:
            time.sleep(0.5)
    raise RuntimeError(f"{url} never came up")


def cluster_session(speculation: bool) -> SparkSession:
    return (
        SparkSession.builder.master(MASTER_URL)
        .appName(f"straggler-ab-spec-{speculation}")
        .config("spark.speculation", str(speculation).lower())
        # knob-for-knob with the reference coordinator (server.py:73-75)
        .config("spark.speculation.multiplier", "1.5")
        .config("spark.speculation.quantile", "0.25")
        .config("spark.sql.shuffle.partitions", str(NUM_REDUCES))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "true")  # REST evidence source
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.executor.memory", "1g")
        .config("spark.executor.cores", "1")
        .config("spark.cores.max", str(N_WORKERS))
        .getOrCreate()
    )


def straggler_stage(df, sleep_s: float):
    """Identity mapInPandas stage; partition 0's FIRST attempt sleeps
    (reference SIMULATE_STRAGGLER analog, made attempt-aware so the
    speculative backup copy runs at full speed)."""
    from pyspark import TaskContext

    def _f(batches):
        ctx = TaskContext.get()
        if ctx is not None and ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            time.sleep(sleep_s)
        yield from batches

    return df.mapInPandas(_f, schema="value string")


def speculative_evidence() -> dict:
    """Count speculative task attempts (and their outcomes) for the
    16-task map stage via the app's REST API."""
    base = f"http://127.0.0.1:{UI_PORT}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/applications/{app_id}/stages"))
    out = {"speculative_tasks": 0, "speculative_succeeded": 0}
    for st in stages:
        if st.get("numTasks") != NUM_MAPS:
            continue
        url = (
            f"{base}/applications/{app_id}/stages/{st['stageId']}/"
            f"{st['attemptId']}/taskList?length=200"
        )
        try:
            tasks = json.load(urllib.request.urlopen(url))
        except Exception:
            continue
        for t in tasks:
            if t.get("speculative"):
                out["speculative_tasks"] += 1
                if t.get("status") == "SUCCESS":
                    out["speculative_succeeded"] += 1
    return out


def run_arm(inp: str, speculation: bool, sleep_s: float) -> tuple[float, dict]:
    spark = cluster_session(speculation)
    try:
        lines = spark.read.text(inp).repartition(NUM_MAPS)
        lines.count()  # warm: input read + executors registered
        staged = straggler_stage(lines, sleep_s) if sleep_s > 0 else lines
        t0 = time.perf_counter()
        (
            staged.select(F.explode(tokens_col("value")).alias("word"))
            .groupBy("word")
            .count()
            .count()
        )
        wall = round(time.perf_counter() - t0, 2)
        ev = speculative_evidence()
        return wall, ev
    finally:
        spark.stop()


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="spark_graft_straggler_")
    inp = f"{tmp}/wc_input.txt"
    generate_input(inp)
    procs = start_cluster(tmp)
    try:
        baseline, _ = run_arm(inp, speculation=True, sleep_s=0.0)
        straggler_off, ev_off = run_arm(inp, speculation=False, sleep_s=STRAGGLE_S)
        straggler_on, ev_on = run_arm(inp, speculation=True, sleep_s=STRAGGLE_S)
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except Exception:
                p.kill()

    print(
        json.dumps(
            {
                "metric": "straggler_ab_standalone_cluster",
                "master": MASTER_URL,
                "workers": f"{N_WORKERS} x 1 core, distinct loopback hosts",
                "n_lines": N_LINES,
                "num_maps": NUM_MAPS,
                "num_reduces": NUM_REDUCES,
                "straggle_s": STRAGGLE_S,
                "baseline_s": baseline,
                "straggler_speculation_off_s": straggler_off,
                "straggler_speculation_on_s": straggler_on,
                "speedup": round(straggler_off / straggler_on, 2),
                "mitigated_fraction": round(
                    (straggler_off - straggler_on)
                    / max(straggler_off - baseline, 1e-9),
                    3,
                ),
                "speculation_off_evidence": ev_off,
                "speculation_on_evidence": ev_on,
                "reference_published": {
                    "straggler_off_s": 60.0,
                    "straggler_on_s": 25.0,
                    "speedup": 2.4,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
