#!/usr/bin/env python
"""Round-6 probe (VERDICT r5 item 7): small-file accumulation under
the streaming incremental rollup at realistic micro-batch counts.

The r5 compaction test is end-to-end but single-batch; this probe
drives ~200 REAL micro-batches (the sf0.1 events table split into 200
parquet files, streamed with maxFilesPerTrigger=1 + AvailableNow, so
foreachBatch fires once per file) and records:

  - store parquet-file count after the run (one batch_id=N hive
    partition per micro-batch — the small-file problem as it actually
    accrues in production),
  - read_rollup_store serve cost against the fragmented store,
  - compact_rollup_store (merge partials -> batch_id=-1 generation),
  - serve cost and file count after compaction,
  - bit-identical rollup output across the swap (sums/counts are
    re-addable partials, so compaction must be invisible to readers).

Usage: python scripts/probe_rollup_compaction.py [n_batches]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402
from honors_p1_mapreduce_spark.streaming.windows import (  # noqa: E402
    compact_rollup_store,
    read_rollup_store,
    streaming_incremental_rollup,
)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_spark(app_name="probe_rollup_compaction")
    work = Path(tempfile.mkdtemp(prefix="rollup_probe_"))
    src = str(work / "src")
    store = str(work / "store")
    out: dict = {"n_batches_requested": n_batches}

    # one source file per desired micro-batch; ts is kept as raw nanos
    # (BIGINT) so the split files exercise stream_events' LongType
    # normalization branch, same as the driver parquet
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    ev.repartition(n_batches).write.parquet(src)

    t0 = time.perf_counter()
    streaming_incremental_rollup(spark, src, store, glob="*.parquet")
    out["stream_run_s"] = round(time.perf_counter() - t0, 1)
    out["batch_dirs"] = len(list(Path(store).glob("batch_id=*")))
    files_before = len([f for f in Path(store).rglob("*.parquet") if f.is_file()])
    out["store_files_before"] = files_before

    def serve() -> tuple[list, float]:
        t0 = time.perf_counter()
        rows = sorted(
            map(tuple, read_rollup_store(spark, store).collect())
        )
        secs = time.perf_counter() - t0
        spark.catalog.clearCache()
        return rows, round(secs, 2)

    rows_frag, out["serve_s_before"] = serve()
    # second read to split footer-listing cost from JVM warmup
    _, out["serve_s_before_warm"] = serve()

    t0 = time.perf_counter()
    fb, fa = compact_rollup_store(spark, store)
    out["compact_s"] = round(time.perf_counter() - t0, 1)
    out["store_files_after"] = fa
    assert fb == files_before

    rows_comp, out["serve_s_after"] = serve()
    _, out["serve_s_after_warm"] = serve()
    assert rows_frag == rows_comp, "rollup output changed across compaction"
    out["rollup_rows"] = len(rows_comp)
    out["output_identical"] = True

    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
