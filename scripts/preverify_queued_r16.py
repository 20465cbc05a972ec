#!/usr/bin/env python
"""Pre-registration verification of the queued r17/r18/r19 surfaces
on the FINAL r16 tree — the driver-style compare (rows + schema +
order-insensitive value hash vs DuckDB) at sf0.001 AND sf0.01 for
every library surface scheduled to register in the next rounds, so
the rotation note's "any driver red is regression, not design" claim
rests on evidence from THIS tree:

  r17: dedup_substring_cut + dedup_substring_cut_stored
  r18: decontaminate_bloom_prefilter + dedup_containment +
       contamination_stored
  r19: corpus_snapshot_diff + winnow_index_refresh (built r16)

Usage: python scripts/preverify_queued_r16.py > R16_QUEUED_PREVERIFY.json
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402


def _surfaces():
    from honors_p1_mapreduce_spark.operators import curation as cu
    from honors_p1_mapreduce_spark.operators import curation_ext as cx
    from honors_p1_mapreduce_spark.operators import dedup as dd
    from honors_p1_mapreduce_spark.operators import substring_dedup as ss

    return [
        # r17 registrations (built r14)
        ("dedup_substring_cut", ss.dedup_substring_cut,
         ss.DEDUP_SUBSTRING_CUT_ORACLE),
        ("dedup_substring_cut_stored", ss.dedup_substring_cut_stored,
         ss.DEDUP_SUBSTRING_CUT_STORED_ORACLE),
        # r18 registrations (built r15)
        ("decontaminate_bloom_prefilter", cu.decontaminate_bloom_prefilter,
         cu.DECONTAMINATE_BLOOM_PREFILTER_ORACLE),
        ("dedup_containment", dd.containment_pairs, dd.CONTAINMENT_ORACLE),
        ("contamination_stored", cu.contamination_stored,
         cu.CONTAMINATION_STORED_ORACLE),
        # r19 registrations (built r16)
        ("corpus_snapshot_diff", cx.corpus_snapshot_diff,
         cx.CORPUS_SNAPSHOT_DIFF_ORACLE),
        ("winnow_index_refresh", cx.winnow_index_refresh,
         cx.WINNOW_INDEX_REFRESH_ORACLE),
    ]


def main() -> int:
    from tests.oracle import compare_query

    spark = get_spark(app_name="preverify_queued_r16")
    out: dict = {
        "purpose": (
            "r17/r18/r19 registration pre-verification on the FINAL "
            "r16 tree"
        ),
        "n_surfaces": len(_surfaces()),
        "sfs": {},
    }
    bad = 0
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        res: dict = {}
        for name, fn, osql in _surfaces():
            t0 = time.time()
            try:
                compare_query(spark, sf, fn, osql)
                res[name] = {"status": "green", "sec": round(time.time() - t0, 2)}
            except Exception as e:  # noqa: BLE001 — report, don't die
                res[name] = {
                    "status": "red",
                    "err": f"{type(e).__name__}: {e}"[:400],
                }
                bad += 1
            spark.catalog.clearCache()
            registry.reset_memos()
        out["sfs"][sf.rsplit("/", 1)[-1]] = res
    out["all_green"] = bad == 0
    print(json.dumps(out, indent=1))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
