#!/usr/bin/env python
"""Pre-verify every queued-but-unregistered library surface on the
FINAL r17 tree (the r14/r15/r16 preverify convention): oracle parity
at sf0.001 AND sf0.01 for

  r18: decontaminate_bloom_prefilter, dedup_containment,
       contamination_stored            (built r15)
  r19: corpus_snapshot_diff, winnow_index_refresh,
       winnow_index_refresh_stored     (built r16; stored twin r17)
  r20: pq_index_refresh                (built r17)
  r21: lm_model_refresh                (built r17)

so their eventual driver rows are regression checks, not first
contact. Exit 0 iff everything is green; JSON report to stdout
(committed as R17_QUEUED_PREVERIFY.json).
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
    from honors_p1_mapreduce_spark.operators import lm_quality as lm
    from honors_p1_mapreduce_spark.operators import pq

    return [
        # r18 registrations (built r15)
        ("decontaminate_bloom_prefilter", cu.decontaminate_bloom_prefilter,
         cu.DECONTAMINATE_BLOOM_PREFILTER_ORACLE),
        ("dedup_containment", dd.containment_pairs, dd.CONTAINMENT_ORACLE),
        ("contamination_stored", cu.contamination_stored,
         cu.CONTAMINATION_STORED_ORACLE),
        # r19 registrations (built r16 + the r17 stored twin)
        ("corpus_snapshot_diff", cx.corpus_snapshot_diff,
         cx.CORPUS_SNAPSHOT_DIFF_ORACLE),
        ("winnow_index_refresh", cx.winnow_index_refresh,
         cx.WINNOW_INDEX_REFRESH_ORACLE),
        ("winnow_index_refresh_stored", cx.winnow_index_refresh_stored,
         cx.WINNOW_INDEX_REFRESH_STORED_ORACLE),
        # r20 registration (built r17)
        ("pq_index_refresh", pq.pq_index_refresh,
         pq.PQ_INDEX_REFRESH_ORACLE),
        # r21 registration (built r17)
        ("lm_model_refresh", lm.lm_model_refresh,
         lm.LM_MODEL_REFRESH_ORACLE),
    ]


def main() -> int:
    from tests.oracle import compare_query

    spark = get_spark(app_name="preverify_queued_r17")
    out: dict = {
        "purpose": (
            "r18/r19/r20/r21 registration pre-verification on the FINAL "
            "r17 tree"
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
