#!/usr/bin/env python
"""Pre-registration verification of the queued r16/r17/r18 surfaces
on the FINAL r15 tree — the driver-style compare (rows + schema +
order-insensitive value hash vs DuckDB) at sf0.001 AND sf0.01 for
every library surface scheduled to register in the next rounds, so
the rotation note's "any driver red is regression, not design" claim
rests on evidence from THIS tree, not the r14 one (the r14
fp_clusters/contamination refactors touched shared machinery):

  r16: the 6 sub-item surfaces (audio snippet trio, image tile trio)
  r17: dedup_substring_cut + dedup_substring_cut_stored
  r18: decontaminate_bloom_prefilter + dedup_containment +
       contamination_stored

Usage: python scripts/preverify_queued_r15.py > R15_QUEUED_PREVERIFY.json
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
    from honors_p1_mapreduce_spark.operators import dedup as dd
    from honors_p1_mapreduce_spark.operators import multimodal as mm
    from honors_p1_mapreduce_spark.operators import substring_dedup as ss

    return [
        # r16 registrations
        ("media_audio_snippet_overlap", mm.media_audio_snippet_overlap,
         mm.MEDIA_AUDIO_SNIPPET_OVERLAP_ORACLE),
        ("media_audio_snippet_decontaminate",
         mm.media_audio_snippet_decontaminate,
         mm.MEDIA_AUDIO_SNIPPET_DECONTAMINATE_ORACLE),
        ("media_audio_snippet_decontaminate_stored",
         mm.media_audio_snippet_decontaminate_stored,
         mm.MEDIA_AUDIO_SNIPPET_DECONTAMINATE_STORED_ORACLE),
        ("media_image_tile_overlap", mm.media_image_tile_overlap,
         mm.MEDIA_IMAGE_TILE_OVERLAP_ORACLE),
        ("media_image_tile_decontaminate",
         mm.media_image_tile_decontaminate,
         mm.MEDIA_IMAGE_TILE_DECONTAMINATE_ORACLE),
        ("media_image_tile_decontaminate_stored",
         mm.media_image_tile_decontaminate_stored,
         mm.MEDIA_IMAGE_TILE_DECONTAMINATE_STORED_ORACLE),
        # r17 registrations
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
    ]


def main() -> int:
    from tests.oracle import compare_query

    spark = get_spark(app_name="preverify_queued_r15")
    out: dict = {
        "purpose": (
            "r16/r17/r18 registration pre-verification on the FINAL "
            "r15 tree (post fp_clusters + contamination refactors)"
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
