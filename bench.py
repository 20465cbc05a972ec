#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced with a cheap action (count on the already-reduced
result) — results are small aggregates, so the measured time is the
real scan/shuffle/agg work, not driver-side row shipping.
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

# Headline set: one representative per operator family — text parity
# (Q1-Q5), dedup, relational joins/aggs, event windows, similarity,
# text analysis, multimodal.
HEADLINE: tuple[str, ...] = (
    "wordcount",
    "wordcount_topk",
    "grep_count",
    "inverted_index",
    "bigrams",
    "log_analyzer",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "simhash_neardup",
    "winnow_neardup",
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue",
    "order_priority",
    "promo_revenue",
    "small_quantity_revenue",
    "top_supplier",
    "returns_rollup",
    "cross_nation_volume",
    "market_share",
    "disjunctive_revenue",
    "large_orders",
    "idle_customer_balance",
    "customer_order_counts",
    "monthly_revenue_running",
    "events_tumbling",
    "user_sessions",
    "events_props_stats",
    "purchase_click_attribution",
    "error_click_correlation",
    "pricing_percentiles",
    "cms_estimate",
    "hll_estimate",
    "tfidf_topk",
    "similarity_topk",
    "similarity_filtered_topk",
    "similarity_ann_topk",
    "similarity_ivf_topk",
    "quality_score",
    "token_counts",
    "contamination_check",
    "repetition_signals",
    "pii_scrub",
    "corpus_clean_funnel",
    "stratified_sample",
    "media_stats",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")

    names = [n for n in HEADLINE if n in registry.QUERIES]
    if not names:
        sys.exit("bench: HEADLINE/registry intersection is empty")
    # warm the JVM + parquet footers once so per-query numbers are steady-state
    registry.QUERIES[names[0]](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
