"""Host-window health sentinel for bench recordings.

Two consecutive rounds (r8, r9) benched in windows with ~1.1-1.8x uniform
host drift, forcing per-query solo re-probes to separate real regressions
from noise. This sentinel makes the window check explicit and CHEAP: it
times a fixed 9-query probe set (stable plans since r7 — tfidf_top_terms
is excluded because its plan legitimately changed in r9) against their
BENCH_LOCAL_r07 values (the last verified-healthy window) and prints the
ratio. Record BENCH_LOCAL_r{N} only when the ratio is <= ~1.2; otherwise
record solo re-probes per mover, as r8/r9 did.

Usage: python tools/bench_sentinel.py [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from high_volume_market_data_pipeline_spark.queries import QUERIES  # noqa: E402
from high_volume_market_data_pipeline_spark.session import build_session  # noqa: E402

# (query, BENCH_LOCAL_r07 seconds) — plans unchanged since r7
REFERENCE = {
    "distinct_order_priorities": 0.349,
    "pricing_summary": 1.472,
    "knn_bruteforce_cosine": 0.95,
    "important_part_stock_q11": 1.323,
    "dedup_keep_latest_events": 0.639,
    "gold_daily_topk_stats": 1.544,
    "customer_order_revenue": 2.648,
    "top1_order_by_price": 0.146,
    "text_stats": 0.994,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="hvmdp-sentinel")
    try:
        # warmup: JVM + codegen + parquet footer caches
        QUERIES["distinct_order_priorities"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        timings: dict[str, float] = {}
        for name in REFERENCE:
            secs = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                secs.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(secs), 3)
    finally:
        spark.stop()
    total = round(sum(timings.values()), 3)
    ref_total = round(sum(REFERENCE.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_window_sentinel",
                "sentinel_total_sec": total,
                "reference_total_sec": ref_total,
                "ratio": round(total / ref_total, 3),
                "healthy": total / ref_total <= 1.2,
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
