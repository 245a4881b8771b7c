"""Reference-parity stress run (BASELINE.md protocol).

Mirrors the reference's stress harness — synthetic generator at 200 coins ×
30 days × 24 h = 144,000 rows (data_generator.py:209-216 defaults) through
the full Bronze→Silver→Gold medallion pipeline with per-stage wall-clock —
and prints ONE JSON line. Deterministic (seeded generator, fixed anchor
timestamp, fixed ingestion time), unlike the reference's wall-clock-anchored
run, so repeated runs are comparable.

Usage: python stress.py [--coins 200] [--days 30]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from high_volume_market_data_pipeline_spark.plans.medallion import (  # noqa: E402
    run_medallion,
)
from high_volume_market_data_pipeline_spark.session import build_session  # noqa: E402
from high_volume_market_data_pipeline_spark.sources.generator import (  # noqa: E402
    generate_market_data,
)
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coins", type=int, default=200)
    ap.add_argument("--days", type=int, default=30)
    args = ap.parse_args()

    spark = build_session(app_name="hvmdp-stress")
    root = tempfile.mkdtemp(prefix="hvmdp_stress_")
    try:
        t0 = time.perf_counter()
        source = generate_market_data(spark, args.coins, args.days)
        timings = run_medallion(
            spark,
            source,
            root,
            ingestion_time=F.lit(
                datetime(2024, 7, 1, tzinfo=timezone.utc)
            ).cast("timestamp"),
        )
        total = time.perf_counter() - t0
        n_rows = args.coins * args.days * 24
        print(
            json.dumps(
                {
                    "metric": "stress_total_seconds",
                    "value": round(total, 3),
                    "unit": "sec",
                    "rows": n_rows,
                    "rows_per_sec": round(n_rows / total),
                    "stages": {k: round(v, 3) for k, v in timings.items()},
                    "coins": args.coins,
                    "days": args.days,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
