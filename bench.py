"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall-clock seconds.

Queries execute through the `noop` sink so the full plan runs distributed
(scan → shuffle → agg) without driver-collect overhead distorting timings.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from high_volume_market_data_pipeline_spark.queries import QUERIES  # noqa: E402
from high_volume_market_data_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = build_session(app_name="hvmdp-bench")
    timings: dict[str, float] = {}
    try:
        # JVM/codegen warmup on the smallest query so per-query numbers
        # reflect steady state, not first-job session setup.
        QUERIES["distinct_order_priorities"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        # The Python DataSource path pays a separate one-time bootstrap
        # (~10 s: Python runner + plan-side source pickling). Warm it with
        # a one-page read so paged_feed_rollup reports steady state
        # (measured 11.6 s cold vs 1.2 s warm, identical plans).
        from high_volume_market_data_pipeline_spark.sources.api_datasource import (
            register_paged_feed,
        )

        register_paged_feed(spark)
        spark.read.format("paged_feed").option("pages", 1).option(
            "page_size", 1
        ).load().write.format("noop").mode("overwrite").save()
        # EVERY row is median-of-3 — no duration cutoff. The micro-batch
        # engine's trigger scheduling gives ±2x run-to-run variance on
        # second-scale wall-clocks, and the expensive lifecycle queries
        # (index ingest, incremental dedup) were the only single-run rows
        # left, i.e. exactly the ones where a one-off stall is least
        # distinguishable from a regression. stream_* rows additionally
        # record micro-batch counts + rows/sec (streaming/ingest.
        # LAST_STREAM_STATS), which make churn (same work, different
        # batching) and regression (same batching, more seconds)
        # separable in the artifact.
        from high_volume_market_data_pipeline_spark.streaming import (
            ingest as _stream_ingest,
        )

        def _cpu_stat() -> list[int]:
            # (user nice system idle iowait irq softirq steal ...) jiffies
            with open("/proc/stat") as fh:
                return [int(x) for x in fh.readline().split()[1:]]

        run_log: dict[str, list[float]] = {}
        # Per-run host-health telemetry (r12): three recorded rounds now
        # show multi-minute ambient interference windows inflating a
        # contiguous band of rows 3-5x while bracketing sentinels read
        # healthy — per-row steal%/busy% makes those windows visible IN
        # the artifact instead of needing solo re-probes to litigate each
        # mover. Additive keys only; timings methodology unchanged.
        steal_log: dict[str, list[float]] = {}
        busy_log: dict[str, list[float]] = {}
        stream_stats: dict[str, dict] = {}
        for name in sorted(QUERIES):
            runs: list[float] = []
            batches: list[int] = []
            input_rows = None
            while len(runs) < 3:
                _stream_ingest.LAST_STREAM_STATS = None
                # Label the run (guide §1.5) so UI/eventlog analysis can
                # attribute jobs to queries; thread-local, zero cost.
                spark.sparkContext.setJobDescription(
                    f"bench:{name} run {len(runs) + 1}"
                )
                cpu0 = _cpu_stat()
                start = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - start)
                cpu1 = _cpu_stat()
                d = [a - b for a, b in zip(cpu1, cpu0)]
                tot = max(1, sum(d))
                # steal is field 8 of /proc/stat's cpu line; sandboxed or
                # older /proc implementations may expose fewer fields —
                # telemetry degradation must never fail the benchmark
                steal = 100.0 * d[7] / tot if len(d) > 7 else 0.0
                steal_log.setdefault(name, []).append(round(steal, 2))
                busy_log.setdefault(name, []).append(
                    round(100.0 * (d[0] + d[2]) / tot, 1)
                )
                spark.sparkContext.setJobDescription(None)
                stats = _stream_ingest.LAST_STREAM_STATS
                if stats:
                    batches.append(stats["micro_batches"])
                    input_rows = stats["input_rows"]
            t = sorted(runs)[len(runs) // 2]  # median
            timings[name] = round(t, 3)
            run_log[name] = [round(r, 3) for r in runs]
            if name.startswith("stream_"):
                entry: dict = {"runs": run_log[name]}
                if batches:
                    entry["micro_batches"] = batches
                if input_rows is not None:
                    entry["input_rows"] = input_rows
                    if t > 0:
                        entry["rows_per_sec"] = round(input_rows / t, 1)
                stream_stats[name] = entry
        total = round(sum(timings.values()), 3)
        # headline keys LAST: the driver records only the TAIL of stdout
        # (2000 chars), so the summary must sit at the end of the line to
        # survive truncation of the 142-entry per-query sections
        print(
            json.dumps(
                {
                    "queries": timings,
                    "runs": run_log,
                    "host_steal_pct": steal_log,
                    "host_busy_pct": busy_log,
                    "stream_stats": stream_stats,
                    "metric": "total_query_seconds",
                    "value": total,
                    "unit": "sec",
                    "sf": sf,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
