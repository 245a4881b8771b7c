"""A/B pricing of the append-path auto-purge hook (verdict r11 #1).

Runs ``stream_ivf_index_ingest`` median-of-3 twice at $SPARK_GRAFT_SF_DIR
(default sf0.1): stock, and with ``index_store._maybe_auto_purge``
replaced by a no-op — isolating what the hook added to the r11 ingest
row. Two facts bound the expected ratio at ~1.0: the ingest query never
deletes, so the hook exits at the tombstone-table ``exists()`` probe (one
directory stat per append); and since r12 the tombstone-present path is
metadata-only too (``n_rows`` from the coded head manifest, no count()
scan — see index_store._coded_head_rows).

Usage: python tools/bench_ab_autopurge.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median3(fn) -> list[float]:
    runs = []
    for _ in range(3):
        start = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - start, 3))
    return runs


def main() -> int:
    from high_volume_market_data_pipeline_spark.queries import QUERIES
    from high_volume_market_data_pipeline_spark.session import build_session
    from high_volume_market_data_pipeline_spark.similarity import index_store

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="hvmdp-ab-autopurge")
    q = QUERIES["stream_ivf_index_ingest"]

    def run():
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()

    try:
        run()  # warmup: session + Python-source bootstrap out of the A/B
        with_hook = _median3(run)
        real = index_store._maybe_auto_purge
        index_store._maybe_auto_purge = lambda *_a, **_k: None
        try:
            without_hook = _median3(run)
        finally:
            index_store._maybe_auto_purge = real
        med = lambda xs: sorted(xs)[1]  # noqa: E731
        out = {
            "query": "stream_ivf_index_ingest",
            "sf_dir": sf_dir,
            "with_hook_runs": with_hook,
            "without_hook_runs": without_hook,
            "median_with": med(with_hook),
            "median_without": med(without_hook),
            "ratio_with_over_without": round(
                med(with_hook) / med(without_hook), 3
            ),
        }
        line = json.dumps(out)
        print(line)
        if len(sys.argv) > 1:
            with open(sys.argv[1], "w") as fh:
                fh.write(line + "\n")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
