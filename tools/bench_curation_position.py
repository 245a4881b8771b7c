"""Diagnose curation_funnel's suite-vs-solo gap (verdict r11 #2).

r11 recorded 14.4 s in-suite vs 6.3 s solo (BENCH_CLUSTER_SCALE_r11).
bench.py runs queries in sorted-name order, so the exact in-suite context
is reproducible: the alphabetical prefix before "curation_funnel". This
tool measures the funnel median-of-3 in a ladder of positions within ONE
session — fresh-session solo, after the exact bench prefix, after the
stream_* family (python-worker churn hypothesis), after the heavy dedup
block (GC/codegen-cache pressure hypothesis) — and records the driver
JVM's cumulative GC time around every measured run, so the artifact
separates "where the seconds appear" from "whether GC explains them".

Usage: python tools/bench_curation_position.py [out.json]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _gc_ms(spark) -> int:
    beans = (
        spark._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    return sum(b.getCollectionTime() for b in beans)


def _measure(spark, fn, sf_dir, n=3) -> dict:
    runs, gcs = [], []
    for _ in range(n):
        g0 = _gc_ms(spark)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        gcs.append(_gc_ms(spark) - g0)
    return {
        "runs": runs,
        "median": sorted(runs)[len(runs) // 2],
        "gc_ms": gcs,
    }


def main() -> int:
    from high_volume_market_data_pipeline_spark.queries import QUERIES
    from high_volume_market_data_pipeline_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="hvmdp-curation-pos")
    funnel = QUERIES["curation_funnel"]
    out: dict = {"sf_dir": sf_dir, "positions": {}}
    try:
        # same warmup as bench.py
        QUERIES["distinct_order_priorities"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()

        out["positions"]["solo"] = _measure(spark, funnel, sf_dir)

        order = sorted(QUERIES)
        prefix = order[: order.index("curation_funnel")]
        t0 = time.perf_counter()
        for name in prefix:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        out["bench_prefix"] = {
            "queries": prefix,
            "seconds": round(time.perf_counter() - t0, 3),
        }
        out["positions"]["after_bench_prefix"] = _measure(
            spark, funnel, sf_dir
        )

        streams = [q for q in order if q.startswith("stream_")]
        for name in streams:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        out["positions"]["after_stream_family"] = _measure(
            spark, funnel, sf_dir
        )

        heavy = [
            "dedup_clusters",
            "minhash_lsh_near_dup",
            "ngram_jaccard_blocked",
            "ngram_jaccard_adaptive",
            "embedding_near_dup",
            "knn_pq_adc",
            "knn_ivf_pq",
        ]
        for name in heavy:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        out["positions"]["after_heavy_dedup"] = _measure(
            spark, funnel, sf_dir
        )

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
