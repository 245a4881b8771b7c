"""Scale-soak of the table_stream offset protocol (verdict r11 #8).

Builds a versioned table with a few thousand real commits (the r11 soak
test exercised the same lifecycle at tens of versions), then catches up
through it with rate limits + RANDOM RESTARTS: the stream is killed
every few micro-batches and restarted on the same checkpoint/admission
pair, and the final leg goes through drain(). The artifact records
versions/sec for the build and the catch-up, per-segment batch counts,
the max batch width (bounded-catch-up proof: no restart may widen a
batch past the rate limit), and the duplicate-row count (exactly-once
proof: must be zero across every crash/restart cycle).

Usage: python tools/bench_stream_soak.py [out.json]
Env: SOAK_VERSIONS (default 2000), SOAK_ROWS_PER_VERSION (default 50),
     SOAK_MAX_VERSIONS_PER_BATCH (default 64), SOAK_SEED (default 12)
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_segment(
    spark, root, out, ckpt, adm, mvb, max_batches, head, timeout=600
):
    """One crash segment: run the bounded stream until ``max_batches``
    non-empty batches landed (or the head was reached), then kill it.
    Idempotent per-batch-id parquet sink, so an interrupted batch's
    replay overwrites instead of duplicating."""
    from high_volume_market_data_pipeline_spark.sources.table_datasource import (
        _offset_version,
    )

    sizes = []

    def sink(batch_df, batch_id):
        rows = batch_df.collect()
        if rows:
            batch_df.sparkSession.createDataFrame(
                rows, batch_df.schema
            ).write.mode("overwrite").parquet(
                os.path.join(out, f"b{batch_id}")
            )
            sizes.append(len(rows))

    q = (
        spark.readStream.format("table_stream")
        .option("root", root)
        .option("max_versions_per_batch", str(mvb))
        .option("admission_dir", adm)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    end_v = None
    try:
        deadline = time.time() + timeout
        while time.time() < deadline:
            if len(sizes) >= max_batches:
                break
            p = q.lastProgress
            if p and p.get("sources"):
                v = _offset_version(p["sources"][0].get("endOffset"))
                if v is not None:
                    end_v = v
                    if end_v >= head:
                        break
            if q.exception() is not None:
                raise q.exception()
            time.sleep(0.05)
    finally:
        q.stop()
    return sizes, end_v


def main() -> int:
    from high_volume_market_data_pipeline_spark.session import build_session
    from high_volume_market_data_pipeline_spark.sinks.history import (
        VersionedParquetTable,
    )
    from high_volume_market_data_pipeline_spark.sources.table_datasource import (
        drain,
        register_table_stream,
    )

    n_versions = int(os.environ.get("SOAK_VERSIONS", "2000"))
    rows_per = int(os.environ.get("SOAK_ROWS_PER_VERSION", "50"))
    mvb = int(os.environ.get("SOAK_MAX_VERSIONS_PER_BATCH", "64"))
    rng = random.Random(int(os.environ.get("SOAK_SEED", "12")))

    spark = build_session(app_name="hvmdp-stream-soak")
    register_table_stream(spark)
    scratch = tempfile.mkdtemp(prefix="hvmdp_soak_")
    out: dict = {
        "n_versions": n_versions,
        "rows_per_version": rows_per,
        "max_versions_per_batch": mvb,
    }
    try:
        root = os.path.join(scratch, "tbl")
        t = VersionedParquetTable(root)
        t0 = time.perf_counter()
        base = spark.range(rows_per).toDF("j")
        for v in range(n_versions):
            df = base.selectExpr(f"{v}::long * 100000 + j as id",
                                 f"'v{v}' as s").coalesce(1)
            if v == 0:
                t.write(df)
            else:
                t.append(df)
        build_s = time.perf_counter() - t0
        out["build_seconds"] = round(build_s, 1)
        out["build_versions_per_sec"] = round(n_versions / build_s, 1)

        sink_dir = os.path.join(scratch, "out")
        ckpt = os.path.join(scratch, "ckpt")
        adm = os.path.join(scratch, "adm")
        os.makedirs(sink_dir)
        segments = []
        t0 = time.perf_counter()
        caught_up = False
        while not caught_up and len(segments) < 200:
            max_batches = rng.randint(3, 10)
            sizes, end_v = _run_segment(
                spark, root, sink_dir, ckpt, adm, mvb, max_batches,
                head=n_versions - 1,
            )
            segments.append(
                {"batches": len(sizes), "max_rows": max(sizes, default=0),
                 "end_version": end_v}
            )
            caught_up = end_v is not None and end_v >= n_versions - 1
        # final leg through drain() — the availableNow-with-limits path;
        # on a fully-caught-up checkpoint this exercises the r12 no-op
        # short-circuit (returns 0 without starting a query)
        def drain_sink(bdf, bid):
            rows = bdf.collect()
            if rows:
                bdf.sparkSession.createDataFrame(
                    rows, bdf.schema
                ).write.mode("overwrite").parquet(
                    os.path.join(sink_dir, f"b{bid}")
                )

        drained = drain(
            spark,
            root,
            drain_sink,
            ckpt,
            options={"max_versions_per_batch": str(mvb),
                     "admission_dir": adm},
        )
        catchup_s = time.perf_counter() - t0
        out["catchup_seconds"] = round(catchup_s, 1)
        out["catchup_versions_per_sec"] = round(n_versions / catchup_s, 1)
        out["n_restarts"] = len(segments)
        out["drain_batches"] = drained
        out["segments"] = segments
        out["max_batch_rows"] = max(
            s["max_rows"] for s in segments
        )
        out["batch_bound_rows"] = mvb * rows_per

        import glob

        dirs = sorted(glob.glob(os.path.join(sink_dir, "b*")))
        got = spark.read.parquet(*dirs)
        n_rows = got.count()
        n_distinct = got.select("id").distinct().count()
        out["rows_emitted"] = n_rows
        out["rows_expected"] = n_versions * rows_per
        out["duplicate_rows"] = n_rows - n_distinct
        out["exactly_once"] = (
            n_rows == n_distinct == n_versions * rows_per
        )
        out["bounded"] = out["max_batch_rows"] <= out["batch_bound_rows"]

        line = json.dumps(out)
        print(line)
        if len(sys.argv) > 1:
            with open(sys.argv[1], "w") as fh:
                fh.write(line + "\n")
        return 0 if (out["exactly_once"] and out["bounded"]) else 1
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
