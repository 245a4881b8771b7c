"""Scaling bench: run a scale-critical query subset at sf0.1 and at the
10x tier built by tools/make_scale_data.py, and report the wall-clock
ratio per query.

A data-linear operator on local[32] should show ratio <= ~10 on a 10x
input (usually much less, because per-job fixed overhead amortizes); a
super-linear ratio flags a plan that would not survive 100 TB. Results go
to stdout as one JSON line; BASELINE.md records the table.

Run SOLO (no concurrent pytest/bench) — NOTES.md documents +-45% timing
drift on a loaded host.

Usage: python tools/bench_scale.py [--out BENCH_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from high_volume_market_data_pipeline_spark.queries import QUERIES  # noqa: E402
from high_volume_market_data_pipeline_spark.session import build_session  # noqa: E402

# The most expensive bench rows plus every operator family whose 100-TB
# story rests on a blocking/bucketing design worth measuring.
SCALE_SET = [
    "pricing_summary",            # full-scan agg (q1)
    "revenue_by_nation_q5",       # multi-join + broadcast dims
    "large_volume_customers_q18", # big-side groupBy + semi join
    "market_share_q8",            # deep join tree
    "sessionize_events_batch",    # window over user partitions
    "user_event_run_features",    # bucketed applyInPandas
    "minhash_lsh_near_dup",       # banded LSH pair generation
    "simhash_documents",          # pure column-expr hashing
    "ngram_jaccard_blocked",      # blocked quadratic (honest exact path)
    "dedup_clusters",             # iterative connected components
    "embedding_near_dup",         # sign-LSH bucket equi-join
    "knn_ivf_cells",              # k-means fit + inverted lists
    "tfidf_top_terms",            # two-pass corpus stats
    "curation_funnel",            # 4-stage composite plan
    # late-round-3 additions (market microstructure + source triage):
    # rollup-then-window designs whose scale story is one fact shuffle
    "twap_user_daily",
    "max_drawdown_user",
    "bollinger_breakouts",
    "rsi_event_types",
    "source_reliability",
    "event_type_correlations",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
)


def _run(spark, name: str, sf_dir: str) -> float:
    start = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - start, 3)


def _embedding_near_dup_planes(spark, sf_dir: str, n_planes: int) -> float:
    """The embedding_near_dup pipeline with a chosen sign-LSH plane count.

    The registered query pins n_planes=2 (its oracle embeds those two
    hyperplanes as literals); at 10x data that fixed bucket count goes
    quadratic per bucket. The 100-TB rule is planes ~ log2(n /
    target_bucket_size): each extra plane halves expected bucket
    occupancy. This variant measures that rule empirically."""
    from pyspark.sql import functions as F

    from high_volume_market_data_pipeline_spark.catalog import load_table
    from high_volume_market_data_pipeline_spark.dedup import (
        embedding_near_dup_pairs,
    )
    from high_volume_market_data_pipeline_spark.similarity.knn import (
        random_hyperplane_buckets,
    )

    start = time.perf_counter()
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 10 == 0
    )
    emb = random_hyperplane_buckets(emb, n_planes=n_planes, dim=64)
    out = embedding_near_dup_pairs(emb, block_col="bucket", threshold=0.3)
    out.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - start, 3)


def _ngram_jaccard_adaptive(spark, sf_dir: str, target_block_rows: int) -> float:
    """The ngram_jaccard_blocked pipeline with the adaptive block-width
    knob (dedup/ngram.token_block_pairs): width = clamp(target·spread/n,
    1, 8), so block occupancy stays ≈ target as the corpus grows and the
    fixed-width 84× quadratic collapses toward linear. Width floors at 1
    token — past that the lever is an extra block key."""
    from pyspark.sql import functions as F

    from high_volume_market_data_pipeline_spark.catalog import load_table
    from high_volume_market_data_pipeline_spark.dedup.ngram import (
        ngram_jaccard,
        token_block_pairs,
    )

    start = time.perf_counter()
    docs = load_table(spark, sf_dir, "documents")
    pairs = token_block_pairs(
        docs, block_tokens=8, target_block_rows=target_block_rows
    )
    out = (
        ngram_jaccard(pairs, docs, "text", "doc_id", hashed=True)
        .filter(F.col("jaccard") >= 0.3)
        .select("id_a", "id_b", "jaccard")
    )
    out.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - start, 3)


# The 100× tier's headline subset (BASELINE.md "second decade" table):
# one representative per scale-critical family — full-scan agg, join
# tree, event resample/window, text hashing, banded LSH, the market
# rollup-then-window family, source triage, pair moments.
SF10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf10"
)
SF10_SET = [
    "pricing_summary",
    "revenue_by_nation_q5",
    "ohlc_resample_events",
    "sessionize_events_batch",
    "simhash_documents",
    "minhash_lsh_near_dup",
    "twap_user_daily",
    "max_drawdown_user",
    "bollinger_breakouts",
    "rsi_event_types",
    "source_reliability",
    "event_type_correlations",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--sf10",
        action="store_true",
        help="also run the headline subset at the 100x tier "
        "(make_scale_data.py --copies 100 --out .scale/sf10 first)",
    )
    args = ap.parse_args()
    if not os.path.isdir(SF1):
        raise SystemExit("run tools/make_scale_data.py first")
    if args.sf10 and not os.path.isdir(SF10):
        raise SystemExit(
            "run tools/make_scale_data.py --copies 100 --out .scale/sf10 first"
        )
    spark = build_session(app_name="hvmdp-bench-scale")
    rows: dict[str, dict[str, float]] = {}
    try:
        _run(spark, "distinct_order_priorities", SF01)  # warmup
        for name in SCALE_SET:
            try:
                t_small = _run(spark, name, SF01)
                t_big = _run(spark, name, SF1)
            except Exception as exc:  # keep the sweep going; record it
                rows[name] = {"error": str(exc).splitlines()[0][:200]}
                print(f"# {name}: ERROR {rows[name]['error']}",
                      file=sys.stderr)
                continue
            rows[name] = {
                "sf0.1_sec": t_small,
                "sf1_sec": t_big,
                "ratio": round(t_big / t_small, 2),
            }
            print(f"# {name}: {t_small}s -> {t_big}s ({rows[name]['ratio']}x)",
                  file=sys.stderr)
        # Scale-law check: at 10x vectors, +4 planes (4 bucket-halvings
        # vs 10x growth) should hold per-bucket pair counts near sf0.1
        # levels — the ratio must collapse vs the fixed-plane row above.
        try:
            t_small = _embedding_near_dup_planes(spark, SF01, 2)
            t_big = _embedding_near_dup_planes(spark, SF1, 6)
            rows["embedding_near_dup_scaled_planes"] = {
                "sf0.1_sec": t_small,
                "sf1_sec": t_big,
                "ratio": round(t_big / t_small, 2),
            }
            print(
                f"# embedding_near_dup_scaled_planes: {t_small}s -> {t_big}s",
                file=sys.stderr,
            )
        except Exception as exc:
            rows["embedding_near_dup_scaled_planes"] = {
                "error": str(exc).splitlines()[0][:200]
            }
        # Scale-law check: adaptive block width (∝ 1/n) must collapse the
        # fixed-width 84× quadratic toward linear at 10x docs.
        try:
            t_small = _ngram_jaccard_adaptive(spark, SF01, 32)
            t_big = _ngram_jaccard_adaptive(spark, SF1, 32)
            rows["ngram_jaccard_adaptive_width"] = {
                "sf0.1_sec": t_small,
                "sf1_sec": t_big,
                "ratio": round(t_big / t_small, 2),
            }
            print(
                f"# ngram_jaccard_adaptive_width: {t_small}s -> {t_big}s",
                file=sys.stderr,
            )
        except Exception as exc:
            rows["ngram_jaccard_adaptive_width"] = {
                "error": str(exc).splitlines()[0][:200]
            }
        sf10_rows: dict[str, float | str] = {}
        if args.sf10:
            for name in SF10_SET:
                try:
                    sf10_rows[name] = _run(spark, name, SF10)
                except Exception as exc:
                    sf10_rows[name] = "ERR " + str(exc).splitlines()[0][:160]
                print(f"# sf10 {name}: {sf10_rows[name]}", file=sys.stderr)
    finally:
        spark.stop()
    ok = [r for r in rows.values() if "ratio" in r]
    doc = {
        "metric": "scale_ratio_10x",
        "unit": "sec",
        "queries": rows,
        "copies": 10,
        "worst_ratio": max((r["ratio"] for r in ok), default=None),
        "n_errors": len(rows) - len(ok),
    }
    if args.sf10:
        doc["sf10_seconds"] = sf10_rows
    line = json.dumps(doc)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
