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
import statistics
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
    # the SCALE-SAFE exact-Jaccard config (adaptive width + prefix key);
    # the fixed-width-8 twin is a measured known quadratic (86x on 10x,
    # 542s at sf1 — BASELINE.md r4 row) and is excluded from the sweep:
    # re-timing an unchanged O(n^2) plan x3 runs buys nothing.
    "ngram_jaccard_adaptive",
    "dedup_clusters",             # iterative connected components
    "embedding_near_dup",         # sign-LSH bucket equi-join, auto-planes
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
    # streaming HLL fold: per-batch shuffle is sketch-sized (batch rows
    # once for the rollup + |groups| state rows), so the 10x ratio must
    # track input volume, not state size
    "stream_distinct_sketch_state",
    # stateful store cycle: bootstrap half the corpus, admit the rest —
    # its row also records the admitted/rejected breakdown per tier
    # (the replicated corpus is near-dup-dense, so rejections GROW with
    # scale; recording them makes that claim checkable)
    "incremental_dedup_admission",
]

# Queries whose output is a per-doc decision report: their sweep rows
# carry the decision breakdown (admitted vs rejected counts) per tier.
DECISION_QUERIES = {"incremental_dedup_admission"}


def _decision_counts(spark, name: str, sf_dir: str) -> dict[str, int]:
    rows = (
        QUERIES[name](spark, sf_dir)
        .groupBy("decision")
        .count()
        .collect()
    )
    return {r["decision"]: r["count"] for r in rows}

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
)

# Pair generators whose ratio defense is "output grows ~10× too": their
# rows carry the emitted-pair count per tier so 'output-proportional' is
# checkable from the artifact, not asserted (round-5 verdict item 3).
PAIR_QUERIES = {
    "ngram_jaccard_adaptive",
    "minhash_lsh_near_dup",
    "embedding_near_dup",
}


def _count_rows(spark, name: str, sf_dir: str) -> int:
    """Output cardinality for a pair generator — a separate untimed run,
    so the evidence never perturbs the timing medians."""
    return QUERIES[name](spark, sf_dir).count()


def _resolved_ngram_knobs(spark, sf_dir: str) -> dict[str, int]:
    """Which (width, prefix-bucket) regime the adaptive n-gram block key
    resolves to on this tier's actual corpus (the b>1 regime only engages
    once width floors at 1 — record where each tier lands)."""
    from high_volume_market_data_pipeline_spark.catalog import load_table
    from high_volume_market_data_pipeline_spark.dedup.ngram import (
        resolve_block_knobs,
    )
    from high_volume_market_data_pipeline_spark.queries_dedup import _NJ_TARGET

    docs = load_table(spark, sf_dir, "documents")
    width, b = resolve_block_knobs(
        docs, block_tokens=8, target_block_rows=_NJ_TARGET
    )
    return {"width": width, "prefix_buckets": b}


def _ngram_recall(spark, sf_dir: str) -> dict:
    """Recall of the adaptive block key vs the width-8 exact twin on the
    tier's REAL corpus (the synthetic-corpus test pins the mechanism; this
    pins the number on scale data). Expensive — the fixed-width config is
    a measured quadratic at sf1 — so it runs only under --ngram-recall."""
    from high_volume_market_data_pipeline_spark.queries_dedup import (
        ngram_jaccard_adaptive,
        ngram_jaccard_blocked,
    )

    from high_volume_market_data_pipeline_spark.dedup.ngram import (
        ADAPTIVE_RECALL_FLOOR,
    )

    fixed = ngram_jaccard_blocked(spark, sf_dir).select("id_a", "id_b").cache()
    adapt = (
        ngram_jaccard_adaptive(spark, sf_dir).select("id_a", "id_b").cache()
    )
    n_fixed = fixed.count()
    n_adapt = adapt.count()
    n_hit = adapt.join(fixed, ["id_a", "id_b"]).count()
    fixed.unpersist()
    adapt.unpersist()
    recall = round(n_hit / n_fixed, 4) if n_fixed else None
    return {
        "fixed_pairs": n_fixed,
        "adaptive_pairs": n_adapt,
        "hit": n_hit,
        "recall": recall,
        "floor": ADAPTIVE_RECALL_FLOOR,
        "meets_floor": (recall is not None and recall >= ADAPTIVE_RECALL_FLOOR),
    }


def _ngram_recall_sampled(spark, sf_dir: str, sample_buckets: int = 10) -> dict:
    """Recall at a tier whose exact width-8 twin is unaffordable (sf10:
    the fixed config is a measured quadratic — hours at 500k docs).
    Method: resolve the adaptive knobs on the FULL tier corpus (the
    production config), then replay pair generation with those FORCED
    knobs on a deterministic 1/``sample_buckets`` md5 document stratum and
    compare against the width-8 twin on the same stratum. A pair's
    co-block fate depends only on its two documents' (lang, token count,
    prefix hash), so stratum recall under production knobs is an unbiased
    estimate of full-corpus recall over stratum-internal pairs."""
    from pyspark.sql import functions as F

    from high_volume_market_data_pipeline_spark.catalog import load_table
    from high_volume_market_data_pipeline_spark.dedup.ngram import (
        ADAPTIVE_RECALL_FLOOR,
        block_pairs_with_knobs,
        ngram_jaccard,
        resolve_block_knobs,
    )
    from high_volume_market_data_pipeline_spark.operators.sampling import (
        hash_bucket,
    )
    from high_volume_market_data_pipeline_spark.queries_dedup import _NJ_TARGET

    docs = load_table(spark, sf_dir, "documents")
    width, b = resolve_block_knobs(
        docs, block_tokens=8, target_block_rows=_NJ_TARGET
    )
    sub = docs.filter(
        hash_bucket(F.col("doc_id").cast("string"), sample_buckets) == 0
    ).localCheckpoint(eager=True)

    def scored(pairs):
        return (
            ngram_jaccard(pairs, sub, "text", "doc_id", hashed=True)
            .filter(F.col("jaccard") >= 0.3)
            .select("id_a", "id_b")
        )

    adapt = scored(block_pairs_with_knobs(sub, width, b)).cache()
    fixed = scored(block_pairs_with_knobs(sub, 8, 1)).cache()
    n_fixed = fixed.count()
    n_adapt = adapt.count()
    n_hit = adapt.join(fixed, ["id_a", "id_b"]).count()
    adapt.unpersist()
    fixed.unpersist()
    recall = round(n_hit / n_fixed, 4) if n_fixed else None
    return {
        "stratum": f"1/{sample_buckets} md5 doc sample, "
        "knobs resolved on the full tier",
        "knobs": {"width": width, "prefix_buckets": b},
        "fixed_pairs": n_fixed,
        "adaptive_pairs": n_adapt,
        "hit": n_hit,
        "recall": recall,
        "floor": ADAPTIVE_RECALL_FLOOR,
        "meets_floor": (recall is not None and recall >= ADAPTIVE_RECALL_FLOOR),
    }


def _run_once(spark, name: str, sf_dir: str) -> float:
    start = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - start, 3)


def _run(spark, name: str, sf_dir: str, runs: int = 3) -> float:
    """Median of ``runs`` solo executions. Every ratio row needs BOTH
    tiers measured this way: single runs mix JIT warmup and host drift
    into the ratio (a 1.5 s vs 8 s base once swung a printed ratio from
    5.6x to 21x with no plan change — round-4 verdict), and the median
    of 3 is the cheapest estimator that survives one outlier."""
    return round(statistics.median(
        _run_once(spark, name, sf_dir) for _ in range(runs)
    ), 3)


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
        "--runs",
        type=int,
        default=3,
        help="solo runs per (query, tier); the MEDIAN is recorded — "
        "both tiers of every ratio row get the same treatment",
    )
    ap.add_argument(
        "--sf10",
        action="store_true",
        help="also run the headline subset at the 100x tier "
        "(make_scale_data.py --copies 100 --out .scale/sf10 first)",
    )
    ap.add_argument(
        "--ngram-recall",
        action="store_true",
        help="measure adaptive-vs-width-8 n-gram pair recall at sf1 "
        "(runs the known-quadratic fixed config once; ~10 min)",
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
        _run(spark, "distinct_order_priorities", SF01, runs=1)  # warmup
        for name in SCALE_SET:
            try:
                t_small = _run(spark, name, SF01, runs=args.runs)
                t_big = _run(spark, name, SF1, runs=args.runs)
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
            if name in PAIR_QUERIES:
                p_small = _count_rows(spark, name, SF01)
                p_big = _count_rows(spark, name, SF1)
                rows[name]["pairs_sf0.1"] = p_small
                rows[name]["pairs_sf1"] = p_big
                if p_small:
                    rows[name]["pairs_ratio"] = round(p_big / p_small, 2)
                    # pairs/sec flat-or-better across tiers = the work
                    # grew with the OUTPUT, not quadratically with input
                    rows[name]["pairs_per_sec_sf0.1"] = round(
                        p_small / t_small, 1
                    )
                    rows[name]["pairs_per_sec_sf1"] = round(p_big / t_big, 1)
            if name == "ngram_jaccard_adaptive":
                rows[name]["knobs_sf0.1"] = _resolved_ngram_knobs(spark, SF01)
                rows[name]["knobs_sf1"] = _resolved_ngram_knobs(spark, SF1)
            if name in DECISION_QUERIES:
                rows[name]["decisions_sf0.1"] = _decision_counts(
                    spark, name, SF01
                )
                rows[name]["decisions_sf1"] = _decision_counts(
                    spark, name, SF1
                )
            # A sub-2s base is dominated by per-job fixed overhead — its
            # ratio says nothing about the plan's data-scaling. Keep the
            # seconds, flag the ratio (NOTES.md rule, enforced here).
            if t_small < 2.0:
                rows[name]["base_lt_2s"] = True
            print(f"# {name}: {t_small}s -> {t_big}s ({rows[name]['ratio']}x)",
                  file=sys.stderr)
        sf10_rows: dict[str, float | str] = {}
        if args.sf10:
            # same median-of-N as the ratio rows: the round-5 artifact
            # committed a single cold run (pricing_summary 132 s vs a
            # true ~5 s) because this loop bypassed _run — never again
            for name in SF10_SET:
                try:
                    sf10_rows[name] = _run(spark, name, SF10, runs=args.runs)
                    if name in PAIR_QUERIES:
                        sf10_rows[name + "_pairs"] = _count_rows(
                            spark, name, SF10
                        )
                except Exception as exc:
                    sf10_rows[name] = "ERR " + str(exc).splitlines()[0][:160]
                print(f"# sf10 {name}: {sf10_rows[name]}", file=sys.stderr)
        recall_row = None
        recall_sf10_row = None
        if args.ngram_recall:
            recall_row = _ngram_recall(spark, SF1)
            print(f"# ngram recall sf1: {recall_row}", file=sys.stderr)
            if args.sf10:
                recall_sf10_row = _ngram_recall_sampled(spark, SF10)
                print(
                    f"# ngram recall sf10 (stratum): {recall_sf10_row}",
                    file=sys.stderr,
                )
    finally:
        spark.stop()
    ok = [r for r in rows.values() if "ratio" in r]
    doc = {
        "metric": "scale_ratio_10x",
        "unit": "sec",
        "queries": rows,
        "copies": 10,
        "runs_per_point": args.runs,
        "worst_ratio": max((r["ratio"] for r in ok), default=None),
        "n_errors": len(rows) - len(ok),
    }
    if args.sf10:
        doc["sf10_seconds"] = sf10_rows
        doc["sf10_runs_per_point"] = args.runs
    if recall_row is not None:
        doc["ngram_recall_sf1"] = recall_row
    if recall_sf10_row is not None:
        doc["ngram_recall_sf10"] = recall_sf10_row
    line = json.dumps(doc)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
