"""Tests for the extended analytics queries beyond oracle parity:
approximation error bounds and physical-plan shape (the plans we'd want at
100 TB, asserted so regressions surface in CI, not in production)."""

from __future__ import annotations

from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.queries_analytics import (
    approx_distinct_users,
    revenue_by_nation_q5,
    shipping_priority_q3,
    user_peak_event,
)
from tests.conftest import SF_DIR


def test_approx_distinct_within_error(spark):
    """HLL++ at rsd=0.02 must land within 5% of the exact distinct count."""
    from high_volume_market_data_pipeline_spark.catalog import load_table

    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_users(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 0.05 * n), (et, approx[et], n)


def test_q3_plans_top_k_not_full_sort(spark):
    """Global top-10 must plan as TakeOrderedAndProject (heap per partition
    + driver merge), never a full global sort of the aggregate."""
    plan = shipping_priority_q3(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_q5_broadcasts_dims(spark):
    """nation/region joins must be broadcast — a shuffle join on a 5-row dim
    at 100 TB wastes a full exchange of the fact table."""
    plan = revenue_by_nation_q5(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_user_peak_event_is_hash_agg_not_window(spark):
    """Arg-max via max(struct) must plan as a partial+final aggregate
    (SortAggregate — struct max isn't hash-aggregable), not a window sort:
    the shuffle then carries one partial row per (user, task), and windows
    can't partial-aggregate map-side."""
    plan = user_peak_event(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan, plan
    assert "Window" not in plan, plan


def test_approx_percentiles_rank_accuracy(spark):
    """The sketch returns a real data point whose RANK must sit within the
    accuracy bound of the target quantile (value distance is the wrong
    metric: exact percentile interpolates, the sketch doesn't, and the gap
    between adjacent order statistics can be large in small groups)."""
    from high_volume_market_data_pipeline_spark.catalog import load_table
    from high_volume_market_data_pipeline_spark.queries_analytics import (
        approx_value_percentiles,
    )

    approx = {
        r["event_type"]: (r["p50"], r["p95"], r["p99"])
        for r in approx_value_percentiles(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    values = {}
    for r in ev.select("event_type", "value").collect():
        values.setdefault(r["event_type"], []).append(r["value"])
    for et, targets in approx.items():
        vs = sorted(values[et])
        n = len(vs)
        for q, a in zip((0.5, 0.95, 0.99), targets):
            rank_frac = sum(1 for v in vs if v <= a) / n
            # accuracy=10000 ⇒ rank error ≤ 1/10000, plus 1/n discreteness
            assert abs(rank_frac - q) <= 1 / 10_000 + 1.5 / n, (
                et, q, a, rank_frac, n,
            )


def test_pii_redaction_on_pii_text(spark):
    """The synthetic corpus has no PII, so the registered query only pins
    the no-false-positive property; THIS pins actual redaction — and that
    Spark (Java regex) and DuckDB (RE2) agree on real PII text."""
    import os
    import tempfile

    import duckdb

    from high_volume_market_data_pipeline_spark.queries_text import (
        pii_redact_documents,
    )
    from high_volume_market_data_pipeline_spark.queries import ORACLE_SQL

    rows = [
        (0, "contact bob.smith+x@example.co.uk or call +1 (415) 555-0199 now",
         "en", "s", 60),
        (1, "see https://ex.com/a?b=c#d and mail root@ex.org", "en", "s", 46),
        (2, "no pii here just words", "en", "s", 22),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        got = {r["doc_id"]: r for r in pii_redact_documents(spark, tmp).collect()}
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(tmp, 'documents.parquet')}/*.parquet')"
        )
        oracle = con.execute(ORACLE_SQL["pii_redact_documents"]).df()

    assert got[0]["redacted"] == "contact <EMAIL> or call <PHONE> now"
    assert got[0]["n_redactions"] == 2
    assert got[1]["redacted"] == "see <URL> and mail <EMAIL>"
    assert got[1]["n_redactions"] == 2
    assert got[2]["redacted"] == rows[2][1]
    assert got[2]["n_redactions"] == 0
    # Cross-engine: DuckDB's RE2 must produce byte-identical redactions.
    for _, orow in oracle.iterrows():
        srow = got[orow["doc_id"]]
        assert srow["redacted"] == orow["redacted"], orow["doc_id"]
        assert srow["n_redactions"] == orow["n_redactions"]


def test_repetition_stats_flag_boilerplate(spark):
    """A doc that is one phrase repeated must score high bigram repetition
    and low distinct ratio; a all-distinct doc scores 1.0 / 0.0."""
    import os
    import tempfile

    from high_volume_market_data_pipeline_spark.queries_text import (
        doc_repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (0, "buy now buy now buy now buy now", "en", "s", 31),
            (1, "all tokens here are fully unique", "en", "s", 32),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {r["doc_id"]: r for r in doc_repetition_stats(spark, tmp).collect()}
    rep = out[0]
    assert rep["n_tokens"] == 8 and rep["n_distinct"] == 2
    assert rep["distinct_ratio"] == 0.25
    assert rep["top_token_share"] == 0.5
    # 7 bigrams, 2 distinct ("buy now", "now buy") -> 5/7 repeated
    assert abs(rep["bigram_rep_ratio"] - 5 / 7) < 1e-6
    uniq = out[1]
    assert uniq["distinct_ratio"] == 1.0
    assert uniq["bigram_rep_ratio"] == 0.0


def test_hll_sketch_union_exactness_and_accuracy(spark):
    """The mergeable-sketch contract: (a) union of daily sketches has
    IDENTICAL register state to one direct sketch over all days — the
    estimates are exactly equal, not just close (HLL registers keep the
    max rank per bucket; max is associative); (b) the estimate lands
    within 5% of the exact distinct count at lgK=12."""
    from high_volume_market_data_pipeline_spark.catalog import load_table
    from high_volume_market_data_pipeline_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_rollup,
    )
    from high_volume_market_data_pipeline_spark.queries_analytics import (
        hll_incremental_distinct,
    )

    ev = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    merged = {
        r["event_type"]: r["approx_users"]
        for r in hll_incremental_distinct(spark, SF_DIR).collect()
    }
    direct = {
        r["event_type"]: r["approx_users"]
        for r in hll_rollup(ev, ["event_type"], "user_id")
        .select("event_type", hll_estimate(F.col("sketch")).alias("approx_users"))
        .collect()
    }
    assert merged == direct  # union-exactness: same register state
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for et, est in merged.items():
        assert abs(est - exact[et]) / exact[et] < 0.05, (et, est, exact[et])
    # re-slicing without the fact table: monthly from the daily sketches
    daily = hll_rollup(ev, ["event_type", "day"], "user_id")
    monthly = hll_merge(
        daily.withColumn("month", F.trunc("day", "month")),
        ["event_type", "month"],
    )
    assert monthly.count() > 0


def test_random_projection_preserves_relative_distances(spark):
    """JL sanity on the testdata embeddings: for a sample of vector
    triples where d(a,b) << d(a,c) in 64-d, the 8-d projection keeps the
    order most of the time (loose: >= 70% of clearly-separated triples),
    and the projection is deterministic across runs."""
    import itertools

    from high_volume_market_data_pipeline_spark.catalog import load_table
    from high_volume_market_data_pipeline_spark.similarity.knn import (
        random_projection,
    )

    emb = load_table(spark, SF_DIR, "embeddings").filter(
        F.col("vec_id") < 30
    )
    proj = random_projection(emb, out_dim=8)
    rows = proj.select("vec_id", "embedding", *[f"p{j}" for j in range(8)]).collect()
    rows2 = proj.select("vec_id", *[f"p{j}" for j in range(8)]).collect()
    assert {tuple(r) for r in rows2} == {
        (r["vec_id"], *[r[f"p{j}"] for j in range(8)]) for r in rows
    }  # deterministic re-run

    import math

    def d_full(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a["embedding"], b["embedding"])))

    def d_proj(a, b):
        return math.sqrt(
            sum((a[f"p{j}"] - b[f"p{j}"]) ** 2 for j in range(8))
        )

    ok = total = 0
    # random 64-d vectors concentrate: pairwise distances are all close,
    # so "clearly separated" means ratio >= 1.15 here (calibrated on the
    # testdata — ratio 1.5 simply never occurs among random vectors)
    for a, b, c in itertools.islice(itertools.combinations(rows, 3), 2000):
        full_ab, full_ac = d_full(a, b), d_full(a, c)
        if full_ab == 0 or full_ac == 0:
            continue
        lo, hi = sorted([full_ab, full_ac])
        if hi / lo < 1.15:
            continue
        total += 1
        if (d_proj(a, b) < d_proj(a, c)) == (full_ab < full_ac):
            ok += 1
    assert total > 0
    assert ok / total >= 0.7, f"{ok}/{total}"


def test_winsorized_stats_invariants(spark):
    """Clipped mean must lie inside [p01, p99]; clip counts are bounded by
    the 1% tails (rank-pick thresholds: strictly-below-p01 rows number at
    most ceil(0.01 n) - 1, same above p99)."""
    from high_volume_market_data_pipeline_spark.queries_analytics import (
        winsorized_value_stats,
    )

    rows = winsorized_value_stats(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["p01"] <= r["winsorized_mean"] <= r["p99"]
        bound = -(-r["n_events"] // 100)  # ceil(n/100)
        assert r["n_clipped_low"] <= bound
        assert r["n_clipped_high"] <= bound


def test_quality_weighted_sample_rate_tracks_quality(spark):
    """Deterministic importance sampling: the realized keep rate must be
    within a few points of the mean clamped quality (md5 draws are
    uniform), and membership is identical across runs."""
    from high_volume_market_data_pipeline_spark.catalog import load_table
    from high_volume_market_data_pipeline_spark.functions.text import (
        quality_score,
    )
    from high_volume_market_data_pipeline_spark.queries_curation import (
        quality_weighted_sample,
    )

    kept = quality_weighted_sample(spark, SF_DIR)
    ids1 = {r["doc_id"] for r in kept.collect()}
    ids2 = {r["doc_id"] for r in quality_weighted_sample(spark, SF_DIR).collect()}
    assert ids1 == ids2  # pure function of doc_id

    docs = load_table(spark, SF_DIR, "documents")
    expected = docs.select(
        F.avg(
            F.least(F.lit(1.0), F.greatest(F.lit(0.05), quality_score(F.col("text"))))
        ).alias("p")
    ).first()["p"]
    n = docs.count()
    rate = len(ids1) / n
    assert abs(rate - expected) < 0.08, (rate, expected)


def test_heavy_hitter_sketch_exact_under_budget(spark):
    """heavy_hitter_users' oracle-exactness contract: the approx_top_k
    sketch is exact while per-group cardinality ≤ maxItemsTracked. Pin
    (a) the testdata honors the bound and (b) the sketch path equals the
    exact groupBy-count + deterministic-rank twin row for row."""
    from pyspark.sql import Window

    from high_volume_market_data_pipeline_spark.catalog import load_table
    from high_volume_market_data_pipeline_spark.queries_analytics import (
        _HH_K,
        _HH_TRACKED,
        heavy_hitter_users,
    )

    ev = load_table(spark, SF_DIR, "events")
    worst = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .agg(F.max("d"))
        .first()[0]
    )
    assert worst <= _HH_TRACKED, f"cardinality {worst} breaks exactness bound"

    w = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), "user_id"
    )
    exact = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("hh_rank", F.row_number().over(w))
        .filter(F.col("hh_rank") <= _HH_K)
    )
    got = {
        (r.event_type, r.user_id, r.cnt, r.hh_rank)
        for r in heavy_hitter_users(spark, SF_DIR).collect()
    }
    want = {
        (r.event_type, r.user_id, r.cnt, r.hh_rank)
        for r in exact.collect()
    }
    assert got == want


def test_session_chains_agree_with_gaps_and_islands(spark):
    """The recursive-CTE chain walk and the gaps-and-islands running sum
    implement the same 2 h session rule two ways — per-session event
    counts and start timestamps must agree exactly, and the chain output
    must cover every event exactly once."""
    from high_volume_market_data_pipeline_spark.catalog import load_table
    from high_volume_market_data_pipeline_spark.queries_analytics import (
        session_chains_recursive,
        sessionize_events_batch,
    )

    chains = session_chains_recursive(spark, SF_DIR)
    n_events = load_table(spark, SF_DIR, "events").count()
    assert chains.count() == n_events  # linear recursion: one row per event

    ev = load_table(spark, SF_DIR, "events").select(
        F.col("event_id").alias("session_start_event_id"),
        F.col("ts").alias("root_ts"),
    )
    per_session = (
        chains.groupBy("user_id", "session_start_event_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .join(ev, "session_start_event_id")
    )
    got = {
        (r["user_id"], r["root_ts"], r["n_events"])
        for r in per_session.collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in sessionize_events_batch(spark, SF_DIR).collect()
    }
    assert got == want


def test_session_chains_survive_sessions_longer_than_level_limit(
    spark, tmp_path
):
    """A user with >100 consecutive events spaced <2h apart is plausible
    high-volume event data; Spark's cteRecursionLevelLimit default (100)
    would abort the whole query on it. The query must size the level
    guard from max-events-per-user (and the row guard from |events|), so
    a 150-event session walks to depth 150."""
    import datetime

    from high_volume_market_data_pipeline_spark.queries_analytics import (
        session_chains_recursive,
    )

    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [
        # one 150-event session (1-min gaps), then a fresh session after 3h
        *[
            (7, i, t0 + datetime.timedelta(minutes=i))
            for i in range(150)
        ],
        (7, 900, t0 + datetime.timedelta(hours=6)),
        (8, 901, t0),
    ]
    spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = session_chains_recursive(spark, str(tmp_path))
    got = out.groupBy("user_id", "session_start_event_id").agg(
        F.max("chain_pos").alias("depth")
    )
    depths = {
        (r["user_id"], r["session_start_event_id"]): r["depth"]
        for r in got.collect()
    }
    assert depths == {(7, 0): 150, (7, 900): 1, (8, 901): 1}
    assert out.count() == 152  # one row per event, nothing truncated
