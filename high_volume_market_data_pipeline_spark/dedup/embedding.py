"""Embedding-cosine near-duplicate pairs.

Blocked brute force: restrict pair generation to a blocking key (label,
LSH bucket, or an id-stratified sample) so the quadratic stays per-block.
Cosine is computed in double via zip_with+aggregate — a sequential fold,
deterministic, JVM-side.

Scale path: for all-pairs at 100 TB use similarity.knn's LSH bucketing as
the blocker; this module's block join is the verify stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.functions.vectors import cosine_similarity


# Arrow-prefilter slack: the numpy cosine and the interpreted fold agree
# to last-ulp digits (~1e-15 relative), and the exact filter compares the
# 6-decimal ROUND of the fold — so a margin of 2e-6 below the threshold
# can never drop a pair the exact filter would keep.
_PREFILTER_EPS = 2e-6


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
    threshold: float = 0.9,
    arrow_prefilter: bool = False,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine ≥ threshold, id_a < id_b.

    With ``block_col`` the join is an equi-join on the block (shuffle on
    block key, quadratic only within block); without it, a full cross join —
    only for small/sampled inputs.

    The reported ``cosine`` is always the zip_with+aggregate expression
    fold — a sequential JVM-side sum whose exact digits the SQL oracle
    replicates. But Spark never codegens lambda bodies inside higher-order
    functions, so that fold is an interpreted tree walk per element — the
    whole operator cost when candidate volume is high (NOTES.md lesson 6).
    ``arrow_prefilter=True`` (requires ``block_col`` and a LONG id)
    screens each bucket with ONE numpy gram matrix in applyInPandas —
    every vector crosses Arrow once per bucket, never once per pair —
    keeps (id_a, id_b) with numpy cosine ≥ ``threshold - _PREFILTER_EPS``,
    and re-scores only those survivors with the exact fold (a broadcast
    join back to the vectors: survivors are ~output-sized). Same rows,
    same hash; fold cost proportional to OUTPUT instead of candidates.
    (A per-pair pandas_udf screen was measured SLOWER than the plain
    fold at sf0.1 — shipping both 64-double vectors per candidate through
    Arrow dwarfs the fold it saves.)"""
    vecs = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        *([F.col(block_col)] if block_col else []),
    )
    cos = cosine_similarity(F.col("v_a"), F.col("v_b"))
    if arrow_prefilter:
        if block_col is None:
            raise ValueError("arrow_prefilter requires block_col")
        import numpy as np
        import pandas as pd

        pre_floor = threshold - _PREFILTER_EPS

        # Budget for the in-flight score slab: the gram matrix of a hot
        # bucket (a dominant label / degenerate block key) is quadratic —
        # 100k vectors would be an 80 GB S on one executor. Chunking the
        # ROWS keeps peak memory at one (chunk, n) slab regardless of
        # bucket size; results are identical (same threshold, same pairs).
        _SCREEN_BUDGET_BYTES = 128 << 20

        def _bucket_screen(pdf: "pd.DataFrame") -> "pd.DataFrame":
            if len(pdf) < 2:
                return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
            pdf = pdf.sort_values("_id")
            ids = pdf["_id"].to_numpy()
            X = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            norms = np.linalg.norm(X, axis=1)
            norms[norms == 0.0] = 1.0
            Xn = X / norms[:, None]
            n = len(ids)
            chunk = max(1, _SCREEN_BUDGET_BYTES // (n * 8))
            outs_a, outs_b = [], []
            for s in range(0, n - 1, chunk):
                e = min(n, s + chunk)
                S = Xn[s:e] @ Xn.T  # (chunk, n) slab
                rows, cols = np.nonzero(S >= pre_floor)
                abs_rows = rows + s
                # strictly-upper-triangle by POSITION (id-sorted frame ⇒
                # id_a ≤ id_b), then mask equal-id pairs: a duplicated id
                # in one bucket would emit an id_a == id_b row the final
                # cosine filter keeps, while the non-prefilter path's
                # strict id_a < id_b join excludes it — both paths share
                # the strict-inequality contract on duplicate-id input.
                keep = (cols > abs_rows) & (ids[abs_rows] != ids[cols])
                outs_a.append(ids[abs_rows[keep]])
                outs_b.append(ids[cols[keep]])
            # Collapse positional duplicates to ID pairs HERE: a row's
            # single-valued block key puts any (id_a, id_b) in exactly one
            # bucket, so an in-bucket drop_duplicates fully replaces a
            # global distinct (no extra shuffle) and keeps the rescore
            # join from multiplying duplicate-id survivors.
            return pd.DataFrame(
                {
                    "id_a": np.concatenate(outs_a),
                    "id_b": np.concatenate(outs_b),
                }
            ).drop_duplicates()

        survivors = (
            vecs.select(
                F.col(id_col).cast("long").alias("_id"), "v", block_col
            )
            .groupBy(block_col)
            .applyInPandas(_bucket_screen, "id_a long, id_b long")
        )
        rescored = (
            F.broadcast(survivors)
            .join(
                vecs.select(
                    F.col(id_col).cast("long").alias("id_a"),
                    F.col("v").alias("v_a"),
                ),
                "id_a",
            )
            .join(
                vecs.select(
                    F.col(id_col).cast("long").alias("id_b"),
                    F.col("v").alias("v_b"),
                ),
                "id_b",
            )
        )
        return (
            rescored.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold)
        )
    a = vecs.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col).alias("id_a"),
        F.col("v").alias("v_a"),
    )
    b = vecs.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col).alias("id_b"),
        F.col("v").alias("v_b"),
    )
    joined = a.join(b, on=block_col) if block_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
