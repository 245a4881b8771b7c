"""Approximate/exact nearest-neighbor search over an embedding column.

Two tiers (driver mandate):
- ``brute_force_knn``: exact cosine top-k — broadcast the (small) query set
  against the corpus, score every pair, per-query top-k via window. The
  correctness baseline; at scale the corpus never shuffles (queries are the
  broadcast side) and top-k prunes before any collect.
- ``lsh_bucketed_knn``: random-hyperplane (sign-LSH) bucketing — corpus and
  queries bucketed by sign-bit key; candidate scoring only within a bucket
  (multi-probe: queries also probe 1-bit-flip neighbors to cut misses).
  The 100 TB path: shuffle is keyed by bucket, quadratic work is per-bucket.

Hyperplanes are derived deterministically from md5 (seeded), so results are
reproducible run-to-run and testable without a stored model.
"""

from __future__ import annotations

import hashlib

from typing import NamedTuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.functions.vectors import (
    as_double,
    cosine_similarity,
)


_MAX_CLOSURE_QUERIES = 100_000
# Bound on any single in-flight (query-chunk × corpus-batch) float64 score
# matrix inside a closure kernel. The scans chunk the query matrix so that
# nq_chunk · batch_rows · 8 bytes never exceeds this, whatever the admitted
# query count — without it, 100k queries × a 10k-row Arrow batch would
# materialize an ~8 GB matrix per in-flight task.
_CLOSURE_BUDGET_BYTES = 128 << 20


def _model_scoped_shuffle(df: DataFrame):
    """Context manager: scope shuffle sizing (and AQE) to ``df``'s own
    scan layout for the EAGER model-building regions (quantizer fits,
    code-table checkpoints). An index build over a metadata-scale corpus
    otherwise runs its handful of shuffles at the session's cores×3
    partitions — with AQE additionally materializing every exchange as
    its own Spark job — and the per-task/per-job fixed cost dwarfs the
    model-sized data (same r13 finding as dedup/incremental and
    dedup/clustering). A 100 TB corpus has input splits ≥ the session
    conf, leaves both knobs untouched, and keeps AQE's skew handling.
    Lazy SEARCH paths are unaffected: this only wraps code that
    materializes inside the builder."""
    from high_volume_market_data_pipeline_spark.operators.layout import (
        data_scoped_shuffle,
    )

    return data_scoped_shuffle(df.sparkSession, df.rdd.getNumPartitions())


def _build_vector_kernels():
    """The numpy helpers every executor-shipped kernel in this family
    calls, built as <locals> closures so cloudpickle ships their BODIES
    into the UDF/mapInArrow closures (the NOTES cwd-portability rule: a
    module-level def pickles by reference and Python workers — which
    inherit the driver cwd — would have to re-import this repo package).
    They may reference only numpy/pandas and closure constants."""
    budget_default = _CLOSURE_BUDGET_BYTES

    def _cosine_batch(qv: pd.Series, cv: pd.Series) -> pd.Series:
        a = np.asarray(qv.tolist(), dtype=np.float64)
        b = np.asarray(cv.tolist(), dtype=np.float64)
        num = np.einsum("ij,ij->i", a, b)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        return pd.Series(num / den)

    def _normalize_rows(X: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(X, axis=1, keepdims=True)
        n[n == 0.0] = 1.0
        return X / n

    def _query_chunks(nq: int, batch_rows: int, budget: int | None = None):
        """Yield (start, stop) query-row slices sized so a (chunk,
        batch_rows) float64 matrix stays under the byte budget (default
        _CLOSURE_BUDGET_BYTES, frozen into the closure at import).
        ``budget`` is an explicit parameter so a caller-chosen value
        rides the closure to the workers (the chunk-identity test
        relies on this)."""
        if budget is None:
            budget = budget_default
        chunk = max(1, budget // (max(1, batch_rows) * 8))
        for s in range(0, nq, chunk):
            yield s, min(nq, s + chunk)

    def _per_batch_topr(
        qids: "np.ndarray",
        ids: "np.ndarray",
        S: "np.ndarray",
        r: int,
    ):
        """Deterministic per-batch top-r per query from a (nq, B) score
        matrix: order by (-score, neighbor_id) — the same tie rule as the
        global rank window, so the batch-level cut can never drop a row
        the global cut would have kept. -inf scores (masked self-pairs)
        never emit. Returns (query_id, neighbor_id, score) flat arrays.

        One vectorized argpartition prunes each row to its top-r score
        tier (plus every boundary tie, so the id tie rule stays exact);
        the per-query lexsort then runs over ~r candidates, not the full
        batch — the old full-row lexsort loop was O(nq · B log B) and
        dominated at large query counts."""
        r = min(r, S.shape[1])
        n, B = S.shape
        kth = min(r - 1, B - 1)
        part = np.argpartition(-S, kth, axis=1)[:, : kth + 1]
        thresh = S[np.arange(n)[:, None], part].min(axis=1)
        qs, ns, cs = [], [], []
        for qi in range(n):
            t = thresh[qi]
            if np.isfinite(t):
                cand = np.nonzero(S[qi] >= t)[0]
            else:  # fewer than r finite scores in the row
                cand = np.nonzero(np.isfinite(S[qi]))[0]
            sel = cand[np.lexsort((ids[cand], -S[qi][cand]))][:r]
            qs.append(np.full(len(sel), qids[qi], dtype=np.int64))
            ns.append(ids[sel])
            cs.append(S[qi][sel])
        return np.concatenate(qs), np.concatenate(ns), np.concatenate(cs)

    return _cosine_batch, _normalize_rows, _query_chunks, _per_batch_topr


_cosine_batch, _normalize_rows, _query_chunks, _per_batch_topr = (
    _build_vector_kernels()
)


def _query_matrix(q: DataFrame) -> tuple["np.ndarray", "np.ndarray"]:
    """Collect a (id, vector) query BATCH to the driver as (ids,
    row-normalized float64 matrix) — model-scale metadata, exactly like
    the ANN codebooks and k-means centroids the index builds already
    collect. The payoff of the closure kernels below: a candidate row
    ships ONE int64 query id instead of a 64-double query vector (the
    crossJoin form measured ~4 GB of duplicated qv at the 200k×40 tier).
    Guarded so nobody points it at a query TABLE.

    Requires an INTEGRAL, UNIQUE id column: every closure path keys
    scores by int64 query id (``searchsorted`` lookups and int equality
    against corpus ids), so string/float ids and duplicate ids — which
    the old crossJoin forms tolerated — are rejected here with a clear
    error instead of silently truncating or collapsing."""
    rows = q.collect()
    if len(rows) > _MAX_CLOSURE_QUERIES:
        raise ValueError(
            f"{len(rows)} queries exceed the closure-kernel bound "
            f"({_MAX_CLOSURE_QUERIES}); run the query set in batches"
        )
    raw_ids = [r[0] for r in rows]
    for v in raw_ids:
        if not isinstance(v, (int, np.integer)):
            raise TypeError(
                "closure-kernel kNN requires an integral id column; got "
                f"{type(v).__name__} ({v!r}). Cast ids to long (or use the "
                "non-vectorized crossJoin path, which accepts any id type)."
            )
    qids = np.asarray(raw_ids, dtype=np.int64)
    if len(np.unique(qids)) != len(qids):
        raise ValueError(
            "duplicate query ids in closure-kernel kNN: id-keyed score "
            "lookup would silently collapse duplicates to one vector; "
            "deduplicate the query set first"
        )
    mat = np.asarray([r[1] for r in rows], dtype=np.float64)
    return qids, _normalize_rows(mat)


def _rank_topk(cand: DataFrame, k: int, score_col: str = "_cos") -> DataFrame:
    """Global (query_id, -score, neighbor_id) rank over a candidate frame
    that is already per-batch pruned — rows entering the shuffle are
    O(n_batches · nq · k), never corpus-sized."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc(score_col), "neighbor_id"
    )
    return (
        cand.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col(score_col), 6).alias("cosine"),
            "knn_rank",
        )
    )


def brute_force_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    vectorized: bool = False,
    budget_bytes: int | None = None,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine, knn_rank), excluding
    self-matches; rank ties broken by neighbor id (deterministic).

    ``vectorized=True`` runs a mapInArrow scan over the CORPUS ONLY with
    the normalized query matrix as a task closure: one (nq, B) matmul per
    Arrow batch, per-batch top-k, then a global rank over nq·k·n_batches
    rows. Nothing corpus×queries is ever materialized — the crossJoin
    form shipped every candidate row with its 64-double query vector
    (~4 GB duplicated at 200k×40) and shuffled the full score table into
    the rank window. Much faster, but numpy's float64 sum order differs
    from the expression fold in last-ulp digits, so use it ONLY where
    cosine VALUES are not driver-hashed (the recall twins inside the ANN
    queries); the default expression scorer stays bit-identical to the
    SQL oracle."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    if vectorized:
        import pyarrow as pa

        qids, Q = _query_matrix(q)
        if len(qids) == 0:
            return c.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, cosine double, knn_rank int"
            )

        def scan(batches):
            for b in batches:
                pdf = b.to_pandas()
                if not len(pdf):
                    continue
                X = np.asarray(pdf["cv"].tolist(), dtype=np.float64)
                ids = pdf["neighbor_id"].to_numpy().astype(np.int64)
                Xn = _normalize_rows(X).T
                # chunk queries so the (chunk, B) score matrix stays
                # under the byte budget regardless of admitted nq
                for s, e in _query_chunks(len(qids), len(ids), budget_bytes):
                    S = Q[s:e] @ Xn  # cosine of normalized rows
                    S[qids[s:e, None] == ids[None, :]] = -np.inf  # self
                    qa, na, ca = _per_batch_topr(qids[s:e], ids, S, k)
                    yield pa.RecordBatch.from_pydict(
                        {"query_id": qa, "neighbor_id": na, "_cos": ca}
                    )

        cand = c.mapInArrow(
            scan, "query_id long, neighbor_id long, _cos double"
        )
        return _rank_topk(cand, k)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("_cos"),
        )
    )
    return _rank_topk(scored, k)


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from md5 bytes."""
    vals: list[float] = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"{seed}:{plane}:{i}".encode()).digest()
        for byte in h:
            vals.append((byte - 127.5) / 127.5)
            if len(vals) == dim:
                break
        i += 1
    return vals


def random_hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int | None = 64,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Append a sign-LSH bucket key: bit p = 1 iff v·hyperplane_p ≥ 0.

    ``dim`` must match the vector length: hyperplanes are fixed-length
    literal arrays, and a mismatch makes every zip_with dot product NULL —
    which would silently collapse all rows into bucket 0 and turn the
    downstream block join into an all-pairs quadratic. Pass ``dim=None``
    to probe the first row's vector length (one cheap job), and any row
    whose vector length differs from ``dim`` fails loudly at runtime
    instead of mis-bucketing."""
    if dim is None:
        head = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if head is None or head["d"] is None:
            dim = 1  # empty input: any plane length works, no rows to bucket
        else:
            dim = int(head["d"])
    v = as_double(F.col(vec_col))
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p, seed)])
        d = F.aggregate(
            F.zip_with(v, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    # n_planes=0 (auto_planes on a corpus under target) = one bucket: the
    # blocked join degrades to the honest small-corpus quadratic.
    key = F.lit(0)
    for b in bits:
        key = key + b
    guarded = F.when(F.size(F.col(vec_col)) == dim, key.cast("int")).otherwise(
        F.raise_error(
            F.format_string(
                "sign-LSH dim mismatch: hyperplanes are %d-dim but vector has "
                "%d elements", F.lit(dim), F.size(F.col(vec_col)),
            )
        ).cast("int")
    )
    return df.withColumn(out_col, guarded)


def auto_planes(
    n: int, target_bucket_rows: int = 64, max_planes: int = 12
) -> int:
    """Sign-LSH plane count sized from the corpus: the smallest p with
    target_bucket_rows · 2^p ≥ n (capped at ``max_planes``), so expected
    bucket occupancy n/2^p stays ≤ target as the corpus grows — each
    extra plane halves it, keeping the per-bucket quadratic flat instead
    of letting a fixed plane count go n² (measured 15.4× on 10× data at
    planes=2, BASELINE.md). Pure integer shifts — no log2 floats whose
    last-ULP could make a SQL-oracle twin disagree at tier boundaries;
    the oracle computes the identical rule as MIN(p) over a range scan.
    The recall trade is the standard single-table sign-LSH one (a
    true-pair survives with P(agree)^p); recover recall at high p with
    the OR-construction (lsh_bucketed_knn's n_tables), not fewer planes."""
    p = 0
    while p < max_planes and (target_bucket_rows << p) < n:
        p += 1
    return p


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 8,
    dim: int = 64,
    seed: int = 101,
    prefix: str = "p",
    quantize: float = 1e6,
) -> DataFrame:
    """Johnson–Lindenstrauss-style random projection: append ``out_dim``
    scalar columns ``p0..p{out_dim-1}``, component j = v · plane_j over
    md5-derived deterministic planes (the dense cousin of the sign-LSH
    bucketing above — keep the magnitudes instead of the sign bits). The
    standard cheap dimensionality reduction before ANN indexing or
    clustering: distances are preserved within (1±ε) w.h.p., and an 8-d
    float row is ~8× less shuffle than the 64-d original.

    Components are emitted as SCALAR columns, not an array — the driver
    hash forbids array cells (registry.assert_driver_safe_schema) — and
    floor-quantized at ``quantize`` (pure IEEE ops, bit-identical across
    engines). The dot product is the sequential expression fold, NOT a
    numpy batch: its summation order matches the SQL oracle term by term
    (the vectorized path's pairwise sums differ in last-ulp digits; see
    the scorer note in lsh_bucketed_knn)."""
    v = as_double(F.col(vec_col))
    out = df
    for j in range(out_dim):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, j, seed)])
        d = F.aggregate(
            F.zip_with(v, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(
            f"{prefix}{j}", F.floor(d * quantize) / quantize
        )
    return out


def lsh_bucketed_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int | None = None,
    dim: int = 64,
    seed: int = 42,
    multi_probe: bool = True,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket.

    Two standard recall mechanisms compose here:

    - Multi-probe: each query also probes every 1-bit-flip neighbor bucket
      within a table, trading (n_planes+1)× candidate fan-out for boundary
      misses — without touching the corpus-side layout.
    - OR-construction (``n_tables`` independent hash tables, each with its
      own hyperplane set): a true neighbor is missed only if EVERY table
      separates it, so P(miss) drops exponentially in n_tables — the
      banding trick MinHash-LSH uses, applied to sign-LSH.

    Measured on unstructured random vectors (the worst case — no cluster
    structure for the hyperplanes to exploit): recall@5 ≈ 0.43 with one
    table, 0.70 with two, 0.95 with the default four
    (test_dedup_similarity.py pins a ≥0.8 floor). Clustered real embeddings do
    much better. Cost model per query: candidates ≈
    n_tables · (n_planes+1) · n/2^n_planes — raise n_planes as the corpus
    grows (keeping per-bucket lists small) and spend the savings on tables.
    Each table is one bucket-keyed equi-join; only (query_id, neighbor_id,
    cos) triples cross the dedup shuffle, never the vectors.
    """
    c0 = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    if n_planes is None:
        # default = the scale-safe rule, not a constant: one plane per
        # corpus doubling past 1024 rows/bucket. At 200k vectors the old
        # fixed 4-plane default produced 12.5k-row buckets and ran SLOWER
        # than brute force (56s vs 41s, BENCH_ANN_TIER); auto-planes (8)
        # ran it in 9s at equal recall. Small corpora resolve to 1 plane
        # — with multi-probe both buckets are probed, so the degenerate
        # config is the honest full scan (floor 1, not 0: the bucketing
        # matmul needs at least one hyperplane row).
        n_planes = max(
            1,
            auto_planes(corpus.count(), target_bucket_rows=1024, max_planes=12),
        )
    # All tables resolve in ONE pass: every row gets its per-table bucket
    # (distinct hyperplane sets via shifted seeds), the (table, bucket)
    # pairs explode into a composite join key, and a single bucket-keyed
    # equi-join replaces the old per-table join+union — one corpus scan
    # and one join instead of n_tables of each (measured 2x+ on the
    # registered query), with the identical candidate set.
    tables = max(1, n_tables)
    # All tables' buckets come from ONE Arrow-vectorized matmul per batch:
    # sign-LSH is a dense (n, dim) x (dim, tables*planes) product, which
    # interpreted HOF lambdas evaluate element-by-element (~16x64 tree
    # walks PER ROW — Spark never codegens lambda bodies; measured ~6 s on
    # 20k x 64 at 4 tables) and numpy does in microseconds. Sign ties at
    # exactly 0.0 could differ from the fold-order expression form, but
    # md5-derived planes dotted with real data hit 0.0 with measure-zero
    # probability, and this path is recall-graded, not hash-gated (the
    # hash-gated embedding_near_dup keeps the expression/oracle pair in
    # random_hyperplane_buckets).
    from pyspark.sql.functions import pandas_udf

    planes_m = np.array(
        [
            _hyperplane(dim, p, seed + 7919 * t)
            for t in range(tables)
            for p in range(n_planes)
        ],
        dtype=np.float64,
    )  # (tables*planes, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<int>")
    def _all_buckets(v: pd.Series) -> pd.Series:
        a = np.asarray(v.tolist(), dtype=np.float64)
        if a.ndim != 2 or a.shape[1] != dim:
            raise ValueError(
                f"sign-LSH dim mismatch: hyperplanes are {dim}-dim but got "
                f"vectors of shape {a.shape}"
            )
        bits = (a @ planes_m.T) >= 0  # (n, tables*planes)
        buckets = bits.reshape(len(a), tables, n_planes) @ weights
        return pd.Series(buckets.astype(np.int32).tolist())

    c = c0.withColumn("_bkts", _all_buckets(F.col("cv")))
    q = q0.withColumn("_bkts", _all_buckets(F.col("qv")))
    c_keys = [
        F.struct(F.lit(t).alias("tbl"), F.col("_bkts")[t].alias("bucket"))
        for t in range(tables)
    ]
    c = c.select(
        "neighbor_id", "cv", F.explode(F.array(*c_keys)).alias("_tb")
    ).select("neighbor_id", "cv", "_tb.tbl", "_tb.bucket")
    q_keys = []
    for t in range(tables):
        base = F.col("_bkts")[t]
        q_keys.append(F.struct(F.lit(t).alias("tbl"), base.alias("bucket")))
        if multi_probe:
            q_keys += [
                F.struct(
                    F.lit(t).alias("tbl"),
                    base.bitwiseXOR(F.lit(1 << p)).alias("bucket"),
                )
                for p in range(n_planes)
            ]
    q = q.select(
        "query_id", F.explode(F.array(*q_keys)).alias("_tb")
    ).select("query_id", "_tb.tbl", "_tb.bucket")
    # Candidate scoring is the hot loop (candidates ≈ tables·probes·
    # queries·bucket_size pairs), so it is Arrow-vectorized like the
    # bucketing AND closure-keyed: the probe rows carry only (query_id,
    # tbl, bucket) — the query MATRIX rides the task closure and each
    # batch scores via one gather+einsum. Shipping qv on every candidate
    # row was the old cost (64 doubles × candidates). Float64 sum order
    # differs from the expression fold only in last-ulp digits —
    # irrelevant to ranking and to this query's rows-only/recall grading;
    # brute_force_knn keeps the expression scorer because its cosine
    # VALUES are driver-hashed.
    qids, Qn = _query_matrix(q0.select("query_id", "qv"))
    if len(qids) == 0:
        return c0.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, knn_rank int"
        )
    qorder = np.argsort(qids)
    qids_sorted = qids[qorder]

    @pandas_udf("double")
    def _cos_by_qid(qid_s: pd.Series, cv_s: pd.Series) -> pd.Series:
        qarr = qid_s.to_numpy().astype(np.int64)
        idx = qorder[np.searchsorted(qids_sorted, qarr)]
        X = _normalize_rows(np.asarray(cv_s.tolist(), dtype=np.float64))
        return pd.Series(np.einsum("bd,bd->b", Qn[idx], X))

    # Score BEFORE deduping: a duplicate candidate costs one extra
    # vectorized dot map-side, but deduping first would push the vectors
    # themselves through the dropDuplicates shuffle — only (query_id,
    # neighbor_id, _cos) triples may cross it.
    scored = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cos_by_qid(F.col("query_id"), F.col("cv")).alias("_cos"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), "neighbor_id")
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("_cos"), 6).alias("cosine"),
            "knn_rank",
        )
    )


class IVFIndex(NamedTuple):
    """A built IVF index: unit-space cell centroids plus the materialized
    inverted lists (neighbor_id, cv, cell). Build ONCE, search many."""

    centroids: "np.ndarray"
    coded: DataFrame


def _fit_sample(
    df: DataFrame,
    id_col: str,
    fit_fraction: float | None,
    auto_target: int | None,
    n_rows: int | None = None,
    probe_empty: bool = True,
) -> DataFrame:
    """Training input for a quantizer fit — the one sampling discipline
    every index builder shares (FAISS ``max_points_per_centroid``). An
    explicit ``fit_fraction`` wins; otherwise sample down to
    ~``auto_target`` rows (``None`` disables auto-sampling; the count is
    one column-pruned pass, negligible next to the Lloyd iterations it
    saves). Deterministic md5-bucket sample so fits are reproducible
    across runs and appends; a sample that comes back EMPTY (tiny
    corpus) falls back to the full input, because an empty training set
    would silently fit an all-zero model. ``n_rows`` — the caller's known
    row count — skips the sizing count() when provided (r12: a composed
    builder like build_ivf_pq_index derives several 1:1 frames from one
    corpus and was paying one count job per fit; the fraction decision is
    identical as long as the count is). ``probe_empty=False`` skips the
    one-job empty-sample probe — pass it when the CALLER materializes
    the sample anyway (a driver-side fit collects it) and can apply the
    empty-fallback itself (r13: the probe was ~0.15 s per fit)."""
    if fit_fraction is None and auto_target is not None:
        n = df.count() if n_rows is None else n_rows
        if n > auto_target:
            fit_fraction = auto_target / n
    if fit_fraction is not None and 0.0 < fit_fraction < 1.0:
        from high_volume_market_data_pipeline_spark.operators.sampling import (
            hash_bucket,
        )

        n_buckets = 10_000
        bound = max(1, int(round(fit_fraction * n_buckets)))
        sampled = df.filter(
            hash_bucket(F.col(id_col).cast("string"), n_buckets) < bound
        )
        if probe_empty and sampled.limit(1).count() == 0:
            return df
        return sampled
    return df


def _lloyd_fit(
    X: "np.ndarray", k: int, seed: int, iters: int
) -> "np.ndarray":
    """Deterministic seeded Lloyd k-means on a DRIVER-resident sample —
    the coarse-quantizer fit (r13; was a Spark-ML KMeans fit whose
    kmeans|| init + per-iteration jobs cost ~1.2 s per index build for a
    few-thousand-row sample that fits in one numpy matrix). Same
    arithmetic as fit_pq_codebooks' per-subspace ``_fit_one``: seeded
    choice init over rows sorted by id (the caller sorts), cross-term
    distance form, empty clusters reseeded to the farthest point. Cell
    quality needs only rough balance (recall is governed by n_probe, not
    centroid polish) — the recall-floor tests pin the contract.

    Init is seeded k-means++ (D²-weighted over the id-sorted sample —
    deterministic given the same sample and seed; the same family
    kmeans|| approximates). Measured against exact top-5 on the random
    sf0.01 embeddings (ANN's worst case): k-means++ @ 15 iterations
    reads recall 0.725 (full fit) / 0.65 (0.3-sampled fit) vs 0.50-0.60
    for uniform or farthest-first inits — the sweep is recorded in
    OPTIMIZATION_r13.md §2."""
    rng = np.random.RandomState(seed)
    k_eff = min(k, len(X))
    x2 = (X**2).sum(axis=1)
    first = int(rng.randint(len(X)))
    chosen = [first]
    d2min = np.maximum(x2 + x2[first] - 2.0 * (X @ X[first]), 0.0)
    for _ in range(1, k_eff):
        tot = d2min.sum()
        if tot <= 0:  # all remaining points coincide with a center
            nxt = int(rng.randint(len(X)))
        else:
            nxt = int(rng.choice(len(X), p=d2min / tot))
        chosen.append(nxt)
        d2 = np.maximum(x2 + x2[nxt] - 2.0 * (X @ X[nxt]), 0.0)
        d2min = np.minimum(d2min, d2)
    cent = X[chosen].copy()
    for _ in range(iters):
        d2 = x2[:, None] + (cent**2).sum(axis=1)[None, :] - 2.0 * (X @ cent.T)
        assign = d2.argmin(axis=1)
        for ci in range(k_eff):
            members = X[assign == ci]
            if len(members):
                cent[ci] = members.mean(axis=0)
            else:  # reseed an empty cluster to the farthest point
                cent[ci] = X[d2.min(axis=1).argmax()]
    return cent


def _collect_fit_matrix(
    sample: DataFrame, full: DataFrame, id_col: str, vec_col: str
) -> "np.ndarray":
    """Collect a fit sample to the driver as a row-sorted float64 matrix
    (sorted by id so the matrix — hence the seeded init — is independent
    of Spark's nondeterministic collect order). Falls back to the full
    input when the sample is empty (tiny corpus), mirroring
    _fit_sample's guard without its probe job."""
    rows = sample.select(id_col, vec_col).collect()
    if not rows and sample is not full:
        rows = full.select(id_col, vec_col).collect()
    if not rows:
        raise ValueError("cannot fit a coarse quantizer on an empty corpus")
    rows.sort(key=lambda r: r[0])
    return np.asarray([r[1] for r in rows], dtype=np.float64)


def _assign_cells(
    df: DataFrame, centroids: "np.ndarray", nv_col: str = "_nv"
) -> DataFrame:
    """Append ``cell`` = index of the nearest centroid to the (already
    L2-normalized) ``nv_col`` — one Arrow batch matmul per task, the
    same argmin arithmetic as index_store._with_cell's append-side
    assignment so build and append place identical vectors identically."""
    from pyspark.sql.functions import pandas_udf

    c2 = (centroids**2).sum(axis=1)

    @pandas_udf("int")
    def _cell(vs: pd.Series) -> pd.Series:
        X = np.asarray(vs.tolist(), dtype=np.float64)
        # argmin ‖x−c‖² = argmin ‖c‖² − 2x·c (‖x‖² is a per-row constant)
        d = c2[None, :] - 2.0 * (X @ centroids.T)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return df.withColumn("cell", _cell(F.col(nv_col)))


def build_ivf_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    seed: int = 42,
    fit_fraction: float | None = None,
    points_per_cell: int | None = 256,
) -> IVFIndex:
    """K-means coarse quantizer fit + cell assignment of every vector;
    the inverted lists are localCheckpoint-materialized. Training cost is
    one k-means fit; ``fit_fraction`` fits on a deterministic md5 sample
    (FAISS trains IVF quantizers on ~30-250 vectors/cell — fitting the
    full corpus at 100 TB is waste, and an RNG-free sample keeps the
    centroids, hence the cell assignment, reproducible across runs and
    appends). When ``fit_fraction`` is not given the fit auto-samples to
    ``points_per_cell · n_cells`` vectors (same FAISS
    max_points_per_centroid discipline as fit_pq_codebooks; None forces
    the full fit). Every vector is still ASSIGNED; only the Lloyd
    iterations read the sample.

    r13: the fit is the driver-side deterministic numpy Lloyd
    (``_lloyd_fit``) over the collected sample — the sample is
    driver-sized BY DESIGN (points_per_cell · n_cells ≈ thousands of
    rows, the same scale ivf_knn already collects for query probing), so
    the former Spark-ML KMeans fit (kmeans|| init + one job per Lloyd
    iteration, ~1.2 s per build) was pure orchestration. Assignment of
    the FULL corpus stays distributed (one Arrow matmul per batch,
    identical arithmetic to the append path's _with_cell)."""
    from high_volume_market_data_pipeline_spark.functions.expr import bind_once

    def norm(v):
        # bind the norm scalar once per row — inlined, the aggregate would
        # re-run per vector ELEMENT (O(d²) per vector; see functions/expr.py)
        length = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, y: a + y * y))
        return bind_once(
            length, lambda n: F.transform(v, lambda x: x / n)
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("_nv", norm(F.col("cv")))
    # Persist the featurized corpus: the sample collect reads it once and
    # the inverted-list assignment once more — uncached, each pass would
    # recompute the normalization expressions.
    c = c.persist()
    # Coarse quantizer: a handful of Lloyd iterations is enough — cells
    # only need to be roughly balanced, not converged (FAISS uses 10-25 on
    # samples; recall is governed by n_probe, not centroid polish).
    fit_input = _fit_sample(
        c,
        "neighbor_id",
        fit_fraction,
        points_per_cell * n_cells if points_per_cell is not None else None,
        probe_empty=False,
    )
    X = _collect_fit_matrix(fit_input, c, "neighbor_id", "_nv")
    cent_np = _lloyd_fit(X, n_cells, seed, iters=15)
    inverted = _assign_cells(c, cent_np).select("neighbor_id", "cv", "cell")
    inverted = inverted.localCheckpoint(eager=True)
    c.unpersist()
    return IVFIndex(cent_np, inverted)


def ivf_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    fit_fraction: float | None = None,
    index: IVFIndex | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer →
    per-cell inverted lists → queries probe their ``n_probe`` nearest cells.

    The second ANN family next to sign-LSH: cells ADAPT to the data
    distribution (learned centroids) where LSH buckets are data-oblivious —
    on clustered real embeddings IVF probes far fewer candidates at equal
    recall. Vectors are L2-normalized before clustering so euclidean cell
    assignment orders like cosine. Candidate fan-out per query ≈
    n/n_cells · n_probe.

    Sizing — measured, not folklore: the classic "n_cells ~ √n" rule only
    pays when PER-CELL READS dominate, i.e. when probing fewer rows means
    reading fewer bytes (corpus on disk/object store, cells are parquet
    partitions and probing prunes them). On an in-RAM corpus it measures
    WORSE: at 200k vectors, cells=447/probe=111 searched 17.5 s vs
    cells=16/probe=4 at 9.5 s, identical recall and identical 25% scan
    fraction (BENCH_ANN_TIER_r06) — every extra probed cell adds
    orchestration (probe rows, join fan-in) while saving zero I/O. Rule:
    hold the scan fraction (n_probe/n_cells) at your recall target, and
    grow n_cells only when cells map to prunable storage units; otherwise
    keep n_cells small. ``tools/bench_ann_tier.py`` keeps the √n preset
    as a labeled anti-pattern row next to the default.

    The search side probes cells on the DRIVER over the collected query
    batch (centroids are model-scale), so candidate rows carry one
    query-id long, never a duplicated query vector; scoring is the
    closure-matrix cosine (one gather per Arrow batch). Pass a prebuilt
    ``index`` (build_ivf_index) to amortize the k-means fit across query
    batches."""
    from pyspark.sql.functions import pandas_udf

    if index is None:
        index = build_ivf_index(
            corpus,
            vec_col=vec_col,
            id_col=id_col,
            n_cells=n_cells,
            seed=seed,
            fit_fraction=fit_fraction,
        )
    cent_np, inverted = index.centroids, index.coded

    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
    )
    qids, Qn = _query_matrix(q)
    if len(qids) == 0:
        return inverted.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, knn_rank int"
        )
    spark = inverted.sparkSession
    d2 = ((Qn[:, None, :] - cent_np[None, :, :]) ** 2).sum(axis=2)
    cells_ix = np.arange(cent_np.shape[0])
    probe_rows = [
        (int(qids[qi]), int(cell))
        for qi in range(len(qids))
        for cell in np.lexsort((cells_ix, d2[qi]))[:n_probe]
    ]
    probed = spark.createDataFrame(probe_rows, "query_id long, cell int")
    # The probed-cell set is known DRIVER-SIDE, so push it as a STATIC
    # IN-filter ahead of the join: on a persisted index (coded table
    # hive-partitioned by cell — save_ivf_index) this becomes a
    # PartitionFilter at the scan and unprobed cells are never read —
    # the storage regime where growing n_cells genuinely pays (see the
    # sizing rule above). Logically redundant with the equi-join;
    # harmless on an in-RAM localCheckpoint. (Spark's dynamic partition
    # pruning does NOT fire here: the probe side is a local relation
    # with no selective scan predicate, so we prune statically.)
    inverted = inverted.filter(
        F.col("cell").isin(sorted({c for _, c in probe_rows}))
    )

    qorder = np.argsort(qids)
    qids_sorted = qids[qorder]

    @pandas_udf("double")
    def _cos_by_qid(qid_s: pd.Series, cv_s: pd.Series) -> pd.Series:
        qarr = qid_s.to_numpy().astype(np.int64)
        idx = qorder[np.searchsorted(qids_sorted, qarr)]
        X = _normalize_rows(np.asarray(cv_s.tolist(), dtype=np.float64))
        return pd.Series(np.einsum("bd,bd->b", Qn[idx], X))

    scored = (
        inverted.join(F.broadcast(probed), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cos_by_qid(F.col("query_id"), F.col("cv")).alias("_cos"),
        )
        # a vector lives in exactly ONE cell ⇒ (query, neighbor) unique
    )
    return _rank_topk(scored, k)


def fit_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m_subspaces: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    seed: int = 42,
    iters: int = 10,
    fit_fraction: float | None = None,
    normalize: bool = True,
    points_per_code: int | None = 256,
    n_rows: int | None = None,
) -> np.ndarray:
    """Fit product-quantization codebooks: split each (L2-normalized when
    ``normalize``; residual inputs pass ``normalize=False``) vector into
    ``m_subspaces`` contiguous subvectors and k-means each subspace
    independently to ``n_codes`` centroids.

    Training is SAMPLED by default: when ``fit_fraction`` is not given,
    the fit reads ``points_per_code · n_codes`` vectors (an md5-bucket
    sample — FAISS's ``max_points_per_centroid`` discipline, default 256
    points per centroid ⇒ 8,192 vectors for 32 codes), because k-means
    quality saturates at a few hundred points per centroid while fit cost
    keeps growing linearly: at the 200k tier the full-corpus fit was
    89–100 s against a 3 s search — the one-time build dominated the
    lifecycle, and at 100M vectors it would be hours. Corpora at or under
    the target fit in full (the sample fraction clamps to 1). Pass
    ``points_per_code=None`` (and no ``fit_fraction``) to force the
    full-corpus fit. Encoding always covers every vector.

    Returns a ``(m_subspaces, n_codes, dim // m_subspaces)`` numpy array —
    model-scale metadata (m·k rows), the one thing an ANN index build DOES
    collect to the driver (ivf_knn collects its k-means centers the same
    way). The fit itself is distributed: one posexplode fans every sampled
    vector into its m subvectors, and ``applyInPandas`` over the subspace
    key runs the m independent Lloyd loops in parallel — one shuffle of
    the (sampled) training set, no per-iteration Spark round trips.

    Determinism: the per-group frame is sorted by vector id before a
    seeded ``RandomState`` picks the initial centers, because Spark gives
    no row-order guarantee inside a group; empty clusters reseed to the
    farthest point (deterministic argmax). ``fit_fraction`` trains on an
    md5-bucket sample (FAISS-style ~thousands of vectors per subspace
    suffice) while encoding still covers every vector."""
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    dsub = dim // m_subspaces
    from high_volume_market_data_pipeline_spark.functions.expr import bind_once
    from high_volume_market_data_pipeline_spark.functions.vectors import norm

    raw = as_double(F.col(vec_col))
    if normalize:
        v = bind_once(  # bind the norm scalar once (see ivf_knn's norm())
            norm(raw), lambda n: F.transform(raw, lambda x: x / n)
        )
    else:
        v = raw
    c = corpus.select(F.col(id_col).alias("_id"), v.alias("v"))
    c = _fit_sample(
        c,
        "_id",
        fit_fraction,
        points_per_code * n_codes if points_per_code is not None else None,
        n_rows=n_rows,
    )
    subs = c.select(
        "_id",
        F.posexplode(
            F.array(*[F.slice("v", j * dsub + 1, dsub) for j in range(m_subspaces)])
        ).alias("sub_id", "subvec"),
    )

    def _fit_one(pdf: pd.DataFrame) -> pd.DataFrame:
        sub_id = int(pdf["sub_id"].iloc[0])
        X = np.asarray(
            pdf.sort_values("_id")["subvec"].tolist(), dtype=np.float64
        )
        rng = np.random.RandomState(seed + sub_id)
        k = min(n_codes, len(X))
        cent = X[rng.choice(len(X), size=k, replace=False)].copy()
        # ‖x‖² is loop-invariant; per iteration only ‖c‖² − 2X·Cᵀ moves.
        # The cross-term form keeps the working set at one (n, k) matrix —
        # the naive (X[:,None]−cent)² broadcast materializes (n, k, d),
        # d× larger, and WAS the dominant build cost before sampling.
        x2 = (X**2).sum(axis=1)
        for _ in range(iters):
            d2 = x2[:, None] + (cent**2).sum(axis=1)[None, :] - 2.0 * (X @ cent.T)
            assign = d2.argmin(axis=1)
            for ci in range(k):
                members = X[assign == ci]
                if len(members):
                    cent[ci] = members.mean(axis=0)
                else:  # reseed an empty cluster to the farthest point
                    cent[ci] = X[d2.min(axis=1).argmax()]
        return pd.DataFrame(
            {
                "sub_id": sub_id,
                "code": np.arange(k, dtype=np.int32),
                "centroid": list(cent),
            }
        )

    fitted = subs.groupBy("sub_id").applyInPandas(
        _fit_one, "sub_id int, code int, centroid array<double>"
    )
    cb = np.zeros((m_subspaces, n_codes, dsub), dtype=np.float64)
    filled = np.zeros(m_subspaces, dtype=np.int64)
    # The fit's ONE shuffle moves a sampled, model-scale training set
    # into m groups — scope its sizing to the corpus' scan layout
    # (_model_scoped_shuffle) so a small corpus doesn't pay cores×3
    # partitions (mostly empty) for m=8 groups of rows.
    with _model_scoped_shuffle(corpus):
        rows = fitted.collect()  # m·k rows: the model, not data
    for row in rows:
        cb[row["sub_id"], row["code"]] = row["centroid"]
        filled[row["sub_id"]] = max(filled[row["sub_id"]], row["code"] + 1)
    # A corpus smaller than n_codes leaves trailing codebook rows at
    # zero, and the encoder's argmin could pick such a phantom "origin"
    # centroid. Pad with the FIRST real centroid instead: a duplicate
    # ties with its original and argmin resolves to the lower index, so
    # padded rows are never emitted as codes.
    for j in range(m_subspaces):
        if 0 < filled[j] < n_codes:
            cb[j, filled[j]:] = cb[j, 0]
    return cb


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
    normalize: bool = True,
) -> DataFrame:
    """Append the PQ code word: ``array<int>`` of ``m`` centroid indices
    (one byte each in a real store — 64 float32 → 8 codes is the 32×
    compression that lets a 100 TB corpus's search structure fit a
    cluster's RAM; parquet dictionary-encodes the int column to ~1 B).

    Arrow-batched numpy (one einsum per batch): dist²(x, c) = ‖c‖² − 2x·c
    up to the per-row constant ‖x‖², so argmin over codes needs only the
    cross term. Vectors are L2-normalized first when ``normalize`` (PQ for
    cosine quantizes the unit sphere)."""
    from pyspark.sql.functions import pandas_udf

    m, _, dsub = codebooks.shape
    c2 = (codebooks**2).sum(axis=2)  # (m, k)

    @pandas_udf("array<int>")
    def _enc(vs: pd.Series) -> pd.Series:
        X = np.asarray(vs.tolist(), dtype=np.float64)
        if normalize:
            X = _normalize_rows(X)
        Xs = X.reshape(len(X), m, dsub)
        dots = np.einsum("bjd,jkd->bjk", Xs, codebooks)
        codes = (c2[None, :, :] - 2.0 * dots).argmin(axis=2)
        return pd.Series(list(codes.astype(np.int32)))

    return df.withColumn(out_col, _enc(as_double(F.col(vec_col))))


class PQIndex(NamedTuple):
    """A built PQ index: the driver-side codebooks plus the materialized
    code table (neighbor_id, pq_codes). Build ONCE, search many — the
    FAISS train/add vs search split: the fit + encode cost amortizes over
    every query batch, and a persisted deployment writes ``coded`` as a
    parquet table whose m-int code column is the only thing the ADC scan
    ever reads."""

    codebooks: "np.ndarray"
    coded: DataFrame


def build_pq_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m_subspaces: int = 8,
    n_codes: int = 32,
    dim: int = 64,
    seed: int = 42,
    fit_fraction: float | None = None,
) -> PQIndex:
    """Fit codebooks (distributed, see fit_pq_codebooks) and encode every
    corpus vector; the code table is localCheckpoint-materialized so
    searches never re-pay the encode einsum."""
    cb = fit_pq_codebooks(
        corpus,
        vec_col=vec_col,
        id_col=id_col,
        m_subspaces=m_subspaces,
        n_codes=n_codes,
        dim=dim,
        seed=seed,
        fit_fraction=fit_fraction,
    )
    coded = pq_encode(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("cv"),
        ),
        cb,
        vec_col="cv",
    ).select("neighbor_id", "pq_codes")
    return PQIndex(cb, coded.localCheckpoint(eager=True))


def pq_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m_subspaces: int = 8,
    n_codes: int = 32,
    dim: int = 64,
    seed: int = 42,
    refine: int = 256,
    fit_fraction: float | None = None,
    index: PQIndex | None = None,
) -> DataFrame:
    """Product-quantization ANN with exact re-rank — the compressed-domain
    third family next to sign-LSH (data-oblivious buckets) and IVF
    (learned cells): candidates are scored against the 8-byte PQ codes,
    and only the top ``refine`` per query touch full vectors again.

    Scale story: the scan that scores 100 TB of embeddings reads the code
    column (m ints, dictionary-encoded) instead of the float array — 32×
    less I/O — and the exact re-rank reads full vectors for ``refine``
    rows per query via an id equi-join. The scan is the production ADC
    kernel: the per-query lookup table LUT[q,j,code] = q_subⱼ·c[j,code]
    is one einsum over the driver-collected query batch, shipped to tasks
    as a closure; each Arrow batch then scores ALL queries with one
    gather+sum and emits only its top ``refine`` — no corpus×queries
    materialization, no per-row Python, and the rank shuffle sees
    n_batches·nq·refine rows, not |corpus|·nq. Pass a prebuilt ``index``
    (build_pq_index) to amortize fit+encode across query batches — the
    default fits per call for API compatibility. Approximate ⇒ register
    rows-only, with recall asserted in tests like the other families."""
    import pyarrow as pa

    from pyspark.sql.functions import pandas_udf

    if index is None:
        index = build_pq_index(
            corpus,
            vec_col=vec_col,
            id_col=id_col,
            m_subspaces=m_subspaces,
            n_codes=n_codes,
            dim=dim,
            seed=seed,
            fit_fraction=fit_fraction,
        )
    cb, coded = index.codebooks, index.coded
    m, _, dsub = cb.shape

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    qids, Q = _query_matrix(q)
    if len(qids) == 0:
        return coded.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, knn_rank int"
        )
    # (nq, m, n_codes): the classic ADC LUT, one per query
    lut = np.einsum("qjd,jkd->qjk", Q.reshape(len(Q), m, dsub), cb)

    def scan(batches):
        for b in batches:
            pdf = b.to_pandas()
            if not len(pdf):
                continue
            C = np.asarray(pdf["pq_codes"].tolist(), dtype=np.int64)  # (B,m)
            ids = pdf["neighbor_id"].to_numpy().astype(np.int64)
            # Chunked like the brute-force scan, but the PQ gather is
            # accumulated PER SUBSPACE: a single fancy-index
            # lut[s:e, arange(m), C] would materialize a (chunk, B, m)
            # intermediate — m× the stated budget — before its .sum.
            # Per-subspace, at most TWO (chunk, B) matrices are ever live
            # (the S accumulator + one gather temp), so chunks are sized
            # against 2·B rows to keep the true peak at the budget.
            for s, e in _query_chunks(len(qids), 2 * len(ids)):
                # S[q,b] = Σⱼ LUT[q, j, C[b,j]]
                S = lut[s:e, 0, C[:, 0]]  # fancy index ⇒ already a fresh array
                for j in range(1, m):
                    S += lut[s:e, j, C[:, j]]
                S[qids[s:e, None] == ids[None, :]] = -np.inf  # self-pairs
                qa, na, ca = _per_batch_topr(qids[s:e], ids, S, refine)
                yield pa.RecordBatch.from_pydict(
                    {"query_id": qa, "neighbor_id": na, "_adc": ca}
                )

    cand = coded.mapInArrow(
        scan, "query_id long, neighbor_id long, _adc double"
    )
    w_adc = Window.partitionBy("query_id").orderBy(F.desc("_adc"), "neighbor_id")
    shortlist = (
        cand.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= refine)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank: full vectors only for refine·|queries| rows
    full = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    exact_cos = pandas_udf(_cosine_batch, "double")(F.col("qv"), F.col("cv"))
    rescored = (
        shortlist.join(full, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", exact_cos.alias("_cos"))
    )
    return _rank_topk(rescored, k)


class IVFPQIndex(NamedTuple):
    """A built IVF-PQ index: unit-space cell centroids, residual PQ
    codebooks, and the materialized code table (neighbor_id, cell,
    pq_codes). Build ONCE, search many (FAISS train/add vs search)."""

    centroids: "np.ndarray"
    codebooks: "np.ndarray"
    coded: DataFrame


def build_ivf_pq_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    m_subspaces: int = 8,
    n_codes: int = 32,
    dim: int = 64,
    seed: int = 42,
    fit_fraction: float | None = None,
    points_per_cell: int | None = 256,
) -> IVFPQIndex:
    """Coarse k-means cells + PQ codebooks fitted on the CELL RESIDUALS,
    every vector encoded; the code table is localCheckpoint-materialized.
    Residuals (x − cell_centroid) concentrate near the origin, so the
    same code budget quantizes them with far less error than raw
    vectors — that is why the residual step exists. Both fits auto-sample
    when ``fit_fraction`` is not given (points_per_cell · n_cells for the
    coarse quantizer here; fit_pq_codebooks applies its own
    points_per_code target to the residual codebooks).

    r13: the coarse fit is the driver-side deterministic numpy Lloyd on
    the collected (driver-sized by design) sample — see build_ivf_index;
    corpus-scale work (assignment, residuals, encode) stays distributed."""
    from high_volume_market_data_pipeline_spark.functions.expr import bind_once
    from high_volume_market_data_pipeline_spark.functions.vectors import norm

    spark = corpus.sparkSession

    def unit(col: F.Column) -> F.Column:
        return bind_once(
            norm(col), lambda n: F.transform(col, lambda x: x / n)
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        unit(as_double(F.col(vec_col))).alias("_nv"),
    ).persist()
    # One corpus count serves BOTH sampled fits: the residual frame below
    # is a 1:1 transform of c, so its row count is c's — pre-r12 each
    # _fit_sample ran its own count job, and the residual one re-paid the
    # assignment+join to count rows it could know for free (guide §1.2).
    n_corpus = c.count() if fit_fraction is None else None
    fit_input = _fit_sample(
        c,
        "neighbor_id",
        fit_fraction,
        points_per_cell * n_cells if points_per_cell is not None else None,
        n_rows=n_corpus,
        probe_empty=False,
    )
    X = _collect_fit_matrix(fit_input, c, "neighbor_id", "_nv")
    cent_np = _lloyd_fit(X, n_cells, seed, iters=15)
    inverted = _assign_cells(c, cent_np).select("neighbor_id", "_nv", "cell")

    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(cent_np)],
        "cell int, centroid array<double>",
    )

    # residual encode: PQ codebooks fitted on (x − centroid), not raw x.
    # Persisted: three consumers (the codebook fit's sample scan, its
    # Lloyd input, and the final encode) would otherwise each re-run the
    # cell assignment + centroid join + subtraction.
    resid = (
        inverted.join(F.broadcast(cent_df), "cell")
        .select(
            "neighbor_id",
            "cell",
            F.zip_with("_nv", "centroid", lambda x, y: x - y).alias("resid"),
        )
        .persist()
    )
    cb = fit_pq_codebooks(
        resid,
        vec_col="resid",
        id_col="neighbor_id",
        m_subspaces=m_subspaces,
        n_codes=n_codes,
        dim=dim,
        seed=seed,
        fit_fraction=fit_fraction,
        normalize=False,
        n_rows=n_corpus,
    )
    coded = pq_encode(resid, cb, vec_col="resid", normalize=False).select(
        "neighbor_id", "cell", "pq_codes"
    )
    coded = coded.localCheckpoint(eager=True)  # the persisted index
    resid.unpersist()
    c.unpersist()
    return IVFPQIndex(cent_np, cb, coded)


def ivf_pq_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    m_subspaces: int = 8,
    n_codes: int = 32,
    dim: int = 64,
    seed: int = 42,
    refine: int = 256,
    fit_fraction: float | None = None,
    index: IVFPQIndex | None = None,
) -> DataFrame:
    """IVF-PQ: coarse k-means cells + product quantization of the CELL
    RESIDUALS — the composition both pieces exist for, and the standard
    production ANN layout (FAISS IVFPQ): the cell prunes which candidates
    are scored, the residual codes shrink what scoring reads.

    At 100 TB: candidate I/O = (probed cells' share of the corpus) ×
    (m code-ints per row) — both factors independently tunable
    (n_cells ~ √n, code budget m·log2(n_codes) bits) — then ``refine``
    full-vector reads per query for the exact re-rank. The search side is
    all model-scale driver math plus ONE equi-join: cell probing runs on
    the driver over the collected query batch (centroids are n_cells
    rows — the same metadata the build already collects), candidate rows
    ship (query_id, cell, q·centroid scalar, codes) — never a query or
    centroid VECTOR — and the ADC score is a per-batch LUT gather:
    cos(q, centroid + decode(codes)) = q·centroid + Σⱼ LUT[q,j,codeⱼ].
    Pass a prebuilt ``index`` (build_ivf_pq_index) to amortize the fit
    across query batches."""
    import pyarrow as pa  # noqa: F401  (parity with pq_knn's arrow path)

    from pyspark.sql.functions import pandas_udf

    if index is None:
        index = build_ivf_pq_index(
            corpus,
            vec_col=vec_col,
            id_col=id_col,
            n_cells=n_cells,
            m_subspaces=m_subspaces,
            n_codes=n_codes,
            dim=dim,
            seed=seed,
            fit_fraction=fit_fraction,
        )
    cent_np, cb, coded = index.centroids, index.codebooks, index.coded
    m, _, dsub = cb.shape

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    qids, Qn = _query_matrix(q)
    if len(qids) == 0:
        return coded.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, knn_rank int"
        )
    spark = coded.sparkSession
    # driver-side cell probe: (nq, n_cells) distances, deterministic
    # (d2, cell) order — same rule the old crossJoin window used
    d2 = ((Qn[:, None, :] - cent_np[None, :, :]) ** 2).sum(axis=2)
    qdotc = Qn @ cent_np.T
    probe_rows = []
    cells_ix = np.arange(cent_np.shape[0])
    for qi in range(len(qids)):
        for cell in np.lexsort((cells_ix, d2[qi]))[:n_probe]:
            probe_rows.append(
                (int(qids[qi]), int(cell), float(qdotc[qi, cell]))
            )
    probed = spark.createDataFrame(
        probe_rows, "query_id long, cell int, _qdotc double"
    )
    # static probed-cell pruning — see ivf_knn: a PartitionFilter on the
    # persisted cell-partitioned code table, a no-op filter in RAM
    coded = coded.filter(
        F.col("cell").isin(sorted({c for _, c, _ in probe_rows}))
    )

    # per-query residual LUT, shipped as a task closure (model-scale)
    lut = np.einsum("qjd,jkd->qjk", Qn.reshape(len(Qn), m, dsub), cb)
    qorder = np.argsort(qids)
    qids_sorted = qids[qorder]

    @pandas_udf("double")
    def _adc(qid_s: pd.Series, qdotc_s: pd.Series, codes: pd.Series) -> pd.Series:
        qarr = qid_s.to_numpy().astype(np.int64)
        idx = qorder[np.searchsorted(qids_sorted, qarr)]
        C = np.asarray(codes.tolist(), dtype=np.int64)  # (B, m)
        qd = qdotc_s.to_numpy().astype(np.float64)
        S = lut[idx[:, None], np.arange(m)[None, :], C].sum(axis=1) + qd
        return pd.Series(S)

    cand = (
        coded.join(F.broadcast(probed), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _adc(F.col("query_id"), F.col("_qdotc"), F.col("pq_codes")).alias(
                "_adc"
            ),
        )
        # no dropDuplicates: a vector lives in exactly ONE cell, so the
        # (query, neighbor) pairs from the probed-cell join are unique
    )
    w_adc = Window.partitionBy("query_id").orderBy(F.desc("_adc"), "neighbor_id")
    shortlist = (
        cand.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= refine)
        .select("query_id", "neighbor_id")
    )
    full = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    exact_cos = pandas_udf(_cosine_batch, "double")(F.col("qv"), F.col("cv"))
    rescored = (
        shortlist.join(full, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", exact_cos.alias("_cos"))
    )
    return _rank_topk(rescored, k)


def with_recall_at_k(ann: DataFrame, exact: DataFrame) -> DataFrame:
    """Append per-query ``recall_at_k`` to an ANN result: |ann ∩ exact| /
    |exact| over neighbor sets (both inputs shaped (query_id, neighbor_id,
    ...)).

    Grading the approximate result against the exact one is the standard
    ANN quality gate; at real scale run it over a query SAMPLE (brute force
    on the sample costs one broadcast pass over the corpus). Queries whose
    ANN result is empty keep recall 0 via the left join + fill."""
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "leftsemi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    totals = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("_total"))
    rec = hits.join(totals, "query_id").select(
        "query_id",
        F.round(F.col("_hits") / F.col("_total"), 4).alias("recall_at_k"),
    )
    return (
        ann.join(F.broadcast(rec), "query_id", "left")
        .na.fill({"recall_at_k": 0.0})
    )
