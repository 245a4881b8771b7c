"""Deduplication queries over `documents` — exact, MinHash+LSH, SimHash.

The MinHash/LSH pipeline is fully oracle-checked (md5-based signatures are
bit-identical in DuckDB — see dedup/minhash.py); the SQL twins below are
generated from the same constants (k, bands, shingle width) as the Spark
implementation, so the two can't silently diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    ngram_jaccard,
    simhash32,
)
from high_volume_market_data_pipeline_spark.dedup.minhash import (
    DEFAULT_BANDS,
    DEFAULT_K,
    DEFAULT_SHINGLE,
)
from high_volume_market_data_pipeline_spark.dedup.simhash import BITS
from high_volume_market_data_pipeline_spark.registry import query

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@query(
    "exact_dedup_documents",
    oracle=f"""
    SELECT md5({_NORM_SQL}) AS fingerprint,
           MIN(doc_id) AS kept_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY fingerprint
    ORDER BY fingerprint
    """,
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the md5 content fingerprint, min doc_id
    wins (deterministic keep)."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id", keep="min").orderBy("fingerprint")


def _minhash_sql_parts(k: int = DEFAULT_K, w: int = DEFAULT_SHINGLE) -> tuple[str, str]:
    """(sig_expr, bands_expr) SQL fragments built from the same constants
    as the Spark implementation."""
    comps = ", ".join(
        "list_aggregate(list_transform(shingles, s -> "
        f"substr(md5('{j // 4}|' || s), {1 + 8 * (j % 4)}, 8)), 'min')"
        for j in range(k)
    )
    r = k // DEFAULT_BANDS
    bands = ", ".join(
        "'" + str(b) + "|' || " + " || '|' || ".join(
            f"sig[{b * r + i + 1}]" for i in range(r)
        )
        for b in range(DEFAULT_BANDS)
    )
    return f"[{comps}]", f"[{bands}]"


_SIG_SQL, _BANDS_SQL = _minhash_sql_parts()


def shingles_cte(source: str = "documents") -> str:
    """The shingle CTE chain over any (doc_id, text) relation — reused by
    the minhash/cluster oracles here and by the curation-funnel oracle
    (queries_history), which runs the same pipeline over its gated,
    exact-deduped survivor set instead of raw ``documents``."""
    return f"""
    base AS (
      SELECT doc_id, {_NORM_SQL} AS norm FROM {source}
    ), toks AS (
      SELECT doc_id, norm, string_split(norm, ' ') AS t FROM base
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(t) < {DEFAULT_SHINGLE} THEN [norm]
                  ELSE list_transform(
                         range(1, len(t) - {DEFAULT_SHINGLE} + 2),
                         i -> {" || ' ' || ".join(f"t[i+{off}]" for off in range(DEFAULT_SHINGLE))}
                       )
             END AS shingles
      FROM toks
    )
"""


_SHINGLES_CTE = shingles_cte()


@query(
    "minhash_lsh_near_dup",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sig AS (
      SELECT doc_id, {_SIG_SQL} AS sig FROM sh
    ), banded AS (
      SELECT doc_id, sig, unnest({_BANDS_SQL}) AS band_key FROM sig
    ), counted AS (
      SELECT *, COUNT(*) OVER (PARTITION BY band_key) AS bn FROM banded
    ), kept AS (
      SELECT * FROM counted WHERE bn <= 1000
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM kept a JOIN kept b USING (band_key)
      WHERE a.doc_id < b.doc_id
    ), scored AS (
      SELECT p.id_a, p.id_b,
             ROUND(len(list_filter(range(1, {DEFAULT_K + 1}), i -> sa.sig[i] = sb.sig[i])) / {float(DEFAULT_K)}, 6) AS est_jaccard
      FROM pairs p
      JOIN sig sa ON sa.doc_id = p.id_a
      JOIN sig sb ON sb.doc_id = p.id_b
    ), dsh AS (
      SELECT doc_id, list_distinct(shingles) AS shd FROM sh
    )
    SELECT s.id_a, s.id_b, s.est_jaccard,
           ROUND(len(list_filter(da.shd, x -> list_contains(db.shd, x)))
                 / CAST(len(list_distinct(da.shd || db.shd)) AS DOUBLE), 6) AS jaccard
    FROM scored s
    JOIN dsh da ON da.doc_id = s.id_a
    JOIN dsh db ON db.doc_id = s.id_b
    ORDER BY s.id_a, s.id_b
    """,
)
def minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline: MinHash signatures → LSH band buckets →
    candidate pairs → exact n-gram Jaccard verification. Oracle-checked end
    to end (md5 minhashes are engine-identical)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs, "text", "doc_id")
    return ngram_jaccard(pairs, docs, "text", "doc_id").orderBy("id_a", "id_b")


def _hex_to_int_sql(hexpr: str) -> str:
    """8-hex-char → int via positional arithmetic (DuckDB lacks conv())."""
    return (
        "CAST(list_sum(list_transform(range(0, 8), j -> "
        f"(strpos('0123456789abcdef', substr({hexpr}, CAST(j+1 AS INT), 1)) - 1)"
        " * (16.0 ** (7 - j)))) AS BIGINT)"
    )


@query(
    "simhash_documents",
    oracle=f"""
    WITH toked AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ), hashed AS (
      SELECT doc_id, {_hex_to_int_sql("md5(tok)")} AS h FROM toked
    ), bits AS (
      SELECT doc_id,
             {", ".join(f"SUM(((h >> {i}) & 1) * 2 - 1) AS s_{i}" for i in range(BITS))}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({" + ".join(f"CASE WHEN s_{i} > 0 THEN {2**i} ELSE 0 END" for i in range(BITS))} AS BIGINT) AS simhash
    FROM bits
    ORDER BY doc_id
    """,
)
def simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signature per document (hamming-space near-dup key)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash32(docs, "text", "doc_id").orderBy("doc_id")


from high_volume_market_data_pipeline_spark.dedup.clustering import (  # noqa: E402
    connected_components,
)

_PAIRS_CTES = f"""{_SHINGLES_CTE},
    sig AS (
      SELECT doc_id, {_SIG_SQL} AS sig FROM sh
    ), banded AS (
      SELECT doc_id, sig, unnest({_BANDS_SQL}) AS band_key FROM sig
    ), counted AS (
      SELECT *, COUNT(*) OVER (PARTITION BY band_key) AS bn FROM banded
    ), kept AS (
      SELECT * FROM counted WHERE bn <= 1000
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM kept a JOIN kept b USING (band_key)
      WHERE a.doc_id < b.doc_id
    ), scored_pairs AS (
      SELECT p.id_a, p.id_b,
             len(list_filter(range(1, {DEFAULT_K + 1}), i -> sa.sig[i] = sb.sig[i]))
               / {float(DEFAULT_K)} AS est_jaccard
      FROM cand p
      JOIN sig sa ON sa.doc_id = p.id_a
      JOIN sig sb ON sb.doc_id = p.id_b
    )"""


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTES},
    strong AS (
      SELECT id_a, id_b FROM scored_pairs WHERE est_jaccard >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM strong
      UNION
      SELECT id_b AS src, id_a AS dst FROM strong
    ), reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, rr.r FROM edges e JOIN reach rr ON rr.id = e.dst
    )
    SELECT id AS doc_id,
           MIN(r) AS cluster_id,
           (id = MIN(r)) AS is_kept
    FROM reach
    GROUP BY id
    ORDER BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: LSH pairs (est_jaccard ≥ 0.5) → connected
    components → keep-min-id-per-component. The transitive step is what
    pairwise dedup misses (A~B, B~C chains); oracle is a recursive-CTE
    transitive closure over the identical pair graph."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs, "text", "doc_id").filter(
        F.col("est_jaccard") >= 0.5
    )
    cc = connected_components(pairs)
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_kept"),
    ).orderBy("doc_id")


_TOKC_SQL = "len(regexp_split_to_array(trim(text), '\\s+'))"

_NJ_HASH_SQL = _hex_to_int_sql("md5(x)")


@query(
    "ngram_jaccard_blocked",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    tc AS (
      SELECT doc_id, lang, {_TOKC_SQL} AS nt FROM documents
    ), d AS (
      SELECT s.doc_id,
             tc.lang || '|' || CAST(tc.nt // 8 AS VARCHAR) AS blk,
             list_distinct(
               list_transform(list_distinct(s.shingles), x -> {_NJ_HASH_SQL})
             ) AS shd
      FROM sh s JOIN tc USING (doc_id)
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(len(list_filter(a.shd, x -> list_contains(b.shd, x)))
                   / CAST(len(list_distinct(a.shd || b.shd)) AS DOUBLE), 6)
               AS jaccard
      FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard FROM pairs
    WHERE jaccard >= 0.3
    ORDER BY id_a, id_b
    """,
)
def ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone exact n-gram Jaccard dedup (no MinHash estimate in the
    loop): candidate pairs come from a cheap deterministic block —
    (language, token-count bucket of 8; near-dups rarely differ by 8+
    tokens, the bucket keeps 5 of the 6 true sf0.01 pairs) — then
    word-trigram Jaccard computes exactly on each pair over md5-HASHED
    shingle sets (long arrays: ~3x smaller pair shuffle, long equality in
    the intersect — the string form shipped ~2 GB at sf0.1). The blocked
    quadratic is the honest cost model when candidate volume is small;
    minhash_lsh_near_dup is the scale path, sharing the same verify
    arithmetic. Width is pinned at 8 here (the oracle embeds the
    literal); dedup.ngram.token_block_pairs' ``target_block_rows`` knob
    is the measured scale path (width ∝ 1/n keeps block occupancy
    constant — BASELINE.md scale table)."""
    from high_volume_market_data_pipeline_spark.dedup.ngram import (
        blocked_ngram_jaccard,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r12: fused single-scan/single-shuffle path (see blocked_ngram_jaccard)
    return (
        blocked_ngram_jaccard(docs, block_tokens=8, hashed=True)
        .filter(F.col("jaccard") >= 0.3)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


_NJ_TARGET = 32  # adaptive blocking: expected rows per block


def _nj_adaptive_oracle() -> str:
    """DuckDB twin of token_block_pairs' adaptive knobs. Both knobs are
    pure integer arithmetic over (n, #langs, token-count range), so the
    oracle computes width and prefix-bucket count from the data exactly
    as the Spark driver does — no embedded literals to go stale."""
    from high_volume_market_data_pipeline_spark.dedup.ngram import (
        PREFIX_CHARS,
    )

    ph = _hex_to_int_sql(f"md5(substr(trim(tc.text), 1, {PREFIX_CHARS}))")
    pm = _hex_to_int_sql(
        f"md5(substr(trim(tc.text), "
        f"CAST(length(trim(tc.text)) // 2 AS INT) + 1, {PREFIX_CHARS}))"
    )
    return f"""
    WITH {_SHINGLES_CTE},
    tc AS (
      SELECT doc_id, lang, text, {_TOKC_SQL} AS nt FROM documents
    ), knobs AS (
      SELECT GREATEST(1, LEAST(8,
               ({_NJ_TARGET} * GREATEST(1, COUNT(DISTINCT lang)
                  * (MAX(nt) - MIN(nt) + 1))) // COUNT(*))) AS w,
             GREATEST(1, COUNT(*) //
               (GREATEST(1, COUNT(DISTINCT lang)
                  * (MAX(nt) - MIN(nt) + 1)) * {_NJ_TARGET})) AS b
      FROM tc
    ), keyed AS (
      SELECT s.doc_id,
             CASE WHEN k.b > 1 THEN [
               tc.lang || '|' || CAST(tc.nt // k.w AS VARCHAR)
                 || '|h|' || CAST(({ph}) % k.b AS VARCHAR),
               tc.lang || '|' || CAST(tc.nt // k.w AS VARCHAR)
                 || '|m|' || CAST(({pm}) % k.b AS VARCHAR),
               tc.lang || '|' || CAST(tc.nt // (8 * k.w) AS VARCHAR)
                 || '|w1|' || CAST(({ph}) % (8 * k.b) AS VARCHAR),
               tc.lang || '|' || CAST((tc.nt + 4 * k.w) // (8 * k.w) AS VARCHAR)
                 || '|w2|' || CAST(({ph}) % (8 * k.b) AS VARCHAR)
             ] ELSE [
               tc.lang || '|' || CAST(tc.nt // k.w AS VARCHAR)
             ] END AS blks,
             list_distinct(
               list_transform(list_distinct(s.shingles), x -> {_NJ_HASH_SQL})
             ) AS shd
      FROM sh s JOIN tc USING (doc_id) CROSS JOIN knobs k
    ), d AS (
      SELECT doc_id, unnest(blks) AS blk, shd FROM keyed
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(len(list_filter(a.shd, x -> list_contains(b.shd, x)))
                   / CAST(len(list_distinct(a.shd || b.shd)) AS DOUBLE), 6)
               AS jaccard
      FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard FROM pairs
    WHERE jaccard >= 0.3
    ORDER BY id_a, id_b
    """


@query("ngram_jaccard_adaptive", oracle=_nj_adaptive_oracle())
def ngram_jaccard_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-SAFE config of standalone exact n-gram Jaccard: same
    verify arithmetic as ngram_jaccard_blocked, but the block key adapts
    to corpus size instead of pinning width 8 (fixed width measured 86×
    on 10× data — BASELINE.md). Two integer knobs, both recomputed from
    the data by BOTH engines (so the oracle can't go stale):

      width = clamp(target·spread/n, 1, 8)  — holds expected block
        occupancy ≈ target (spread = #langs · token-count range), pair
        volume ∝ n·target instead of n²;
      prefix buckets b = max(1, n // (spread·target)) — the second block
        key that takes over once width floors at 1, OR-constructed over
        two probe positions (head prefix and mid-document prefix, each
        md5-bucketed mod b): a pair survives if either position
        co-blocks it, recovering prefix-edited near-dups; b = 1
        (constant key) until that point by construction.

    At sf0.01 (500 docs, spread 450) width resolves to 8 and b to 1 — the
    adaptive config degrades to the exact fixed-width result on small
    corpora, diverging only when the data demands it. One count-job on
    the driver (metadata, not data), one equi-join shuffle on the block
    key; recall trade of each knob is documented in
    dedup/ngram.token_block_pairs."""
    from high_volume_market_data_pipeline_spark.dedup.ngram import (
        blocked_ngram_jaccard,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r12: fused while the resolved knobs stay single-key (width > 1);
    # the multi-key regime keeps the two-phase dedup-then-attach shape
    return (
        blocked_ngram_jaccard(
            docs, block_tokens=8, target_block_rows=_NJ_TARGET, hashed=True
        )
        .filter(F.col("jaccard") >= 0.3)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


@query(
    "dedup_keep_best_quality",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTES},
    strong AS (
      SELECT id_a, id_b FROM scored_pairs WHERE est_jaccard >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM strong
      UNION
      SELECT id_b AS src, id_a AS dst FROM strong
    ), reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, rr.r FROM edges e JOIN reach rr ON rr.id = e.dst
    ), comp AS (
      SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
    ), allc AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
             d.n_chars
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    ), best AS (
      SELECT cluster_id, MAX(n_chars) AS best_chars
      FROM allc GROUP BY cluster_id
    ), keeper AS (
      SELECT a.cluster_id, MIN(a.doc_id) AS keep_id
      FROM allc a JOIN best b
        ON a.cluster_id = b.cluster_id AND a.n_chars = b.best_chars
      GROUP BY a.cluster_id
    )
    SELECT a.doc_id, a.cluster_id, a.n_chars,
           a.doc_id = k.keep_id AS is_kept
    FROM allc a JOIN keeper k USING (cluster_id)
    ORDER BY a.doc_id
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup collapse: LSH pairs → connected components →
    keep the LONGEST document per cluster (tiebreak min doc_id), not the
    min-id one — the curation policy that matters in practice (near-dup
    groups usually contain truncated/boilerplate variants; keeping min-id
    throws away the best copy half the time). Docs outside every pair are
    their own singleton cluster and always kept.

    The keeper choice is one row_number window over the clustered frame
    (cluster-count-sized, not corpus-sized); everything upstream reuses
    the oracle-checked pair/component machinery of dedup_clusters."""
    from pyspark.sql import Window

    from high_volume_market_data_pipeline_spark.dedup.clustering import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs, "text", "doc_id").filter(
        F.col("est_jaccard") >= 0.5
    )
    cc = connected_components(pairs)
    allc = (
        docs.select("doc_id", "n_chars")
        .join(cc, docs.doc_id == cc.id, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
            "n_chars",
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        allc.withColumn("is_kept", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "n_chars", "is_kept")
        .orderBy("doc_id")
    )


def _admission_oracle() -> str:
    """DuckDB twin of the FULL admission increment: bootstrap = docs with
    id < 250, incoming = the rest plus three re-sends (id + 1,000,000 of
    docs 0..2). Decisions replay relationally because every rule is
    md5-deterministic: (1) a doc is a within-batch loser iff some
    smaller-id incoming doc shares an LSH band (batch buckets capped at
    1000) with signature agreement ≥ 0.9 — one report row via the
    max-est-then-min-id window; (2) survivors probe the store's band
    keys (store buckets capped the same way) under the same estimate and
    window; (3) everyone else is admitted. Ids are disjoint across the
    two sides, so 'which table a signature row belongs to' is an id
    predicate, not a tag column."""
    sides = f"""
    all_src AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 3
    ),
    {shingles_cte("all_src")},
    sig AS (
      SELECT doc_id, {_SIG_SQL} AS sig FROM sh
    ), banded AS (
      SELECT doc_id, sig, unnest({_BANDS_SQL}) AS band_key FROM sig
    )"""
    return f"""
    WITH {sides},
    nb AS (  -- incoming side, batch bucket cap
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band_key) AS bn
        FROM banded WHERE doc_id >= 250
      ) WHERE bn <= 1000
    ), bpairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM nb a JOIN nb b USING (band_key)
      WHERE a.doc_id < b.doc_id
    ), bscored AS (
      SELECT id_a, id_b,
             ROUND(len(list_filter(range(1, 9), i -> sa.sig[i] = sb.sig[i]))
                   / 8.0, 6) AS est_jaccard
      FROM bpairs
      JOIN sig sa ON sa.doc_id = id_a
      JOIN sig sb ON sb.doc_id = id_b
    ), batch_loser AS (
      SELECT doc_id, matched_id, est_jaccard FROM (
        SELECT id_b AS doc_id, id_a AS matched_id, est_jaccard,
               ROW_NUMBER() OVER (
                 PARTITION BY id_b
                 ORDER BY est_jaccard DESC, id_a
               ) AS rn
        FROM bscored WHERE est_jaccard >= 0.9
      ) WHERE rn = 1
    ), sb AS (  -- store side, same bucket cap on the PROBE
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band_key) AS bn
        FROM banded WHERE doc_id < 250
      ) WHERE bn <= 1000
    ), probe AS (
      SELECT DISTINCT n.doc_id AS doc_id, s.doc_id AS matched_id
      FROM banded n JOIN sb s USING (band_key)
      WHERE n.doc_id >= 250
        AND n.doc_id NOT IN (SELECT doc_id FROM batch_loser)
    ), pscored AS (
      SELECT p.doc_id, p.matched_id,
             ROUND(len(list_filter(range(1, 9), i -> sa.sig[i] = sb2.sig[i]))
                   / 8.0, 6) AS est_jaccard
      FROM probe p
      JOIN sig sa ON sa.doc_id = p.doc_id
      JOIN sig sb2 ON sb2.doc_id = p.matched_id
    ), store_loser AS (
      SELECT doc_id, matched_id, est_jaccard FROM (
        SELECT doc_id, matched_id, est_jaccard,
               ROW_NUMBER() OVER (
                 PARTITION BY doc_id
                 ORDER BY est_jaccard DESC, matched_id
               ) AS rn
        FROM pscored WHERE est_jaccard >= 0.9
      ) WHERE rn = 1
    ), incoming AS (
      SELECT doc_id FROM all_src WHERE doc_id >= 250
    )
    SELECT doc_id, matched_id, est_jaccard, decision FROM (
      SELECT i.doc_id, CAST(NULL AS BIGINT) AS matched_id,
             CAST(NULL AS DOUBLE) AS est_jaccard,
             'admitted' AS decision
      FROM incoming i
      WHERE i.doc_id NOT IN (SELECT doc_id FROM batch_loser)
        AND i.doc_id NOT IN (SELECT doc_id FROM store_loser)
      UNION ALL
      SELECT doc_id, matched_id, est_jaccard, 'within_batch' FROM batch_loser
      UNION ALL
      SELECT doc_id, matched_id, est_jaccard, 'vs_store' FROM store_loser
    ) ORDER BY doc_id
    """


@query("incremental_dedup_admission", oracle=_admission_oracle())
def incremental_dedup_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup admission (dedup/incremental.SignatureStore):
    bootstrap a signature store from the first half of the corpus, then
    admit the second half plus three exact re-sends of stored docs. The
    returned frame is the deterministic admission report: one row per
    incoming doc with its decision; re-sends carry their matched source
    id at est_jaccard 1.0.

    FULL-ORACLE since r10 (was rows-only): the stateful read-modify-
    append CYCLE still has no SQL twin, but this single increment's
    DECISION SET does — every rule (within-batch pair-loser, store
    band probe, bucket caps, max-est/min-id report row) is
    md5-deterministic, so the oracle replays the admission relationally
    over the same two id-sliced sides and the driver hash pins the whole
    decision table. The store lives in a fresh temp dir per call
    (so the query is repeatable) and is removed before returning — the
    report frames are localCheckpoint-materialized inside
    dedup_increment, so nothing re-reads the store files afterwards;
    without the cleanup every correctness/bench invocation leaked a
    populated parquet store on disk."""
    import shutil
    import tempfile

    from high_volume_market_data_pipeline_spark.dedup.incremental import (
        SignatureStore,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    half = 250
    base = docs.filter(F.col("doc_id") < half)
    fresh = docs.filter(F.col("doc_id") >= half)
    resends = base.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    store_dir = tempfile.mkdtemp(prefix="sigstore_")
    try:
        store = SignatureStore(store_dir + "/sigs")
        store.bootstrap(base)
        admitted, rejected = store.dedup_increment(
            fresh.unionByName(resends), threshold=0.9
        )
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)
    report = admitted.select(
        "doc_id",
        F.lit(None).cast("long").alias("matched_id"),
        F.lit(None).cast("double").alias("est_jaccard"),
        F.lit("admitted").alias("decision"),
    ).unionByName(
        rejected.select(
            "doc_id",
            "matched_id",
            F.col("est_jaccard").cast("double"),
            F.col("reason").alias("decision"),
        )
    )
    return report.orderBy("doc_id")


_SDS_W = 8  # tokens per gram: long enough that only real shared passages
# collide on the synthetic vocab (same reasoning as benchmark_contamination)


def shingle_twin_sql(w: int) -> str:
    """DuckDB twin of dedup.minhash.word_shingles(text, w), given ``t`` =
    token array and ``norm`` = normalized text columns in scope. The ONE
    place the shingle rule is spelled in SQL — queries_curation imports it
    too, so a change to the Spark-side rule de-syncs every oracle at once
    (loudly) instead of one copy silently drifting."""
    gram = " || ' ' || ".join(f"t[i+{off}]" for off in range(w))
    return (
        f"CASE WHEN len(t) < {w} THEN [norm] "
        f"ELSE list_transform(range(1, len(t) - {w} + 2), i -> {gram}) END"
    )


@query(
    "substring_dup_spans",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_NORM_SQL} AS norm FROM documents
    ), toks AS (
      SELECT doc_id, norm, string_split(norm, ' ') AS t FROM base
    ), sh AS (
      SELECT doc_id, {shingle_twin_sql(_SDS_W)} AS shingles FROM toks
    ), g AS (
      SELECT doc_id,
             CAST(generate_subscripts(shingles, 1) AS BIGINT) - 1 AS pos,
             unnest(shingles) AS gram
      FROM sh
    ), h AS (
      SELECT doc_id, pos, {_hex_to_int_sql("md5(gram)")} AS hh FROM g
    ), dup AS (
      SELECT hh FROM h GROUP BY hh HAVING COUNT(DISTINCT doc_id) >= 2
    ), m AS (
      SELECT h.doc_id, h.pos, (d.hh IS NOT NULL) AS is_dup
      FROM h LEFT JOIN dup d USING (hh)
    ), r AS (
      SELECT doc_id, pos, is_dup,
             pos - ROW_NUMBER() OVER (
               PARTITION BY doc_id, is_dup ORDER BY pos
             ) AS grp
      FROM m
    ), runs AS (
      SELECT doc_id, grp, COUNT(*) AS run_len
      FROM r WHERE is_dup GROUP BY doc_id, grp
    ), mr AS (
      SELECT doc_id, MAX(run_len) AS max_dup_run FROM runs GROUP BY doc_id
    ), st AS (
      SELECT doc_id, COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_grams
      FROM m GROUP BY doc_id
    )
    SELECT st.doc_id, st.n_grams, st.n_dup_grams,
           floor(st.n_dup_grams * 1000000.0 / st.n_grams) / 1000000.0
             AS dup_share,
           COALESCE(mr.max_dup_run, 0) AS max_dup_run
    FROM st LEFT JOIN mr USING (doc_id)
    ORDER BY st.doc_id
    """,
)
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SUBSTRING-level duplication analysis — the span-dedup shape of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al., 2022): document-level dedup misses the boilerplate passages
    (headers, licenses, templates) duplicated INSIDE otherwise-unique
    documents. Per doc: total word 8-grams, grams shared verbatim with at
    least one OTHER doc, their share, and the longest consecutive
    duplicated run (≈ longest duplicated substring, in grams — a
    gaps-and-islands window over gram positions).

    Plan shape: posexplode grams once per consumer (two passes, like
    tfidf), hash to 32-bit longs BEFORE the self-join (NOTES rule: never
    ship gram strings through a shuffle), one groupBy(h) for the
    cross-doc gram set, one join back, windows partitioned by doc. At
    100 TB the dup-gram table is the only wide shuffle and it carries
    (hash, count) pairs only. Collision risk of the 32-bit slice is the
    documented ngram_jaccard tradeoff (~1e-5 per 300-gram doc pair).
    Remediation (dropping flagged spans) is a trivial filter on the
    marked frame; the analysis is the expensive, oracle-checkable part.
    """
    from pyspark.sql import Window

    from high_volume_market_data_pipeline_spark.dedup.minhash import (
        word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.posexplode(word_shingles(F.col("text"), _SDS_W)).alias(
            "pos", "gram"
        ),
    )
    hashed = grams.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
        .cast("long")
        .alias("hh"),
    )
    dup = (
        hashed.groupBy("hh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("hh", F.lit(True).alias("_dup"))
    )
    marked = hashed.join(dup, "hh", "left").select(
        "doc_id", "pos", F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup")
    )
    # Single tail pass: the island id (grp) and the island length (count
    # over the finer partition) both run on ONE (doc_id, is_dup) exchange
    # — HashPartitioning(doc_id, is_dup) satisfies the run_len window's
    # ClusteredDistribution(doc_id, is_dup, grp), so no second shuffle —
    # and one groupBy(doc_id) then folds counts, dup counts, and max run
    # together (a separate runs/stats pair of aggregations re-read the
    # marked frame, i.e. re-ran the gram explode + join, twice).
    w_run = Window.partitionBy("doc_id", "is_dup").orderBy("pos")
    w_len = Window.partitionBy("doc_id", "is_dup", "grp")
    r = marked.withColumn(
        "grp", F.col("pos") - F.row_number().over(w_run)
    ).withColumn("run_len", F.count(F.lit(1)).over(w_len))
    out = r.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.col("is_dup").cast("int")).cast("long").alias("n_dup_grams"),
        F.coalesce(
            F.max(F.when(F.col("is_dup"), F.col("run_len"))),
            F.lit(0).cast("long"),
        ).alias("max_dup_run"),
    )
    return out.select(
        "doc_id",
        "n_grams",
        "n_dup_grams",
        (
            F.floor(F.col("n_dup_grams") * 1000000.0 / F.col("n_grams"))
            / 1000000.0
        ).alias("dup_share"),
        "max_dup_run",
    ).orderBy("doc_id")
