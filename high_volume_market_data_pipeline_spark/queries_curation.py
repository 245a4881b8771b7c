"""Dataset-curation queries for training-data assembly: contamination
screening, deterministic splits, quota sampling, and token-budget shard
packing over `documents` (driver north-star extension — the reference has
no curation surface; these are the ops a 100 TB pretraining pipeline runs
after dedup/quality gating).

Determinism rules (registry docstring): every sampling / splitting decision
derives from md5 over UTF-8 bytes — never engine RNG — so each query has a
bit-identical DuckDB twin. Token counts are integers; cumulative sums are
integer-exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.dedup.minhash import word_shingles
from high_volume_market_data_pipeline_spark.functions.text import token_count
from high_volume_market_data_pipeline_spark.operators import (
    broadcast_join,
    group_cap_sample,
    hash_rate_sample,
    hash_split,
)
from high_volume_market_data_pipeline_spark.queries_dedup import (
    _hex_to_int_sql,
    shingle_twin_sql,
)
from high_volume_market_data_pipeline_spark.registry import query

# Word 8-grams for contamination: long enough that the synthetic vocab only
# collides on genuinely shared passages (trigram shingles — the near-dup
# default — would flag almost every doc pair from a small vocabulary).
_CONTAM_W = 8

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


_TOKC_SQL = "len(regexp_split_to_array(trim(text), '\\s+'))"
_SPLIT_BUCKET_SQL = (
    _hex_to_int_sql("md5(CAST(doc_id AS VARCHAR))") + " % 100"
)


@query(
    "benchmark_contamination",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, {_NORM_SQL} AS norm FROM documents
    ), toks AS (
      SELECT doc_id, source, norm,
             string_split(norm, ' ') AS t FROM base
    ), sh AS (
      SELECT doc_id, source,
             {shingle_twin_sql(_CONTAM_W)} AS shingles
      FROM toks
    ), bench AS (
      SELECT DISTINCT unnest(list_distinct(shingles)) AS s
      FROM sh WHERE source = 'src0'
    ), train AS (
      SELECT doc_id, source, unnest(list_distinct(shingles)) AS s
      FROM sh WHERE source <> 'src0'
    )
    SELECT t.doc_id, t.source, COUNT(*) AS n_shared
    FROM train t JOIN bench b ON t.s = b.s
    GROUP BY t.doc_id, t.source
    ORDER BY t.doc_id
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: training documents sharing at least
    one word 8-gram with the held-out benchmark set (source 'src0' stands
    in for an eval suite). The benchmark side collapses to a DISTINCT
    shingle set and BROADCASTS — eval suites are tiny next to a training
    corpus, so the 100 TB side streams through a broadcast-hash semi
    structure with no fact shuffle before the per-doc count. Docs shorter
    than 8 words contribute their whole normalized text (same fallback as
    word_shingles), so verbatim short-doc copies are still caught."""
    docs = load_table(spark, sf_dir, "documents")
    grams = F.array_distinct(word_shingles(F.col("text"), _CONTAM_W))
    bench = (
        docs.filter(F.col("source") == "src0")
        .select(F.explode(grams).alias("s"))
        .distinct()
    )
    train = docs.filter(F.col("source") != "src0").select(
        "doc_id", "source", F.explode(grams).alias("s")
    )
    hit = broadcast_join(train, bench, train.s == bench.s)
    return (
        hit.groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy("doc_id")
    )


@query(
    "hash_split_train_val",
    oracle=f"""
    WITH b AS (
      -- hash_split assigns bucket ranges in SORTED split-name order:
      -- test < 5, train < 95, val otherwise (insertion-order independent)
      SELECT CASE WHEN {_SPLIT_BUCKET_SQL} < 5 THEN 'test'
                  WHEN {_SPLIT_BUCKET_SQL} < 95 THEN 'train'
                  ELSE 'val' END AS split,
             {_TOKC_SQL} AS tok,
             n_chars
      FROM documents
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM b GROUP BY split ORDER BY split
    """,
)
def hash_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split keyed on md5(doc_id) —
    the split of a document never depends on partitioning, row order, or
    cluster size, so re-runs and incremental appends land each doc in the
    same split (the property `randomSplit` does NOT give you on a growing
    table). Pure map-side: one narrow projection then a 3-group
    aggregation; at 100 TB the only shuffle carries 3 partial rows per
    task."""
    docs = load_table(spark, sf_dir, "documents")
    labelled = hash_split(
        docs, "doc_id", {"train": 90, "val": 5, "test": 5}
    )
    return (
        labelled.select(
            "split",
            token_count(F.col("text")).alias("tok"),
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("n_tokens"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split")
    )


@query(
    "lang_quota_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, lang, rk FROM ranked
    WHERE rk <= 20 ORDER BY lang, rk
    """,
)
def lang_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-quota sampling for dataset mixing: keep at most 20 docs
    per language, chosen by md5(doc_id) rank — a deterministic uniform
    draw (hash order is independent of doc content and arrival order).
    This is how a mixing recipe caps an over-represented language without
    an RNG: one shuffle on lang, per-partition heap via row_number, early
    filter. Skewed languages (English at web scale) would salt the rank
    into sub-quotas per salt — same pattern as operators/skew.py."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        group_cap_sample(docs.select("doc_id", "lang"), ["lang"], "doc_id", 20)
        .select("doc_id", "lang", "rk")
        .orderBy("lang", "rk")
    )


# Stratified retention rates (percent) for the language-mixing sample:
# downweight the dominant language, keep nearly all of the rare ones.
_MIX_RATES = {"en": 25, "de": 60, "es": 70, "fr": 70, "zh": 90}
_MIX_RATE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_MIX_RATES.items()))
    + " ELSE 0 END"
)


@query(
    "stratified_lang_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_hex_to_int_sql("md5(CAST(doc_id AS VARCHAR))")} % 100
          < {_MIX_RATE_SQL}
    ORDER BY doc_id
    """,
)
def stratified_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified rate sampling for language mixing: each language keeps a
    different fraction of its documents (en 25% … zh 90%), decided by
    md5(doc_id) bucket — no RNG, so membership is stable across re-runs,
    engines, and table growth. Entirely map-side: the filter rides the
    parquet scan (no shuffle at any scale); contrast lang_quota_sample,
    which needs a per-language shuffle to enforce an absolute cap."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_rate_sample(docs, "doc_id", _MIX_RATES, stratum="lang")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# Context-window chunking knobs: 32-token windows advancing 24 tokens
# (8-token overlap) — the sliding-window shape; real pipelines use
# 2048/1536 etc., identical plan.
_CW = 32
_CS = 24


@query(
    "context_window_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(range(1, len(toks) + 1, {_CS})) AS start
      FROM t
    )
    SELECT doc_id,
           CAST((start - 1) / {_CS} AS BIGINT) AS chunk_id,
           start,
           least(start + {_CW} - 1, n) - start + 1 AS chunk_tokens,
           array_to_string(
             list_slice(toks, start, least(start + {_CW} - 1, n)), ' '
           ) AS chunk_text
    FROM s
    ORDER BY doc_id, chunk_id
    """,
)
def context_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding context-window chunking: each document becomes overlapping
    32-token windows with stride 24 — how a tokenize-and-pack job turns
    variable-length documents into fixed-context training samples without
    losing cross-boundary n-grams.

    Pure per-row array work (sequence → explode → slice) on the scan
    stage: no shuffle, no Python, output rows ∝ input tokens / stride.
    At 100 TB this is the map stage before shard writing; the final
    orderBy exists only for the deterministic oracle compare (a real run
    writes partitioned by hash(doc_id) with no global sort).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    n = F.size(toks)
    d = docs.select(
        "doc_id",
        toks.alias("toks"),
        n.alias("n"),
        F.explode(F.sequence(F.lit(1), n, F.lit(_CS))).alias("start"),
    )
    start = F.col("start")
    chunk = F.slice(F.col("toks"), start, F.lit(_CW))
    return (
        d.select(
            "doc_id",
            ((start - 1) / _CS).cast("long").alias("chunk_id"),
            "start",
            F.size(chunk).alias("chunk_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@query(
    "token_budget_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_TOKC_SQL} AS tok FROM documents
    ), c AS (
      SELECT doc_id, source, tok,
             SUM(tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM t
    )
    SELECT source,
           CAST(FLOOR((cum - tok) / 512.0) AS BIGINT) AS chunk_id,
           COUNT(*) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c GROUP BY source, chunk_id
    ORDER BY source, chunk_id
    """,
)
def token_budget_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard planning: pack each source's documents (in
    doc_id order) into ~512-token chunks by exclusive running sum — the
    deterministic greedy packing a tokenize-and-shard job uses to emit
    fixed-budget training shards. Parallel by construction: the cumulative
    sum partitions on source, so no global single-partition window; at
    100 TB the unit would be (source, day) files with the same shape.
    Integer token counts make the running sum engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", token_count(F.col("text")).alias("tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("tok").over(w))
    chunk = F.floor((F.col("cum") - F.col("tok")) / F.lit(512.0)).cast("long")
    return (
        c.withColumn("chunk_id", chunk)
        .groupBy("source", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "chunk_id")
    )


from high_volume_market_data_pipeline_spark.queries_text import (  # noqa: E402
    _SW_SQL as _SW_FOR_QWS,
)

_QUALITY_SQL = """ROUND(
  0.5 * (len(list_filter(toks, t -> list_contains(_SW_, t)))
         / CAST(len(toks) AS DOUBLE))
  + 0.4 * least(len(toks) / 64.0, 1.0)
  + 0.1 * (1.0 - (length(text)
                  - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                 / CAST(length(text) AS DOUBLE)),
6)""".replace("_SW_", _SW_FOR_QWS)


@query(
    "quality_weighted_sample",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source, text,
             regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ), q AS (
      SELECT doc_id, lang, source, {_QUALITY_SQL} AS quality FROM t
    ), d AS (
      SELECT doc_id, lang, source, quality,
             {_hex_to_int_sql("md5(CAST(doc_id AS VARCHAR))")} % 1000000
               AS draw,
             CAST(floor(least(1.0, greatest(0.05, quality)) * 1000000.0)
                  AS BIGINT) AS keep_below
      FROM q
    )
    SELECT doc_id, lang, source, quality, draw, keep_below
    FROM d WHERE draw < keep_below
    ORDER BY doc_id
    """,
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling ∝ quality score — the curation op that
    up-weights high-quality text without hard thresholds: each document
    keeps with probability clamp(quality, 0.05, 1) via a deterministic
    md5 draw (u = md5(doc_id) mod 1e6, keep iff u < floor(p·1e6)). No
    RNG: membership is a pure function of doc_id, stable under appends,
    repartitioning, and re-runs (the property randomSplit lacks), and the
    integer threshold compare is engine-exact. Expected corpus share ≈
    mean clamped quality; the low clamp keeps a floor of low-quality text
    (total-filter bias is itself a known curation failure mode)."""
    from high_volume_market_data_pipeline_spark.functions.text import (
        quality_score,
    )
    from high_volume_market_data_pipeline_spark.operators.sampling import (
        hash_bucket,
    )

    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(F.col("text"))
    p_keep = F.least(F.lit(1.0), F.greatest(F.lit(0.05), q))
    thresh = F.floor(p_keep * 1000000.0).cast("long")
    u = hash_bucket(F.col("doc_id"), 1_000_000)
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            q.alias("quality"),
            u.alias("draw"),
            thresh.alias("keep_below"),
        )
        .filter(F.col("draw") < F.col("keep_below"))
        .orderBy("doc_id")
    )
