"""Text-analysis queries over `documents` (driver north-star extension).

Each query pairs the JVM-side column functions in functions/text.py with a
DuckDB SQL twin computing the exact same expressions (same tokenization
regex, same stopword list, same md5 fingerprint), so the value-hash gate
holds bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_count,
    token_count,
)
from high_volume_market_data_pipeline_spark.registry import query

_SW_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"


@query(
    "text_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, n_chars, {_TOKS_SQL} AS toks FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(regexp_split_to_array(trim(text), '[\\s.,!?;:0-9]+')) AS n_bpe_ish,
           length(text) AS n_chars_calc,
           len(list_filter(toks, t -> list_contains({_SW_SQL}, t))) AS n_stopwords,
           ROUND(len(list_filter(toks, t -> list_contains({_SW_SQL}, t))) / CAST(len(toks) AS DOUBLE), 6) AS stopword_ratio,
           ROUND((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / CAST(length(text) AS DOUBLE), 6) AS punct_ratio
    FROM t
    ORDER BY doc_id
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), char/stopword/punct
    stats — the quality-filter feature set, computed in-scan with zero
    shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_ish"),
        F.length(t).alias("n_chars_calc"),
        stopword_count(t).alias("n_stopwords"),
        F.round(stopword_count(t) / token_count(t), 6).alias("stopword_ratio"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
    ).orderBy("doc_id")


def _lang_hits_sql() -> str:
    cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = "[" + ", ".join(f"'{w}'" for w in markers) + "]"
        cols.append(
            f"len(list_filter(toks, t -> list_contains({arr}, t))) AS h_{lang}"
        )
    return ", ".join(cols)


def _lang_case_sql() -> str:
    # Mirror of Spark greatest(struct(hits, lang)): max hits, ties → max lang.
    langs_desc = sorted(LANG_MARKERS, reverse=True)
    m = "greatest(" + ", ".join(f"h_{lang}" for lang in sorted(LANG_MARKERS)) + ")"
    cases = " ".join(
        f"WHEN h_{lang} = {m} THEN '{lang}'" for lang in langs_desc[:-1]
    )
    return f"CASE {cases} ELSE '{langs_desc[-1]}' END"


@query(
    "doc_quality_and_lang",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, lang, {_TOKS_SQL} AS toks FROM documents
    ), h AS (
      SELECT doc_id, text, lang, toks, {_lang_hits_sql()} FROM t
    )
    SELECT doc_id,
           lang AS labeled_lang,
           {_lang_case_sql()} AS detected_lang,
           ROUND(
             0.5 * (len(list_filter(toks, t -> list_contains({_SW_SQL}, t))) / CAST(len(toks) AS DOUBLE))
             + 0.4 * least(len(toks) / 64.0, 1.0)
             + 0.1 * (1.0 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / CAST(length(text) AS DOUBLE)),
           6) AS quality
    FROM h
    ORDER BY doc_id
    """,
)
def doc_quality_and_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (marker-word argmax) + composite quality score
    — deterministic argmax with lexicographic tie-break mirrored in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id(t).alias("detected_lang"),
        quality_score(t).alias("quality"),
    ).orderBy("doc_id")


@query(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text (the exact-dedup
    key; md5 hex is bit-identical across engines)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", fingerprint(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")
