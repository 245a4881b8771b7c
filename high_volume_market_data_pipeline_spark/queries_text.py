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
from high_volume_market_data_pipeline_spark.functions.expr import bind_once
from high_volume_market_data_pipeline_spark.functions.text import (
    LANG_MARKERS,
    PII_PATTERNS,
    STOPWORDS,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    pii_counts,
    punct_ratio,
    quality_score,
    redact_pii,
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
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lower(u.t) AS token
      FROM documents, unnest({_TOKS_SQL}) AS u(t)
      WHERE length(u.t) >= 3 AND NOT list_contains({_SW_SQL}, lower(u.t))
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, token, tf, df, tfidf, rnk AS term_rank
    FROM (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6)
                        DESC, tf.token
             ) AS rnk
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    WHERE rnk <= 3
    ORDER BY doc_id, term_rank
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the classic corpus-statistics
    operator (keyword extraction, relevance features for curation).

    Shape at scale: tokenize+explode is map-side; tf is one shuffle on
    (doc_id, token); df derives from tf with a token-only shuffle whose
    output is the VOCABULARY (sublinear in corpus size) — broadcast back
    onto tf, so the per-doc ranking window re-uses the tf partitioning.
    The corpus size joins in as a broadcast one-row frame, never a
    driver-side collect. Ranking orders by the ROUNDED score (then token)
    so cross-engine double ulps cannot flip ranks.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    raw = F.explode(F.split(F.trim("text"), r"\s+")).alias("raw")
    toks = (
        docs.select("doc_id", raw)
        .filter(
            (F.length("raw") >= 3) & ~F.lower("raw").isin(*sorted(STOPWORDS))
        )
        .select("doc_id", F.lower("raw").alias("token"))
    )
    # tf feeds both the df derivation and the scored join. Deliberately
    # NOT persisted: caching tf was measured 2.6× SLOWER end-to-end at
    # sf0.1 (2.52 s → 0.96 s median after removal) — the MEMORY_AND_DISK
    # materialization + InMemoryTableScan cost more than re-running the
    # columnar tokenize/explode/partial-agg pipeline, which stays inside
    # whole-stage codegen. The df branch's input is the already-combined
    # (doc_id, token) partials, so the duplicated work is map-side only.
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= 3)
        .select("doc_id", "token", "tf", "df", "tfidf", "term_rank")
        .orderBy("doc_id", "term_rank")
    )


@query(
    "doc_repetition_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), b AS (
      SELECT doc_id, toks, len(toks) AS n,
             [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS bg
      FROM t
    )
    SELECT doc_id,
           n AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           floor(len(list_distinct(toks)) * 1000000.0 / n) / 1000000.0
             AS distinct_ratio,
           floor(list_max(list_transform(list_distinct(toks),
                   x -> len(list_filter(toks, y -> y = x)))) * 1000000.0 / n)
             / 1000000.0 AS top_token_share,
           CASE WHEN n >= 2 THEN
             floor((len(bg) - len(list_distinct(bg))) * 1000000.0
                   / len(bg)) / 1000000.0
           ELSE 0.0 END AS bigram_rep_ratio
    FROM b
    ORDER BY doc_id
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals: distinct-token ratio, most-frequent
    token share, repeated-adjacent-bigram fraction — the boilerplate/spam
    detectors a curation gate runs before training.

    All pure array expressions on the scan stage (zero shuffles, zero
    Python); per-row cost is O(tokens · distinct-tokens), bounded by doc
    length, embarrassingly parallel at 100 TB. Ratios use the
    floor(x*1e6/n)/1e6 form: token counts are often powers of two, where
    ROUND(x/n, 6) lands on exact decimal halfway points and Spark (HALF_UP)
    and DuckDB disagree — floor over the identical IEEE division is
    bit-deterministic (see NOTES.md determinism rules).
    """
    docs = load_table(spark, sf_dir, "documents")

    def _ratio6(num, den):
        return F.floor(num * F.lit(1000000.0) / den) / F.lit(1000000.0)

    def _stats(t):
        # ``t`` is a BOUND lambda value (bind_once), so the tokenize split
        # runs once per row per output column — without the binding,
        # Catalyst inlines the split into every higher-order-lambda
        # reference and the per-row cost explodes ~30× (measured: 44 s →
        # 1.5 s at sf0.1 for this query).
        n = F.size(t)
        dt = F.array_distinct(t)
        top_cnt = F.array_max(
            F.transform(dt, lambda x: F.size(F.filter(t, lambda y: y == x)))
        )
        # element_at is 1-indexed — mirrors DuckDB's toks[i]. Guarded by
        # n >= 2: sequence(1, 0) would run DESCENDING, not empty.
        bg = F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        )
        n_bg = F.size(bg)
        rep_bg = n_bg - F.size(F.array_distinct(bg))
        return F.struct(
            n.alias("n_tokens"),
            F.size(dt).alias("n_distinct"),
            _ratio6(F.size(dt), n).alias("distinct_ratio"),
            _ratio6(top_cnt, n).alias("top_token_share"),
            F.when(n >= 2, _ratio6(rep_bg, n_bg))
            .otherwise(F.lit(0.0))
            .alias("bigram_rep_ratio"),
        )

    s = bind_once(F.split(F.trim("text"), r"\s+"), _stats)
    return (
        docs.select(
            "doc_id",
            s.getField("n_tokens").alias("n_tokens"),
            s.getField("n_distinct").alias("n_distinct"),
            s.getField("distinct_ratio").alias("distinct_ratio"),
            s.getField("top_token_share").alias("top_token_share"),
            s.getField("bigram_rep_ratio").alias("bigram_rep_ratio"),
        )
        .orderBy("doc_id")
    )


def _pii_redact_sql() -> str:
    expr = "text"
    for kind, pat in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '<{kind.upper()}>', 'g')"
    counts = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for _, pat in PII_PATTERNS
    )
    return f"{expr} AS redacted, {counts} AS n_redactions"


# Synthetic PII rows unioned into BOTH sides of pii_redact_documents so the
# value hash exercises actual redaction (the generated corpus contains no
# PII, which would reduce the gate to an identity check). Negative ids
# cannot collide with generated doc_ids; strings avoid quotes so they embed
# in the SQL literal verbatim.
_PII_SEED: tuple[tuple[int, str], ...] = (
    (-1, "Contact me at jane.doe@example.com for details"),
    (-2, "Visit https://example.com/path?q=1 for more"),
    (-3, "Call +1 (555) 123-4567 now"),
    (-4, "Email bob_smith+tag@mail.example.org or https://sub.example.net/a/b"),
    (-5, "Office: 020 7946 0958 and fax 020 7946 0959"),
    (-6, "No pii here at all, just plain text"),
    (-7, "Mixed: a@b.io and http://x.yz and 555-867-5309 together"),
    (-8, "url with trailing https://example.org/x#frag end"),
    (-9, "doubled emails first@ex.com second@ex.org"),
    (-10, "phone in parens (415) 555-0132 done"),
    (-11, "https://e.com/a?b=c&d=e plus e.e@e.co plus 12345678901"),
    (-12, "edge +44 7911 123456 uk mobile"),
)

_PII_SEED_SQL = ", ".join(
    f"(CAST({i} AS BIGINT), '{t}')" for i, t in _PII_SEED
)


@query(
    "pii_redact_documents",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT * FROM (VALUES {_PII_SEED_SQL}) AS seed(doc_id, text)
    )
    SELECT doc_id, {_pii_redact_sql()}
    FROM corpus
    ORDER BY doc_id
    """,
)
def pii_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: URLs / emails / phone-like runs → ``<KIND>`` tokens,
    plus a per-doc match count. Chained regexp_replace in scan-stage codegen
    — the shape of every large-scale scrubbing pass. The generated corpus
    contains no PII (those rows pin that the regexes alter NOTHING they
    shouldn't); a dozen literal synthetic-PII rows are unioned in on both
    sides so the value hash also pins real redaction behavior —
    emails/URLs/phones replaced, counts > 0 (plus
    tests/test_analytics.py::test_pii_redaction_on_pii_text).
    """
    docs = load_table(spark, sf_dir, "documents")
    seed = spark.createDataFrame(list(_PII_SEED), "doc_id bigint, text string")
    corpus = docs.select("doc_id", "text").unionByName(seed)
    return corpus.select(
        "doc_id",
        redact_pii(F.col("text")).alias("redacted"),
        pii_counts(F.col("text")).alias("n_redactions"),
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


@query(
    "source_reliability",
    oracle=f"""
    WITH t AS (
      SELECT source, lang, text,
             {_TOKS_SQL} AS toks,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ), q AS (
      SELECT source, lang,
             ROUND(
               0.5 * (len(list_filter(toks, t -> list_contains({_SW_SQL}, t))) / CAST(len(toks) AS DOUBLE))
               + 0.4 * least(len(toks) / 64.0, 1.0)
               + 0.1 * (1.0 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / CAST(length(text) AS DOUBLE)),
             6) AS quality,
             len(toks) AS n_tokens,
             COUNT(*) OVER (PARTITION BY fp) AS fp_cnt,
             COUNT(*) OVER (
               PARTITION BY md5(array_to_string(toks[1:8], ' '))
             ) AS pfx_cnt
      FROM t
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN fp_cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           FLOOR((CAST(SUM(CASE WHEN fp_cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                  / COUNT(*)) * 1e6) / 1e6 AS dup_rate,
           CAST(SUM(CASE WHEN pfx_cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler_docs,
           FLOOR(CAST(SUM(CAST(floor(quality * 1e6) AS BIGINT)) AS DOUBLE)
                 / COUNT(*)) / 1e6 AS mean_quality,
           FLOOR((CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*)) * 1e6) / 1e6
             AS mean_tokens,
           COUNT(DISTINCT lang) AS n_langs
    FROM q
    GROUP BY source
    ORDER BY source
    """,
)
def source_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health rollup: document count, exact-duplicate
    share (docs whose content fingerprint appears ≥2 times corpus-wide),
    mean quality, mean token count, and language spread — the dashboard a
    curation pipeline uses to decide which feeds to keep, throttle, or
    re-crawl (source-level triage is the step above the per-document
    gates in plans/curation.py).

    Alongside exact-dup share, ``n_boiler_docs`` counts docs sharing an
    8-token PREFIX fingerprint with another doc — the boilerplate/template
    indicator (crawled feeds prepend the same header to distinct bodies,
    which exact fingerprints never catch).

    Plan: one shuffle per fingerprint window (hash keys only — the text
    stays in the scan stage), then a rollup on source; all aggregations
    are partial+final. Determinism: dup flags and token counts are exact
    integers; the quality double is computed identically in both engines,
    floor-quantized to integer micro-units BEFORE the sum so the
    per-source mean is exact integer math followed by single IEEE
    divisions."""
    from pyspark.sql import Window

    from high_volume_market_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    pfx_fp = F.md5(
        F.encode(F.array_join(F.slice(tokens(t), 1, 8), " "), "UTF-8")
    )
    base = docs.select(
        "source",
        "lang",
        fingerprint(t).alias("fp"),
        pfx_fp.alias("pfx"),
        quality_score(t).alias("quality"),
        token_count(t).alias("n_tokens"),
    )
    q = base.withColumn(
        "fp_cnt", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    ).withColumn(
        "pfx_cnt", F.count(F.lit(1)).over(Window.partitionBy("pfx"))
    )
    dup = (F.col("fp_cnt") >= 2).cast("int")
    boiler = (F.col("pfx_cnt") >= 2).cast("int")
    n = F.count(F.lit(1))
    return (
        q.groupBy("source")
        .agg(
            n.alias("n_docs"),
            F.sum(dup).alias("n_dup_docs"),
            (F.floor((F.sum(dup).cast("double") / n) * F.lit(1e6)) / F.lit(1e6)).alias("dup_rate"),
            F.sum(boiler).alias("n_boiler_docs"),
            (
                F.floor(
                    F.sum(F.floor(F.col("quality") * F.lit(1e6)).cast("bigint")).cast("double") / n
                )
                / F.lit(1e6)
            ).alias("mean_quality"),
            (F.floor((F.sum("n_tokens").cast("double") / n) * F.lit(1e6)) / F.lit(1e6)).alias("mean_tokens"),
            F.count_distinct(F.col("lang")).alias("n_langs"),
        )
        .orderBy("source")
    )


@query(
    "lang_confusion_matrix",
    oracle=f"""
    WITH t AS (
      SELECT lang, text, {_TOKS_SQL} AS toks FROM documents
    ), h AS (
      SELECT lang, text, toks, {_lang_hits_sql()} FROM t
    )
    SELECT lang AS labeled_lang,
           {_lang_case_sql()} AS detected_lang,
           COUNT(*) AS n_docs
    FROM h
    GROUP BY 1, 2
    ORDER BY labeled_lang, detected_lang
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the corpus
    labels — the classifier-evaluation rollup every model-backed curation
    stage needs at scale (precision/recall per class read straight off
    the matrix). Pure map-side classification + one count aggregation;
    exact integer cells."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            lang_id(F.col("text")).alias("detected_lang"),
        )
        .groupBy("labeled_lang", "detected_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("labeled_lang", "detected_lang")
    )
