"""Column-expression function library (JVM-side, codegen-friendly).

Everything here returns pyspark Columns built from builtins — no Python UDFs
in the hot path (SURVEY.md §2.11: the reference's native-first rule, kept).
"""

from high_volume_market_data_pipeline_spark.functions.expr import bind_once
from high_volume_market_data_pipeline_spark.functions.text import (
    fingerprint,
    lang_id,
    normalize_text,
    quality_score,
    token_count,
)
from high_volume_market_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot,
    norm,
)

__all__ = [
    "bind_once",
    "cosine_similarity",
    "dot",
    "fingerprint",
    "lang_id",
    "norm",
    "normalize_text",
    "quality_score",
    "token_count",
]
