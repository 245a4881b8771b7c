"""Large-scale deduplication operators for training-data pipelines.

Five families (driver north-star mandate; no reference counterpart — the
reference's only dedup is the exact-key window W1,
bronze_to_silver_crypto.py:76-83):

- exact:      hash-groupBy on a content fingerprint (md5 of normalized text)
- minhash:    MinHash signatures + LSH banding → candidate pairs at O(n·k)
              instead of O(n²)
- ngram:      exact n-gram Jaccard verification of candidate pairs
- simhash:    32-bit SimHash content signatures (hamming-space near-dup)
- embedding:  cosine near-dup over embedding vectors

All are built from JVM-side array/hash builtins (transform/filter/aggregate,
md5) — no Python in the hot path — and every deterministic step has an exact
DuckDB SQL twin for the oracle (md5 is bit-identical across engines).
"""

from high_volume_market_data_pipeline_spark.dedup.exact import exact_dedup
from high_volume_market_data_pipeline_spark.dedup.incremental import SignatureStore
from high_volume_market_data_pipeline_spark.dedup.minhash import (
    lsh_candidate_pairs,
    minhash_signature,
)
from high_volume_market_data_pipeline_spark.dedup.ngram import ngram_jaccard
from high_volume_market_data_pipeline_spark.dedup.simhash import simhash32
from high_volume_market_data_pipeline_spark.dedup.embedding import (
    embedding_near_dup_pairs,
)

__all__ = [
    "SignatureStore",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "lsh_candidate_pairs",
    "minhash_signature",
    "ngram_jaccard",
    "simhash32",
]
