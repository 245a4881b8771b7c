"""Streaming vector-store ingestion: arriving embeddings are PQ-encoded
with the STORED codebooks and appended to the persisted index — the
continuous-ingest shape of a production vector store (train once,
add() forever, re-train offline when drift demands it).

foreachBatch bridges to ``index_store.append_to_pq_index`` exactly the
way streaming dedup bridges to the batch SignatureStore: per-batch cost
is the batch path's (one encode pass over the batch + one id anti-join
against the coded table), state is the versioned parquet index itself —
corpus-scale state survives restarts and is shared with batch readers,
and every append is an atomic versioned commit (a searcher pinned to
version N never sees a half-written batch).

Replay safety: ``skip_existing_ids`` makes a replayed batch a no-op at
the id level, so at-least-once delivery converges — the ledger-style
batch_id partitioning is unnecessary here because the id set IS the
dedup key. Concurrent appenders are safe: ``append_to_pq_index``
CAS-commits at an explicit version derived from the coded head, so an
interleaved writer loses the commit race LOUDLY and the retry
re-derives its union from the winner's head (no lost update — pinned
by the interleaved-append test in tests/test_index_store.py). Only a
concurrent RE-TRAIN (save_pq_index) requires quiescing this stream
first — the FAISS offline-retrain contract.

No reference counterpart (beyond-reference ANN surface); composes the
reference's checkpointed incremental-pull discipline
(src/ingestion/extract_crypto_data.py) with the PQ index lifecycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from high_volume_market_data_pipeline_spark.similarity.index_store import (
    append_to_pq_index,
    load_pq_index,
)


def stream_append_pq_index(
    sdf: DataFrame,
    index_root: str,
    checkpoint: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Append an embedding stream to the persisted PQ index at
    ``index_root``; returns the started query. The index must exist
    (``build_pq_index`` + ``save_pq_index`` first) — requiring an explicit
    trained index beats silently fitting codebooks on whatever batch
    arrives first, which would quantize the whole corpus against a
    non-representative sample."""
    spark = sdf.sparkSession
    # fail fast, not at first batch: loading validates both tables exist
    load_pq_index(spark, index_root)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        append_to_pq_index(
            spark,
            index_root,
            batch_df,
            vec_col=vec_col,
            id_col=id_col,
            skip_existing_ids=True,
        )

    trigger_kwargs = dict(trigger) if trigger else {"availableNow": True}
    return (
        sdf.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger_kwargs)
        .start()
    )
