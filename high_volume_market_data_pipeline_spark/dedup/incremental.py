"""Incremental near-dup: dedup NEW batches against a persisted signature
store — the production shape of corpus dedup.

`lsh_candidate_pairs` (dedup/minhash.py) is the right tool the FIRST time
a corpus is deduped; but a living corpus ingests daily increments, and
recomputing shingles+signatures for 100 TB of already-admitted text per
batch is the canonical accidental-quadratic of data pipelines. The fix is
the same one every production dedup service uses: signatures are computed
ONCE per document and persisted banded (id, sig, band_key); an increment

1. computes signatures only for the NEW batch,
2. resolves within-batch near-dups (standard banded pair path, keep min
   id), then
3. equi-joins the survivors' band keys against the STORE (the store side
   never recomputes text — it is keys + k-component signatures only, a
   few hundred bytes per document regardless of document size), and
4. appends the admitted documents' signatures back to the store.

At scale the store is written partitioned by a band_key prefix so the
increment join prunes to matching partitions; the text of the historical
corpus is never read again. Determinism: signatures are md5-derived
(engine-exact), keep-decisions are min-id, and admission is a pure
function of (store state, batch) — re-running an increment admits the
same set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.dedup.minhash import (
    DEFAULT_BANDS,
    DEFAULT_K,
    DEFAULT_SHINGLE,
    band_keys_column,
    lsh_candidate_pairs,
    minhash_signature,
)


class SignatureStore:
    """Persisted banded MinHash signatures: (doc_id, sig, band_key), one
    row per (doc, band). ``bootstrap`` seeds it from an initial corpus;
    ``dedup_increment`` admits a new batch against it."""

    # Scope the per-increment STORE passes (degenerate-bucket guard, probe,
    # replay-hygiene id set) to the batch's keys only once the store is at
    # least this many physical rows. Below it, a full-store pass is cheaper
    # than building the batch-key broadcast the scoping needs (the guard
    # agg on a 1k-row store costs less than one broadcast-build job); above
    # it, the unscoped guard is an O(store) aggregation shuffle on EVERY
    # micro-batch — the accidental per-batch full pass this module exists
    # to avoid. The threshold compares store size against the fixed cost
    # of one broadcast build, so it is scale-adaptive, not tuned to local
    # core count; the probe itself reads it from parquet footers (driver
    # metadata, no job).
    scope_store_min_rows = 200_000

    def __init__(
        self,
        path: str,
        k: int = DEFAULT_K,
        bands: int = DEFAULT_BANDS,
        shingle: int = DEFAULT_SHINGLE,
    ):
        if k % bands != 0:
            raise ValueError("k must be divisible by bands")
        self.path = path
        self.k = k
        self.bands = bands
        self.shingle = shingle

    def _physical_rows(self) -> int:
        """Store row count from parquet FOOTERS (driver metadata reads, no
        Spark job) — feeds the scope-vs-full decision per increment."""
        import pyarrow.parquet as pq

        total = 0
        for dirpath, _, files in os.walk(self.path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(dirpath, f)
                    ).metadata.num_rows
        return total

    def _banded_signatures(
        self, docs: DataFrame, text_col: str, id_col: str
    ) -> DataFrame:
        sig = minhash_signature(docs, text_col, id_col, self.k, self.shingle)
        return sig.select(
            F.col(id_col).alias("doc_id"),
            "sig",
            F.explode(band_keys_column(self.k, self.bands)).alias("band_key"),
        )

    def exists(self, spark: SparkSession) -> bool:
        from pyspark.errors import AnalysisException

        try:
            spark.read.parquet(self.path).limit(1).collect()
            return True
        except AnalysisException:
            # path-not-found / empty-dir: the store genuinely isn't there.
            # Anything else (IO, permissions, executor loss) must PROPAGATE:
            # returning False tells callers to bootstrap(), and bootstrap
            # overwrites — a transient error must never be converted into
            # an instruction to destroy the corpus signature history.
            return False

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def bootstrap(
        self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> None:
        """Seed the store from an initial (already-deduped) corpus. The
        one full-corpus signature computation ever run."""
        self._banded_signatures(docs, text_col, id_col).write.mode(
            "overwrite"
        ).parquet(self.path)

    def dedup_increment(
        self,
        new_docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.5,
        max_bucket: int = 1000,
        skip_existing_ids: bool = False,
    ) -> tuple[DataFrame, DataFrame]:
        """Admit a new batch: returns ``(admitted, rejected)`` where
        ``admitted`` is the subset of ``new_docs`` that near-duplicates
        neither the store nor a smaller-id doc of the same batch (the
        same deterministic pair-loser rule as exact_dedup: a doc is kept
        iff it has no near-dup partner with a smaller id — for transitive
        cluster semantics, run dedup/clustering on the batch first), and
        ``rejected`` is (doc_id, matched_id, est_jaccard, reason) for the
        rest. Admitted signatures are appended to the store as a side
        effect.

        Cost model: signature compute is batch-sized; the store join is a
        band-key equi-join shipping (key, sig) only — historical TEXT is
        never re-read, which is the whole point at 100 TB.

        ``skip_existing_ids=True`` makes the increment REPLAYABLE (the
        streaming path's at-least-once contract): a doc whose id is
        already in the store never matches ITSELF (self-pairs are always
        excluded), its signatures are not appended twice, and because
        store-probe and within-batch estimates share the same signature
        arithmetic, a replayed batch admits exactly the set the first
        run admitted. Costs one (doc_id)-projection anti-join against
        the store per batch — skip it for the pure-batch path where ids
        are disjoint by construction."""
        spark = new_docs.sparkSession
        caches: list[DataFrame] = []
        try:
            return self._dedup_increment(
                spark, new_docs, text_col, id_col, threshold, max_bucket,
                caches, skip_existing_ids,
            )
        finally:
            # Every output is localCheckpoint-pinned before we get here, so
            # dropping the pair-stage caches cannot trigger recompute; a
            # long-lived ingest driver calling this per batch must not
            # accumulate cached blocks without bound.
            for c in caches:
                c.unpersist()

    def _dedup_increment(
        self,
        spark: SparkSession,
        new_docs: DataFrame,
        text_col: str,
        id_col: str,
        threshold: float,
        max_bucket: int,
        caches: list[DataFrame],
        skip_existing_ids: bool = False,
    ) -> tuple[DataFrame, DataFrame]:
        from pyspark import StorageLevel

        from high_volume_market_data_pipeline_spark.operators.layout import (
            ensure_parallelism,
        )

        # The batch signatures feed THREE consumers (the within-batch pair
        # path, the store probe, and the admitted-signature append), so
        # compute them ONCE here and hand them to lsh_candidate_pairs
        # explicitly — re-deriving from text per consumer would triple the
        # most expensive step (~3 s each at the 10× tier).
        batch_sig = minhash_signature(
            ensure_parallelism(new_docs), text_col, id_col, self.k,
            self.shingle,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(batch_sig)

        # 1. within-batch near-dups: a doc is a loser iff it near-dups any
        # smaller-id batch doc. The report keeps ONE row per loser (the
        # admission contract is one decision row per incoming doc): same
        # deterministic best-match rule as the store path — max est_jaccard,
        # then min matched_id. Without this a doc near-duping two smaller-id
        # partners emitted two rejected rows.
        batch_pairs = lsh_candidate_pairs(
            new_docs, text_col, id_col, self.k, self.bands, self.shingle,
            max_bucket, cache_registry=caches, signatures=batch_sig,
        ).filter(F.col("est_jaccard") >= threshold)
        wb = Window.partitionBy("doc_id").orderBy(
            F.col("est_jaccard").desc(), F.col("matched_id")
        )
        batch_loser = (
            batch_pairs.select(
                F.col("id_b").alias("doc_id"),
                F.col("id_a").alias("matched_id"),
                "est_jaccard",
                F.lit("within_batch").alias("reason"),
            )
            .withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            # Pin now: the loser report is tiny, the pair join it embeds is
            # not — checkpointing here materializes the pair stage exactly
            # once and frees the caller's `rejected` from the pair caches.
            .localCheckpoint(eager=True)
        )
        # Materialization barrier: survivors feeds THREE consumers (the
        # store probe, the final anti-join, and the signature append), and
        # without a barrier Spark recomputes the anti-join per consumer;
        # mixed partitionings can also trip whole-stage codegen's
        # zipPartitions on local mode. localCheckpoint doubles as the cache
        # (no persist ⇒ nothing to leak) — see the recache-by-path note
        # below for why persist() would be wrong anyway.
        survivors = new_docs.join(
            batch_loser.select("doc_id").withColumnRenamed("doc_id", id_col),
            id_col,
            "left_anti",
        ).localCheckpoint(eager=True)

        # 2. store probe: band-key equi-join, est_jaccard from signatures.
        # The probe reuses the batch_sig computed above (explicit handoff —
        # never fished back out of the unpersist registry by schema).
        surv_sig = batch_sig.join(
            survivors.select(id_col), id_col, "leftsemi"
        )
        new_banded = surv_sig.select(
            F.col(id_col).alias("doc_id"),
            "sig",
            F.explode(band_keys_column(self.k, self.bands)).alias("band_key"),
        )
        store = self.read(spark)
        # Scope the store-side passes to the BATCH'S band keys once the
        # store is big enough for those passes to matter
        # (scope_store_min_rows; decided from parquet footers — no job).
        # Pre-r12 the degenerate-bucket guard below ALWAYS aggregated the
        # WHOLE store — an O(corpus) groupBy shuffle on every micro-batch
        # of a continuous-ingest stream, the accidental per-batch full
        # pass this module's own docstring warns about (guide §2.3:
        # aggregate/shuffle only the bytes the decision needs). A
        # broadcast semi-join on the batch's (micro-batch-sized) key set
        # keeps every store row of those keys, so per-key bucket counts —
        # and therefore the candidate set and replay convergence — are
        # byte-identical in both branches (pinned by
        # tests/test_dedup_similarity.py::test_scoped_store_probe_equivalence).
        scope_store = self._physical_rows() >= self.scope_store_min_rows
        if scope_store:
            batch_keys = new_banded.select("band_key").distinct()
            probe_base = store.join(
                F.broadcast(batch_keys), "band_key", "leftsemi"
            )
        else:
            probe_base = store
        # SYMMETRIC degenerate-bucket guard: the within-batch path drops
        # buckets over max_bucket before pair expansion; the store probe
        # must apply the SAME cap. Without it (a) a boilerplate band key
        # whose store bucket only GROWS over batches eventually recreates
        # the junk-pair blowup the within-batch guard exists for, and
        # (b) replay convergence breaks: docs admitted on the first run
        # because their oversized bucket was dropped within-batch would
        # match each other THROUGH THE STORE on replay and flip to
        # rejected.
        oversized = (
            probe_base.groupBy("band_key")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("band_key")
        )
        # the guard applies to the PROBE only — the replay-hygiene id
        # anti-join below must still see every stored id, or a doc whose
        # band keys are all oversized would re-append on replay
        probe_store = probe_base.join(oversized, "band_key", "left_anti")
        cand = new_banded.alias("n").join(probe_store.alias("s"), "band_key")
        if skip_existing_ids:
            # replay-safe mode: a replayed doc's own signatures are in the
            # store; matching itself (est 1.0) would flip an admitted doc
            # to rejected on replay. In the batch mode the self-match IS
            # the dup signal for a re-sent id, so the filter is gated.
            cand = cand.filter(F.col("n.doc_id") != F.col("s.doc_id"))
        cand = cand.select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("s.doc_id").alias("matched_id"),
            F.col("n.sig").alias("sig_n"),
            F.col("s.sig").alias("sig_s"),
        ).dropDuplicates(["doc_id", "matched_id"])
        eq = F.size(
            F.filter(
                F.zip_with(F.col("sig_n"), F.col("sig_s"), lambda x, y: x == y),
                lambda v: v,
            )
        )
        scored = cand.select(
            "doc_id",
            "matched_id",
            F.round(eq / F.lit(float(self.k)), 6).alias("est_jaccard"),
        ).filter(F.col("est_jaccard") >= threshold)
        from high_volume_market_data_pipeline_spark.functions.plandump import (
            dump_plan,
        )

        dump_plan(scored, "incremental_store_probe")
        # deterministic report row: best match (max jaccard, min id) wins
        w = Window.partitionBy("doc_id").orderBy(
            F.col("est_jaccard").desc(), F.col("matched_id")
        )
        store_loser = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "doc_id",
                "matched_id",
                "est_jaccard",
                F.lit("vs_store").alias("reason"),
            )
        )
        # Pin BOTH outputs before the store append: their plans read the
        # store parquet lazily, and appending first would make every just-
        # admitted doc "match" its own fresh signature on re-evaluation.
        # persist() is NOT enough — Spark's CacheManager recaches-by-path
        # when a write lands on a path a cached plan reads, so the "cached"
        # pre-append view silently recomputes against the grown store.
        # localCheckpoint truncates lineage to materialized partitions,
        # which no path refresh can touch.
        store_loser = store_loser.localCheckpoint(eager=True)
        admitted = survivors.join(
            store_loser.select("doc_id").withColumnRenamed("doc_id", id_col),
            id_col,
            "left_anti",
        ).localCheckpoint(eager=True)

        # 3. append admitted signatures (reusing the cached batch
        # signatures — admitted ⊆ survivors ⊆ batch; the write must
        # complete before the finally-block unpersists the cache)
        to_append = new_banded.join(
            admitted.select(F.col(id_col).alias("doc_id")), "doc_id",
            "leftsemi",
        )
        if skip_existing_ids:
            # replay hygiene: ids already in the store keep their original
            # rows (appending again would double them). Pin BEFORE the
            # write — the anti-join plan reads the store path the write
            # lands on. The anti-join never needed unique blocker rows, so
            # the pre-r12 full-store dropDuplicates (an O(corpus) id
            # shuffle per micro-batch) is dropped in both branches; on a
            # big store the blocker set is additionally scoped to
            # (store ids ∩ admitted ids) via a broadcast semi-join —
            # to_append's ids ⊆ admitted, so the intersection blocks
            # exactly the same rows while the store is scanned once,
            # id-column-pruned and broadcast-filtered.
            blockers = store.select("doc_id")
            if scope_store:
                blockers = blockers.join(
                    F.broadcast(
                        admitted.select(F.col(id_col).alias("doc_id"))
                    ),
                    "doc_id",
                    "leftsemi",
                )
            to_append = to_append.join(blockers, "doc_id", "left_anti")
            dump_plan(to_append, "incremental_append_hygiene")
            to_append = to_append.localCheckpoint(eager=True)
        to_append.write.mode("append").parquet(self.path)
        rejected = batch_loser.unionByName(store_loser)
        return admitted, rejected
