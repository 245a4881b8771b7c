"""Persist / reload ANN indexes through the versioned table store.

The build functions in ``similarity.knn`` return in-session indexes: the
driver-side model arrays (centroids / codebooks) live in the NamedTuple
and the coded corpus table is a localCheckpoint — both die with the
SparkSession. The 100 TB contract is FAISS's: train/encode ONCE, search
from any number of later sessions. This module writes each index as two
(or three) ``VersionedParquetTable``s under one root —

    {root}/model   — the driver-side arrays flattened to rows
                     (cell, centroid) and/or (subspace, code, vec)
    {root}/coded   — the full coded corpus table, unchanged schema

— so an index update is a new VERSION (history/time-travel/vacuum apply
verbatim: a nightly re-encode commits atomically while readers keep the
old version), and ``load_*_index`` rebuilds the exact NamedTuple in a
fresh session. Model tables are a few thousand rows (n_cells + m·k) —
collect is metadata-scale by construction; the coded table is never
collected, it is read as parquet like any corpus.

No reference counterpart (beyond-reference ANN surface); the versioned
commit machinery is sinks/history.py's Delta-emulation layer.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from high_volume_market_data_pipeline_spark.similarity.knn import (
    IVFIndex,
    IVFPQIndex,
    PQIndex,
)
from high_volume_market_data_pipeline_spark.sinks.history import (
    ConcurrentCommitError,
    VersionedParquetTable,
)


def _save_model_arrays(
    spark: SparkSession,
    root: str,
    operation: str,
    parameters: dict,
    centroids: "np.ndarray | None" = None,
    codebooks: "np.ndarray | None" = None,
    version: int | None = None,
) -> int:
    """One model table holds both array kinds, discriminated by ``part``:
    centroid rows are (part='centroid', i=cell, j=0, vec), codebook rows
    are (part='codebook', i=subspace, j=code, vec)."""
    rows = []
    if centroids is not None:
        rows += [
            ("centroid", int(i), 0, [float(x) for x in centroids[i]])
            for i in range(len(centroids))
        ]
    if codebooks is not None:
        m, n_codes, _ = codebooks.shape
        rows += [
            ("codebook", j, c, [float(x) for x in codebooks[j, c]])
            for j in range(m)
            for c in range(n_codes)
        ]
    df = spark.createDataFrame(
        rows, "part string, i int, j int, vec array<double>"
    )
    return VersionedParquetTable(os.path.join(root, "model")).write(
        df, operation, parameters, version=version
    )


def _load_model_arrays(
    spark: SparkSession, root: str, version: int | None = None
) -> tuple["np.ndarray | None", "np.ndarray | None"]:
    """Model arrays are metadata-scale BY CONTRACT (n_cells + m·k rows —
    see module docstring), so read them on the DRIVER with pyarrow
    straight from the manifest's data dirs instead of running a Spark
    read + collect job: the append path calls this once per micro-batch,
    and the Spark job it replaces was pure orchestration overhead (~0.3 s
    per append locally; a scheduler round-trip per batch on a cluster —
    guide §1.2, remove work outright). Byte-identical result: the same
    parquet files the Spark scan would read, no filter, no projection
    beyond the four columns."""
    import pyarrow.parquet as pq

    t = VersionedParquetTable(os.path.join(root, "model"))
    m = t._resolve(version, None)
    rows: list[dict] = []
    for d in t._data_dirs(m):
        for dirpath, _, files in os.walk(d):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    rows.extend(
                        pq.read_table(
                            os.path.join(dirpath, f),
                            columns=["part", "i", "j", "vec"],
                        ).to_pylist()
                    )
    cent_rows = sorted(
        ((r["i"], r["vec"]) for r in rows if r["part"] == "centroid")
    )
    cb_rows = sorted(
        ((r["i"], r["j"], r["vec"]) for r in rows if r["part"] == "codebook")
    )
    centroids = (
        np.asarray([v for _, v in cent_rows], dtype=np.float64)
        if cent_rows
        else None
    )
    codebooks = None
    if cb_rows:
        m = cb_rows[-1][0] + 1
        n_codes = cb_rows[-1][1] + 1
        dsub = len(cb_rows[0][2])
        codebooks = np.empty((m, n_codes, dsub), dtype=np.float64)
        for i, j, v in cb_rows:
            codebooks[i, j] = v
    return centroids, codebooks


def _save_coded(
    index_coded,
    root: str,
    operation: str,
    parameters: dict | None = None,
    version: int | None = None,
    partition_by: str | None = None,
) -> int:
    return VersionedParquetTable(os.path.join(root, "coded")).write(
        index_coded,
        operation,
        parameters or {},
        version=version,
        partition_by=partition_by,
    )


def _load_coded(spark: SparkSession, root: str, version: int | None = None):
    """The coded corpus at ``version`` MINUS tombstoned ids (see
    ``delete_from_index``): every loader/search and the append-side
    ``skip_existing_ids`` anti-join observe deletions through this one
    choke point, so a deleted id can neither surface as a neighbor nor
    block its own re-insertion."""
    coded = VersionedParquetTable(os.path.join(root, "coded")).read(
        spark, version=version
    )
    dead = _active_tombstones(spark, root)
    if dead is not None:
        coded = coded.join(dead, "neighbor_id", "left_anti")
    return coded


def _tombstone_table(root: str) -> VersionedParquetTable:
    return VersionedParquetTable(os.path.join(root, "tombstones"))


def _active_tombstones(spark: SparkSession, root: str):
    """Currently-deleted ids as a (neighbor_id) DataFrame, or None when
    the index has never seen a delete OR every delete has been purged
    (the head manifest records ``n_tombstones``, so the empty case — a
    long-lived index after purge_deleted — is a metadata probe, not a
    read + anti-join on every search forever)."""
    t = _tombstone_table(root)
    if not t.exists():
        return None
    head = t._resolve(None, None)
    if head.get("parameters", {}).get("n_tombstones") == 0:
        return None
    return t.read(spark)


_TOMBSTONE_RETRIES = 5


def _tombstone_head_count(spark: SparkSession, t: VersionedParquetTable):
    """(head_version, active-tombstone count) — the count from the head
    manifest's ``n_tombstones`` when recorded (metadata-only), else a
    read (tombstone tables are deleted-id-sized by contract)."""
    head = t._resolve(None, None)
    n = head.get("parameters", {}).get("n_tombstones")
    if n is None:
        n = t.read(spark).count()
    return head["version"], int(n)


def delete_from_index(spark: SparkSession, root: str, ids) -> int:
    """FAISS ``remove_ids`` for the persisted index, tombstone-style: the
    ids land in a small versioned ``{root}/tombstones`` table and every
    load/search anti-joins them out (``_load_coded``), so a delete is
    O(deleted ids) — never a rewrite of a 100M-vector corpus. The rows
    stay physically present until ``purge_deleted`` (compaction-time
    filter, matching the chain-absorption design); re-appending a
    tombstoned id clears its tombstone (``_commit_append``).

    ``ids``: a DataFrame whose FIRST column is the id, or an iterable of
    ints. Returns the committed tombstone-table version.

    Re-insertion: a tombstoned id whose rows are still physical is
    treated as EXISTING by skip_existing_ids appends (appending it is a
    no-op and it stays deleted) — run ``purge_deleted`` first to make it
    re-insertable; a tombstone naming an id with NO physical rows clears
    automatically when that id commits.

    Scope note: tombstones are a property of the INDEX HEAD — a reader
    pinned to an old coded version still sees current deletions, and a
    purge resets the table, so version-pinned time travel across a purge
    can resurrect; FAISS offers no time travel at all, and the versioned
    store here exists for atomic updates, not deletion history."""
    from pyspark.sql import functions as F

    if isinstance(ids, DataFrame):
        dead = ids.select(
            F.col(ids.columns[0]).cast("long").alias("neighbor_id")
        ).distinct()
    else:
        dead = spark.createDataFrame(
            [(int(i),) for i in ids], "neighbor_id long"
        ).distinct()
    t = _tombstone_table(root)
    # CAS-pinned read-modify-append: every tombstone mutation (delete /
    # revive / purge-reset) derives from an explicit head version and
    # commits at head+1, so a racer — an append's _clear_tombstones_for
    # rewriting the set concurrently — raises ConcurrentCommitError here
    # instead of being silently overwritten by a version recomputed
    # after its commit (the lost-delete race).
    for _ in range(_TOMBSTONE_RETRIES):
        if not t.exists():
            n = dead.count()
            try:
                return t.write(
                    dead, "DELETE_IDS", {"n_tombstones": n}, version=0
                )
            except ConcurrentCommitError:
                continue
        head_v, head_n = _tombstone_head_count(spark, t)
        # id-dedup against the current set: repeated deletes idempotent
        fresh = dead.join(
            t.read(spark, version=head_v), "neighbor_id", "left_anti"
        )
        try:
            return t.append(
                fresh,
                "DELETE_IDS",
                {"n_tombstones": head_n + fresh.count()},
                version=head_v + 1,
                parent_version=head_v,
                max_chain=_CODED_MAX_CHAIN,
            )
        except ConcurrentCommitError:
            continue
    raise ConcurrentCommitError(
        f"delete_from_index at {root} lost {_TOMBSTONE_RETRIES} "
        "consecutive tombstone commit races"
    )


def purge_deleted(spark: SparkSession, root: str) -> int | None:
    """Physically drop tombstoned rows: commit coded-minus-tombstones as
    a new full snapshot (hive layout preserved), re-pair the model at the
    same version, and reset the tombstone table to an empty snapshot with
    ``n_tombstones: 0`` recorded — ``_active_tombstones`` short-circuits
    on that manifest parameter, so searches after a purge pay a metadata
    probe, not a read + anti-join against an empty table. Returns the new
    paired version, or None if the index has no active tombstones. Like a
    re-train, a purge must not run concurrently with appenders (it is a
    maintenance-window operation; the same quiescing contract as
    save_*_index) — the append path's auto-purge honors that by running
    purge post-commit and treating a lost commit race as "skip, retry at
    a later append" (see ``_maybe_auto_purge``)."""
    t = _tombstone_table(root)
    if not t.exists():
        return None
    tomb_v, tomb_n = _tombstone_head_count(spark, t)
    if tomb_n == 0:
        return None
    dead = t.read(spark, version=tomb_v)
    model_v, coded_head, target = _append_coords(root)
    coded_t = VersionedParquetTable(os.path.join(root, "coded"))
    head_m = coded_t._resolve(coded_head, None)
    kept = coded_t.read(spark, version=coded_head).join(
        dead, "neighbor_id", "left_anti"
    )
    coded_t.write(
        kept,
        "PURGE_DELETED",
        {"purged_from": coded_head},
        partition_by=head_m.get("partition_by"),
        version=target,
    )
    # Model arrays are unchanged by a purge: re-pair with a manifest-only
    # commit referencing the paired version's files (pre-r12 this was a
    # collect + re-write round trip of identical content).
    VersionedParquetTable(os.path.join(root, "model")).commit_ref(
        "PURGE_DELETED", {}, version=target, parent_version=model_v
    )
    # Reset the tombstone table. The purged coded snapshot is ALREADY
    # committed above, so losing this CAS to a concurrent
    # delete_from_index must not leave the purged ids counted (an
    # inflated n_tombstones would re-fire auto-purge's O(corpus) rewrite
    # on every later append until a reset finally landed): re-derive the
    # reset against the NEW tombstone head as (new head ids minus the
    # just-purged set) — the racer's fresh deletes survive, the purged
    # ids retire — and retry the CAS.
    remaining = dead.limit(0)
    reset_n = 0
    reset_v = tomb_v + 1
    for _ in range(_TOMBSTONE_RETRIES):
        try:
            t.write(
                remaining,
                "PURGE_RESET",
                {"n_tombstones": reset_n},
                version=reset_v,
            )
            return target
        except ConcurrentCommitError:
            head_v, _ = _tombstone_head_count(spark, t)
            remaining = t.read(spark, version=head_v).join(
                dead, "neighbor_id", "left_anti"
            )
            reset_n = remaining.count()
            reset_v = head_v + 1
    raise ConcurrentCommitError(
        f"purge_deleted at {root}: the purged coded snapshot committed "
        f"at version {target} but the tombstone reset lost "
        f"{_TOMBSTONE_RETRIES} consecutive commit races; re-run "
        "purge_deleted (or any append) to retire the stale tombstones"
    )


# Auto-purge threshold: when active tombstones exceed this fraction of
# the physical coded corpus, the append path triggers purge_deleted
# post-commit (the ledger-auto-compaction template: maintenance amortized
# into the write path so a long-lived index never pays the search-time
# anti-join forever, and purge cost stays O(corpus) at a bounded
# dead-fraction). The check is METADATA-ONLY: tombstone count from the
# tombstone head manifest, corpus size from the coded head manifest's
# ``n_rows`` (recorded from parquet footers at commit time) — no Spark
# scan on the hot append path; only legacy pre-n_rows manifests fall
# back to a count().
_AUTO_PURGE_TOMBSTONE_FRACTION = 0.1


def _coded_head_rows(
    spark: SparkSession, root: str, coded_head: int
) -> int:
    """Physical row count of the coded corpus at ``coded_head`` — from
    the manifest's ``n_rows`` (metadata probe) when recorded, else one
    count() for tables written before n_rows existed (their next commit
    through write()/fold records it and retires the fallback)."""
    return VersionedParquetTable(os.path.join(root, "coded")).row_count(
        spark, version=coded_head
    )


def _maybe_auto_purge(spark: SparkSession, root: str) -> "int | None":
    """Run ``purge_deleted`` when the active-tombstone fraction crosses
    ``_AUTO_PURGE_TOMBSTONE_FRACTION``. Called from the append commit
    path AFTER the append landed, so the purge races only the NEXT
    commit: a lost CAS means another appender advanced the index first —
    skip, and the threshold fires again on a later append."""
    t = _tombstone_table(root)
    if not t.exists():
        return None
    _, n_dead = _tombstone_head_count(spark, t)
    if n_dead == 0:
        return None
    _, coded_head, _ = _append_coords(root)
    n_corpus = _coded_head_rows(spark, root, coded_head)
    if n_dead < _AUTO_PURGE_TOMBSTONE_FRACTION * max(n_corpus, 1):
        return None
    try:
        return purge_deleted(spark, root)
    except ConcurrentCommitError:
        return None  # a rival commit owns the next version; retry later


def _pin_version(root: str, version: int | None) -> int | None:
    """Resolve the version BOTH tables are loaded at. An explicit version
    passes through (missing pieces raise, as they should). ``None`` pins
    to the NEWEST VERSION PRESENT IN BOTH TABLES: the two commits in
    save_*/append_* are not one transaction, so a crash or lost commit
    race between them can leave the tables diverged — and a head-of-each
    load would then pair NEW model arrays with the OLD coded table (for
    a rebuild, codes decoded against the wrong codebooks: silently wrong
    neighbors, not an error). The set intersection, not min(heads),
    because crash sequences can leave HOLES: a crashed re-train (model
    head = N+1) followed by an append that died between its coded and
    model commits leaves coded versions {…, N, N+2} — min(heads) = N+1
    names a coded version that never existed and every head load would
    raise until the next successful append."""
    if version is not None:
        return version
    mv = set(VersionedParquetTable(os.path.join(root, "model")).versions())
    cv = set(VersionedParquetTable(os.path.join(root, "coded")).versions())
    if not mv or not cv:
        return None  # let the table read raise its own not-found error
    paired = mv & cv
    if not paired:
        # both tables exist but share no version — loading head-of-each
        # would pair codes with the wrong model, silently
        raise FileNotFoundError(
            f"no paired (model, coded) version at {root}: "
            f"model has {sorted(mv)}, coded has {sorted(cv)}"
        )
    return max(paired)


def _clear_tombstones_for(spark: SparkSession, root: str, delta) -> None:
    """Ids that actually COMMITTED in ``delta`` must not stay hidden by a
    stale tombstone (a tombstone can name an id with no physical rows —
    deleted-then-purged, or never present). With skip_existing_ids the
    delta already excludes tombstoned-but-still-physical ids, so this
    never resurrects an old row next to a new one. No-op (one metadata
    probe) when the index has never seen a delete; when it has, one
    semi-join decides whether a rewrite is needed — tombstone tables are
    deleted-id-sized, appends micro-batch-sized. The rewrite is
    CAS-pinned to the snapshot it was derived from: a concurrent
    delete_from_index landing first forces a re-derive here, so its ids
    can never be dropped by a stale filtered set committed after it."""
    t = _tombstone_table(root)
    if not t.exists():
        return
    ids = delta.select("neighbor_id").distinct()
    for _ in range(_TOMBSTONE_RETRIES):
        head_v, _ = _tombstone_head_count(spark, t)
        cur = t.read(spark, version=head_v)
        if cur.join(ids, "neighbor_id", "left_semi").limit(1).count() == 0:
            return
        kept = cur.join(ids, "neighbor_id", "left_anti")
        try:
            t.write(
                kept,
                "REVIVE_IDS",
                {"n_tombstones": kept.count()},
                version=head_v + 1,
            )
            return
        except ConcurrentCommitError:
            continue
    raise ConcurrentCommitError(
        f"tombstone revive at {root} lost {_TOMBSTONE_RETRIES} "
        "consecutive commit races"
    )


_APPEND_RETRIES = 5

# Bound on the coded table's append-chain length before a commit absorbs
# the chain into one snapshot (log-structured compaction): continuous
# streaming ingest must not make every later search open an unbounded
# number of tiny delta dirs. MEASURED default (BENCH_CHAIN_r08, sf1-tier
# table, coalesced one-file deltas): head-read cost is linear in chain
# length at ~0.07 s/dir — each delta dir is its own scan stage in the
# read union — so chain 64 costs ~5 s per read vs ~1.4 s at 16 against a
# 0.14 s compact snapshot. 16 keeps the read penalty ~10x under the
# chain-64 default while amortized absorb cost stays ≤ ~8 rewritten rows
# per appended row at the 2k-batch / 200k-corpus tier; searches outnumber
# appends in a vector store, so the trade favors readers.
_CODED_MAX_CHAIN = 16


def _append_coords(root: str) -> tuple[int, int, int]:
    """(model_load_version, coded_head, cas_target) for one append attempt.

    The merge base for an append is the CODED HEAD — never the paired
    version a reader would pin to — because the coded chain is what two
    appenders race on: deriving from anything older silently drops the
    other writer's rows at commit time (the classic lost update). Model
    arrays load at the newest PAIRED version — max(model ∩ coded), the
    exact resolution ``_pin_version`` uses — NOT min(heads): a crashed
    re-train (orphan model at N+1) followed by a crashed append (coded
    {…, N, N+2}) makes min(heads) = N+1 select the orphan model, and an
    append would then encode its delta with codebooks never paired with
    the existing coded chain AND re-commit them as the paired model —
    every pre-existing code would decode against the wrong codebooks
    from then on, silently. The CAS target sits past BOTH heads so a
    crashed re-train's orphan model version can never collide with an
    append's pairing commit."""
    mv = set(VersionedParquetTable(os.path.join(root, "model")).versions())
    cv = set(VersionedParquetTable(os.path.join(root, "coded")).versions())
    if not mv or not cv:
        raise FileNotFoundError(f"no persisted index at {root}")
    paired = mv & cv
    if not paired:
        raise FileNotFoundError(
            f"no paired (model, coded) version at {root}: "
            f"model has {sorted(mv)}, coded has {sorted(cv)}"
        )
    return max(paired), max(cv), max(max(mv), max(cv)) + 1


_DELTA_FILES = 4


def _append_coded(
    delta, root: str, operation: str, parameters: dict, version: int,
    parent_version: int, partition_by: str | None = None,
) -> int:
    """CAS-commit ONLY the delta rows on top of ``parent_version`` — the
    manifest references the parent's files plus one new delta dir, so a
    2k-vector micro-batch append against a 100M-vector index writes 2k
    rows, never the corpus (measured flat per-batch in BENCH_ANN_TIER).

    The delta is coalesced to ``_DELTA_FILES`` partitions first: an
    append is micro-batch-scale by contract (bulk loads go through the
    save_* full snapshots, which keep natural parallelism), but a
    parallelism-width write turns a 500-row delta into 32 files and every
    LATER READ of the chain pays scan-task fan-out per delta dir —
    BENCH_CHAIN_r08 measures the one-file curve at ~4x less per-dir read
    cost than the 32-file curve. A handful of files (not one) keeps the
    encode pipeline parallel-ish and bounds single-file hotspots."""
    return VersionedParquetTable(os.path.join(root, "coded")).append(
        delta.coalesce(_DELTA_FILES), operation, parameters, version=version,
        parent_version=parent_version, max_chain=_CODED_MAX_CHAIN,
        partition_by=partition_by,
    )


def _commit_append(
    spark: SparkSession,
    root: str,
    operation: str,
    derive,
    partition_by: str | None = None,
):
    """Optimistic-concurrency append (the Delta commit-loop shape):

    1. read (model arrays at the paired version, coded table at its head)
    2. ``derive(centroids, codebooks, coded) -> (delta_df, params)`` —
       the NEW coded rows only, already anti-joined against ``coded``
    3. CAS-append the delta at max(heads)+1 — an explicit version, so a
       racer that landed first raises ConcurrentCommitError here; the
       commit writes O(delta) bytes (parent files are referenced, not
       rewritten)
    4. re-commit the unchanged model at the same number (pairing)

    A lost CAS re-reads the new head and re-derives; the id anti-join
    in every derive makes the retry converge (already-appended ids drop
    out). Appends therefore serialize against appends; a concurrent
    RE-TRAIN (save_*_index) still requires quiescing appenders — that is
    the FAISS offline-retrain contract and is documented on each append.
    Commit order is coded-then-model: between the two commits readers'
    ``_pin_version`` min() resolves to the old paired snapshot, so no
    reader ever pairs new codes with absent model rows."""
    for _ in range(_APPEND_RETRIES):
        model_v, coded_head, target = _append_coords(root)
        centroids, codebooks = _load_model_arrays(spark, root, model_v)
        # the RAW coded table (tombstoned rows included): the
        # skip_existing_ids anti-join must treat a tombstoned-but-still-
        # physical id as EXISTING, or re-appending it would commit a
        # second physical row for the same id (revive below then makes
        # both visible — a duplicate). A deleted id becomes re-insertable
        # after purge_deleted removes its rows.
        coded = VersionedParquetTable(os.path.join(root, "coded")).read(
            spark, version=coded_head
        )
        delta, params = derive(centroids, codebooks, coded)
        params = {**params, "parent_version": coded_head}
        from high_volume_market_data_pipeline_spark.functions.plandump import (
            dump_plan,
        )

        dump_plan(delta, f"index_append_delta_{operation.lower()}")
        try:
            _append_coded(
                delta, root, operation, params, version=target,
                parent_version=coded_head, partition_by=partition_by,
            )
        except ConcurrentCommitError:
            continue  # another appender won this version; re-derive on head
        # Pairing commit: the model content is UNCHANGED on an append (the
        # whole point of train/add separation), so re-pair via a
        # manifest-only commit referencing the paired version's files.
        # Pre-r12 this re-ran createDataFrame + a full parquet write of
        # the identical arrays — one pure-overhead Spark job per
        # micro-batch on the streaming-ingest hot path (guide §1.2).
        VersionedParquetTable(os.path.join(root, "model")).commit_ref(
            operation, params, version=target, parent_version=model_v
        )
        _clear_tombstones_for(spark, root, delta)
        _maybe_auto_purge(spark, root)
        return target
    raise ConcurrentCommitError(
        f"append at {root} lost {_APPEND_RETRIES} consecutive commit "
        "races; contention is too high for optimistic retry"
    )


# -- public save/load per family -------------------------------------------


def save_ivf_index(index: IVFIndex, root: str) -> int:
    """Returns the committed coded-table version. The inverted lists are
    written PARTITIONED BY cell — the disk layout the whole IVF family
    argument rests on: a search probes n_probe cells, and with cells as
    hive partitions the probe equi-join prunes unprobed partitions at
    the scan (the "cells map to prunable storage units" regime where
    growing n_cells actually pays — see ivf_knn's sizing rule; pruning
    pinned in tests/test_index_store.py)."""
    spark = index.coded.sparkSession
    _save_model_arrays(
        spark,
        root,
        "IVF_MODEL",
        {"n_cells": len(index.centroids)},
        centroids=index.centroids,
    )
    return _save_coded(index.coded, root, "IVF_CODED", partition_by="cell")


def load_ivf_index(
    spark: SparkSession, root: str, version: int | None = None
) -> IVFIndex:
    version = _pin_version(root, version)
    centroids, _ = _load_model_arrays(spark, root, version)
    # partitioned reads surface the partition column LAST — restore the
    # build-side column order so loaded and live indexes are one schema
    coded = _load_coded(spark, root, version).select(
        "neighbor_id", "cv", "cell"
    )
    return IVFIndex(centroids, coded)


def save_pq_index(index: PQIndex, root: str) -> int:
    spark = index.coded.sparkSession
    m, n_codes, _ = index.codebooks.shape
    _save_model_arrays(
        spark,
        root,
        "PQ_MODEL",
        {"m_subspaces": m, "n_codes": n_codes},
        codebooks=index.codebooks,
    )
    return _save_coded(index.coded, root, "PQ_CODED")


def load_pq_index(
    spark: SparkSession, root: str, version: int | None = None
) -> PQIndex:
    version = _pin_version(root, version)
    _, codebooks = _load_model_arrays(spark, root, version)
    return PQIndex(codebooks, _load_coded(spark, root, version))


def save_ivf_pq_index(index: IVFPQIndex, root: str) -> int:
    spark = index.coded.sparkSession
    m, n_codes, _ = index.codebooks.shape
    _save_model_arrays(
        spark,
        root,
        "IVF_PQ_MODEL",
        {
            "n_cells": len(index.centroids),
            "m_subspaces": m,
            "n_codes": n_codes,
        },
        centroids=index.centroids,
        codebooks=index.codebooks,
    )
    return _save_coded(
        index.coded, root, "IVF_PQ_CODED", partition_by="cell"
    )


def load_ivf_pq_index(
    spark: SparkSession, root: str, version: int | None = None
) -> IVFPQIndex:
    version = _pin_version(root, version)
    centroids, codebooks = _load_model_arrays(spark, root, version)
    coded = _load_coded(spark, root, version).select(
        "neighbor_id", "cell", "pq_codes"
    )
    return IVFPQIndex(centroids, codebooks, coded)


def _with_cell(df, centroids: "np.ndarray", vec_col: str, id_col: str):
    """(id, cv, _nv, cell) for new vectors: L2-normalize, assign each to
    its nearest stored centroid (same euclidean-on-unit-vectors rule the
    k-means fit and the query-side probe use). One Arrow batch matmul;
    the centroid matrix rides the task closure — model-scale, like the
    codebooks."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from high_volume_market_data_pipeline_spark.functions.vectors import (
        as_double,
    )
    from high_volume_market_data_pipeline_spark.similarity.knn import (
        _normalize_rows,
    )

    c2 = (centroids**2).sum(axis=1)

    @pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        X = _normalize_rows(np.asarray(vs.tolist(), dtype=np.float64))
        # argmin ‖x−c‖² = argmin ‖c‖² − 2x·c (‖x‖² is a per-row constant)
        d = c2[None, :] - 2.0 * (X @ centroids.T)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    unit = pandas_udf(
        lambda vs: pd.Series(
            list(_normalize_rows(np.asarray(vs.tolist(), dtype=np.float64)))
        ),
        "array<double>",
    )
    base = df.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    )
    return base.select(
        "neighbor_id",
        "cv",
        unit(F.col("cv")).alias("_nv"),
        _assign(F.col("cv")).alias("cell"),
    )


def append_to_ivf_index(
    spark: SparkSession,
    root: str,
    new_vectors,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    skip_existing_ids: bool = True,
) -> int:
    """FAISS ``add()`` for the IVF index: assign new vectors to their
    nearest STORED centroid (no re-fit) and commit the grown inverted
    lists as a new paired (model, coded) version. Same replay contract
    as append_to_pq_index. Cell balance degrades only if the data
    distribution drifts; re-train offline via build_ivf_index + save."""
    def derive(centroids, codebooks, coded):
        new_rows = _with_cell(new_vectors, centroids, vec_col, id_col).select(
            "neighbor_id", "cv", "cell"
        )
        if skip_existing_ids:
            new_rows = new_rows.join(
                coded.select("neighbor_id"), "neighbor_id", "left_anti"
            )
        return new_rows, {"n_cells": len(centroids)}

    return _commit_append(spark, root, "IVF_APPEND", derive, partition_by="cell")


def append_to_ivf_pq_index(
    spark: SparkSession,
    root: str,
    new_vectors,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    skip_existing_ids: bool = True,
) -> int:
    """FAISS ``add()`` for IVF-PQ: assign to the nearest stored centroid,
    PQ-encode the CELL RESIDUAL with the stored codebooks (the exact
    encode rule build_ivf_pq_index applies), commit as a new paired
    version."""
    from pyspark.sql import functions as F

    from high_volume_market_data_pipeline_spark.similarity.knn import (
        pq_encode,
    )

    def derive(centroids, codebooks, coded):
        assigned = _with_cell(new_vectors, centroids, vec_col, id_col)
        cent_df = spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(centroids)],
            "cell int, centroid array<double>",
        )
        resid = assigned.join(F.broadcast(cent_df), "cell").select(
            "neighbor_id",
            "cell",
            F.zip_with("_nv", "centroid", lambda x, y: x - y).alias("resid"),
        )
        new_coded = pq_encode(
            resid, codebooks, vec_col="resid", normalize=False
        ).select("neighbor_id", "cell", "pq_codes")
        if skip_existing_ids:
            new_coded = new_coded.join(
                coded.select("neighbor_id"), "neighbor_id", "left_anti"
            )
        m, n_codes, _ = codebooks.shape
        return new_coded, {
            "n_cells": len(centroids),
            "m_subspaces": m,
            "n_codes": n_codes,
        }

    return _commit_append(
        spark, root, "IVF_PQ_APPEND", derive, partition_by="cell"
    )


def append_to_pq_index(
    spark: SparkSession,
    root: str,
    new_vectors,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    skip_existing_ids: bool = True,
) -> int:
    """FAISS ``add()``: encode NEW vectors with the STORED codebooks (no
    refit — the whole point of train/add separation) and CAS-commit the
    union as a new paired (model, coded) version via ``_commit_append``.
    Readers pinned to an old version are untouched; codebook CONTENT
    never changes on append (same codebooks ⇒ appended codes are
    comparable to existing ones by construction). Concurrent appenders
    serialize — a lost commit race re-derives from the winner's head, so
    no appender's rows are ever dropped; a concurrent RE-TRAIN
    (``save_pq_index``) still requires quiescing appenders first.

    ``skip_existing_ids`` drops arrivals whose id is already coded (one
    id-only anti-join — at-least-once ingest converges instead of
    double-coding, and it is also what makes a commit-race retry
    idempotent). Quantization error drifts only if the corpus
    distribution drifts from the training sample; a periodic full
    ``build_pq_index`` + save is the re-train, committed as just another
    version. Returns the new coded-table version."""
    from high_volume_market_data_pipeline_spark.functions.vectors import (
        as_double,
    )
    from high_volume_market_data_pipeline_spark.similarity.knn import (
        pq_encode,
    )
    from pyspark.sql import functions as F

    def derive(centroids, codebooks, coded):
        new_coded = pq_encode(
            new_vectors.select(
                F.col(id_col).alias("neighbor_id"),
                as_double(F.col(vec_col)).alias("cv"),
            ),
            codebooks,
            vec_col="cv",
        ).select("neighbor_id", "pq_codes")
        if skip_existing_ids:
            new_coded = new_coded.join(
                coded.select("neighbor_id"), "neighbor_id", "left_anti"
            )
        m, n_codes, _ = codebooks.shape
        return new_coded, {
            "m_subspaces": m,
            "n_codes": n_codes,
        }

    return _commit_append(spark, root, "PQ_APPEND", derive)
