"""S8 — table history + time travel, parquet-native.

Reference surface: ``view_delta_history.py:44-72`` (``DeltaTable.forPath(
...).history()`` → version/timestamp/operation DataFrame, newest first) and
the README's time-travel claims. ``delta-spark`` is not installable in this
environment, so the same observable API is provided over plain parquet with
a JSON manifest log — the layout Delta itself uses (data files + ordered
commit log), minus transactions we cannot express without a JVM extension:

    <root>/_log/<version>.json      one manifest per committed version
    <root>/_v<version>_<attempt>/   immutable parquet dir (unique per
                                    write attempt; manifests point at it)

A ``write`` manifest references ONE full-snapshot dir; an ``append``
manifest references its parent's dirs plus one new delta dir (the Delta
add-files shape), so appending a micro-batch to a 100 TB table writes
only the batch. Compaction (sinks/maintenance) folds an append chain
back into a single snapshot via ``write``.

Commit protocol: write the snapshot dir first, then CREATE the manifest via
a create-if-absent hard link of a temp file (os.link fails with EEXIST — a
rename would silently replace a concurrent winner's manifest). A crashed or
commit-losing writer leaves an orphan ``_v*`` dir (cleaned by ``vacuum``)
but can never corrupt the current version — readers only follow manifests,
and snapshot dirs are per-attempt so racers never overwrite each other's
data. This also makes MERGE/OPTIMIZE through the table crash-safe: the
previous snapshot is untouched until vacuum retires it.

At cluster scale the manifest write is a single small driver-side file per
commit (same as a Delta commit json); snapshots are whatever Spark wrote —
partitioned, distributed parquet.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
import warnings

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = "_log"
_MANIFEST_RE = re.compile(r"^(\d{8})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{8})\.checkpoint\.json$")
_LAST_CHECKPOINT = "_last_checkpoint"


class VacuumResult(NamedTuple):
    """vacuum() outcome. ``retired``: versions whose manifest was deleted
    (no longer time-travelable). ``removed_dirs``: snapshot dir names
    removed, including manifest-less orphans from losing commit attempts
    (their parsed version number can match a kept snapshot's, so they are
    NOT reported as retired versions)."""

    retired: list
    removed_dirs: list


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first (manifest already
    exists). The losing writer's snapshot dir is orphaned (vacuum cleans
    it); the table head is whatever the winner wrote. Callers that can
    re-derive their write from the new head should retry (see
    streaming/sketch_state.py — HLL merge is the canonical retryable
    case)."""


class TornCommitError(RuntimeError):
    """The version a CAS commit targeted is occupied by an UNPARSEABLE
    manifest older than the in-flight grace window — a crashed O_EXCL-
    fallback commit, not live contention. Retrying cannot succeed
    (readers skip the torn tail, so every retry re-derives the same
    target version and hits the same file); the table needs the torn
    manifest removed (``repair_torn_tail()``). Distinct from
    ConcurrentCommitError so retry loops fail fast with the real cause
    instead of burning their retries and blaming contention."""


class VersionedParquetTable:
    """Versioned snapshots of a parquet table with Delta-like history()."""

    # A consolidated checkpoint manifest is written every this-many commits
    # (Delta writes parquet checkpoints every 10 commits for the same
    # reason): without one, every read replays the WHOLE commit log —
    # O(total commits) driver-side file opens, the next bottleneck for a
    # continuous-ingest table that keeps thousands of manifests for time
    # travel. With it, a read opens ≤ pointer + checkpoint +
    # checkpoint_interval tail manifests, regardless of table age.
    checkpoint_interval = 10

    # Unreferenced _v* dirs younger than this are NOT vacuumed: data dirs
    # are written BEFORE their manifest commits, so a young orphan may be
    # an in-flight write whose manifest is about to land — deleting it
    # would poison the committed version (and, for append chains, every
    # descendant that inherits the dir). Delta VACUUM's retention-window
    # rule. Vacuum still must not be scheduled concurrently with writers
    # that can stall longer than this grace.
    orphan_grace_seconds = 3600.0

    # Fault-injection point for the stalled-writer race test: called (when
    # set) between the O_EXCL manifest create and its write+fsync — the
    # exact window a repair_torn_tail() racer can misclassify as a crashed
    # commit. Production value is always None.
    _test_stall_after_manifest_create = None

    # Second injection point: called (when set) between the write+fsync
    # and the post-fsync self-check stat — the window where a repair
    # racer has QUARANTINED a by-now-complete manifest but not yet
    # restored it. Production value is always None.
    _test_stall_after_manifest_write = None

    # How long the post-fsync self-check waits for a repair racer that
    # quarantined this writer's (complete) manifest to finish its
    # re-verify + restore before declaring the outcome ambiguous. Repair's
    # decision is a parse of a small JSON file plus one link/unlink, so
    # seconds of grace covers any plausible scheduling stall.
    repair_ack_grace_seconds = 5.0

    # An unparseable manifest OCCUPYING a CAS target is live contention
    # (O_EXCL makes the file visible before its one write lands) only for
    # about as long as a write+fsync takes; older than this it is a
    # crashed commit that will never finish, and retrying is futile.
    # A writer stalled longer than this between its O_EXCL create and the
    # write+fsync can have its in-flight manifest classified as dead —
    # repair then unlinks it and a rival may reuse the version. The
    # stalled writer is PROTECTED by the post-fsync self-check in
    # _commit_manifest (it re-stats its manifest path and raises
    # ConcurrentCommitError instead of acknowledging a commit that was
    # unlinked mid-write), so the worst case is a spurious retry, never a
    # silently lost commit. The default is still sized well above any
    # plausible single-small-file write stall (GC pause, NFS hiccup) so
    # repair rarely fires against a live writer at all.
    torn_grace_seconds = 300.0

    def __init__(self, root: str) -> None:
        self.root = root
        self.log_dir = os.path.join(root, _LOG)
        # observability for tests/benches: log files opened by the most
        # recent _manifests() call (the checkpointing contract is that
        # this stays bounded by a constant as the table ages)
        self.last_log_files_opened = 0

    # -- log plumbing -------------------------------------------------------

    def _read_last_checkpoint(self) -> dict | None:
        """The checkpoint the ``_last_checkpoint`` pointer names (with its
        file name injected as ``_name``), or None. Any failure (missing /
        torn pointer or checkpoint — both are rename-published, so torn
        means external damage) falls back to a full log replay: the
        checkpoint is a CACHE of the manifest log, never the source of
        truth."""
        ptr = os.path.join(self.log_dir, _LAST_CHECKPOINT)
        try:
            with open(ptr) as fh:
                name = json.load(fh)["checkpoint"]
            with open(os.path.join(self.log_dir, name)) as fh:
                cp = json.load(fh)
            cp["_name"] = name
            self.last_log_files_opened += 2
            return cp
        except (OSError, ValueError, KeyError):
            return None

    def _tail_manifests(self, floor: int) -> list[dict]:
        """Parse the loose manifest files with version > ``floor``,
        ascending. A torn TRAILING manifest is a crashed commit on a
        filesystem without hard links (the O_EXCL fallback makes the file
        visible before its single write lands) — treated as never
        committed so one torn commit cannot brick every later read of the
        table. A torn manifest in the MIDDLE of the log means real
        corruption: fail loudly."""
        names = sorted(
            f
            for f in os.listdir(self.log_dir)
            if _MANIFEST_RE.match(f) and int(f[:8]) > floor
        )
        out: list[dict] = []
        for i, f in enumerate(names):
            try:
                with open(os.path.join(self.log_dir, f)) as fh:
                    out.append(json.load(fh))
                self.last_log_files_opened += 1
            except (json.JSONDecodeError, ValueError) as exc:
                if i == len(names) - 1:
                    continue
                raise RuntimeError(
                    f"corrupt non-trailing manifest {f} at {self.root}; "
                    "the commit log is damaged beyond a torn tail"
                ) from exc
        return out

    def _chunks(self):
        """Yield the log as (floor, manifests-ascending) chunks, NEWEST
        FIRST: the loose tail above the latest checkpoint, then each
        checkpoint chunk down the parent chain. Auto-checkpoints are
        INCREMENTAL (they embed only the manifests above their parent's
        floor plus a pointer to it — Delta-style full-state checkpoints
        measured O(commits²/interval) cumulative write volume on a
        continuously-ingesting table), so head reads stop after the first
        chunk while history/time-travel walk as deep as they need. Any
        damage in the chain (missing parent, cycle, garbage) falls back
        to replaying every loose manifest file — checkpoints are caches;
        the manifest files stay the source of truth."""
        self.last_log_files_opened = 0
        if not os.path.isdir(self.log_dir):
            return
        try:
            cp = self._read_last_checkpoint()
            floor = cp["version"] if cp else -1
            yield floor, self._tail_manifests(floor)
            seen_floors = set()
            while cp is not None:
                pfloor = cp.get("floor", -1)
                if pfloor in seen_floors or pfloor >= cp["version"]:
                    raise ValueError("checkpoint chain cycle")
                seen_floors.add(pfloor)
                yield pfloor, list(cp["manifests"])
                parent = cp.get("parent")
                if parent is None:
                    return
                with open(os.path.join(self.log_dir, parent)) as fh:
                    cp = json.load(fh)
                cp["_name"] = parent
                self.last_log_files_opened += 1
        except RuntimeError:
            raise  # non-trailing corruption: a replay would hit it too
        except (OSError, ValueError, KeyError):
            yield -1, self._tail_manifests(-1)

    def _manifests(self) -> list[dict]:
        by_version: dict[int, dict] = {}
        for _, chunk in self._chunks():
            for m in chunk:
                by_version.setdefault(m["version"], m)
        return [by_version[v] for v in sorted(by_version)]

    def checkpoint(self) -> str | None:
        """FOLD the whole manifest log into ONE full checkpoint and
        repoint ``_last_checkpoint`` at it (Delta's checkpoint-parquet +
        ``_last_checkpoint`` pattern, as JSON), deleting the superseded
        chain. Head reads then open pointer + checkpoint + loose tail
        only. Safe to call anytime; vacuum() calls it over the kept
        manifests so retired versions never resurrect. Auto-checkpoints
        (every ``checkpoint_interval`` commits) are INCREMENTAL instead —
        see ``_maybe_checkpoint`` — so a continuously-ingesting table's
        cumulative checkpoint write volume stays O(commits), not
        O(commits²/interval); an explicit fold is the way to collapse a
        long chain when full-history scans (``history()``/``versions()``)
        matter more than fold cost. Returns the checkpoint file name, or
        None on an empty log. Both files publish via tmp + atomic rename —
        a checkpoint is never contended for correctness (racers write
        supersets of the same log; the pointer's last writer wins, and a
        stale or orphaned chain only costs extra reads — any damage falls
        back to full manifest replay, never wrong results)."""
        return self._write_checkpoint(self._manifests())

    def _write_checkpoint(
        self,
        ms: list[dict],
        parent: str | None = None,
        floor: int = -1,
    ) -> str | None:
        """Publish ``ms`` as a checkpoint. With ``parent`` set the file is
        an incremental link (covers only versions in (floor, head]); bare
        it is a full fold and every other checkpoint file is a superseded
        cache, reclaimed here."""
        if not ms:
            return None
        head = ms[-1]["version"]
        name = f"{head:08d}.checkpoint.json"
        body = {"version": head, "manifests": ms}
        if parent is not None:
            body["parent"] = parent
            body["floor"] = floor
        cp_tmp = os.path.join(self.log_dir, f".cptmp_{uuid.uuid4().hex[:8]}")
        with open(cp_tmp, "w") as fh:
            json.dump(body, fh)
        os.replace(cp_tmp, os.path.join(self.log_dir, name))
        ptr_tmp = os.path.join(self.log_dir, f".ptmp_{uuid.uuid4().hex[:8]}")
        with open(ptr_tmp, "w") as fh:
            json.dump({"checkpoint": name}, fh)
        os.replace(ptr_tmp, os.path.join(self.log_dir, _LAST_CHECKPOINT))
        if parent is None:
            # a full fold supersedes the whole chain — reclaim it now
            for f in os.listdir(self.log_dir):
                m = _CHECKPOINT_RE.match(f)
                if m and f != name:
                    try:
                        os.unlink(os.path.join(self.log_dir, f))
                    except OSError:
                        pass
        return name

    def _head(self) -> dict | None:
        for _, chunk in self._chunks():
            if chunk:
                return chunk[-1]
        return None

    def latest_version(self) -> int | None:
        """Head version. Opens pointer + latest checkpoint + loose tail
        only — O(checkpoint_interval) bytes regardless of table age (the
        chunk walk stops at the first non-empty chunk)."""
        head = self._head()
        return head["version"] if head else None

    def versions(self) -> list[int]:
        """Every committed version number, ascending."""
        return [m["version"] for m in self._manifests()]

    def exists(self) -> bool:
        """M5 — table existence probe (DeltaTable.isDeltaTable analogue)."""
        return self.latest_version() is not None

    # -- write path ---------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        operation: str = "WRITE",
        parameters: dict | None = None,
        partition_by: str | None = None,
        version: int | None = None,
    ) -> int:
        """Commit ``df`` as the next version; returns the version number.

        An explicit ``version`` turns the commit into a compare-and-swap:
        the create-if-absent manifest gate raises ConcurrentCommitError
        when that version already exists, so a caller that derived its
        write from version N can commit at N+1 and KNOW no other commit
        landed in between (the optimistic-concurrency pattern Delta uses;
        see similarity/index_store append_*)."""
        if version is None:
            version = (self.latest_version() or 0) + 1 if self.exists() else 0
        # The snapshot dir carries a per-attempt suffix: two writers racing
        # for the same version must not overwrite each other's DATA either —
        # the commit-losing attempt leaves an orphan dir (vacuum reclaims
        # it), never clobbers the winner's snapshot. Readers follow the
        # manifest's data_dir, so the name is free to be unique.
        data_dir = os.path.join(
            self.root, f"_v{version:08d}_{uuid.uuid4().hex[:8]}"
        )
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(data_dir)

        manifest = {
            "version": version,
            "timestamp": time.time(),
            "operation": operation,
            "parameters": parameters or {},
            "data_dir": data_dir,
            # physical row count, summed from the just-written parquet
            # footers (metadata-only): lets maintenance decisions (ANN
            # auto-purge fraction, chain-absorb sizing) read the corpus
            # size from the manifest instead of a count() scan
            "n_rows": self._dir_num_rows(data_dir),
            # recorded so layout-preserving rewrites (compact/restore)
            # can reproduce the snapshot's hive partitioning instead of
            # silently flattening it
            "partition_by": partition_by,
            # the version's logical schema (Delta's metaData action):
            # append() validates evolution against THIS instead of
            # re-inferring parquet schemas across the whole chain —
            # measured 2× on the streaming-ingest appends
            "schema": df.schema.jsonValue(),
        }
        self._commit_manifest(manifest, version)
        return version

    def append(
        self,
        df: DataFrame,
        operation: str = "APPEND",
        parameters: dict | None = None,
        partition_by: str | None = None,
        version: int | None = None,
        parent_version: int | None = None,
        max_chain: int | None = None,
        merge_schema: bool = False,
    ) -> int:
        """Commit ``df`` as NEW FILES ONLY on top of an existing version —
        the Delta append shape: the manifest lists the parent's data dirs
        plus one fresh delta dir, so commit cost is O(appended rows), not
        O(table). A full ``write`` stays the compaction/overwrite path
        (``sinks.maintenance.compact`` folds a long append chain back to
        one snapshot). Readers of any version are untouched; time travel
        and vacuum apply unchanged (vacuum keys on every dir a kept
        manifest references, so a shared parent dir survives until no
        kept version needs it).

        ``version`` makes the commit a CAS exactly like ``write``;
        ``parent_version`` pins which committed version the delta extends
        (default: the current head) — pass it together with ``version``
        when the caller must KNOW no other append slipped in between
        (see similarity/index_store._commit_append).

        ``max_chain`` bounds read fan-in for continuous ingest: when the
        parent already references that many dirs, THIS commit absorbs
        chain + delta into one full snapshot instead (same version
        number, same CAS) — log-structured compaction, so a stream of
        10,000 micro-batches costs O(batch) per commit amortized and a
        reader never opens more than ``max_chain`` dirs.

        ``merge_schema=False`` (default) REJECTS a delta whose column set
        differs from the parent's — Delta's posture: silent schema drift
        is usually a bug (a misspelled column would otherwise become a
        new all-null column forever). ``merge_schema=True`` is the
        ``mergeSchema`` analogue: the delta may ADD columns (old rows
        read back null there) or OMIT columns (delta rows read back
        null); a column present on both sides must keep its exact type —
        reads union the chain by name with missing columns allowed, and
        a type conflict would poison every later read of the table."""
        from pyspark.sql.types import StructType

        parent = self._resolve(parent_version, None)
        if version is None:
            version = (self.latest_version() or 0) + 1
        parent_dirs = self._data_dirs(parent)
        spark = df.sparkSession
        # Evolution check against the parent's RECORDED schema (Delta's
        # metaData action) — metadata-only; falling back to parquet
        # schema inference over the chain (pre-schema manifests) was
        # measured 2× on streaming-ingest appends.
        if parent.get("schema") is not None:
            pschema = StructType.fromJson(parent["schema"])
        else:
            pschema = self.read(spark, version=parent["version"]).schema
        pnames = {f.name for f in pschema}
        if {f.name for f in df.schema} != pnames and not merge_schema:
            raise ValueError(
                f"append schema {sorted(df.columns)} does not match "
                f"table schema {sorted(pnames)} at "
                f"{self.root}; pass merge_schema=True to evolve "
                "(added columns read back null on old rows)"
            )
        common = {f.name: f.dataType for f in pschema}
        # The hive partition column is exempt from the type check: its
        # on-disk form is only a dir-name string, so a legacy
        # inference-derived parent schema (or a compact/restore of one)
        # can carry an int where the writer used long.
        part_col = partition_by or parent.get("partition_by")
        for f in df.schema:
            if (
                f.name in common
                and f.name != part_col
                and f.dataType != common[f.name]
            ):
                raise ValueError(
                    f"append column '{f.name}' has type "
                    f"{f.dataType.simpleString()} but the table has "
                    f"{common[f.name].simpleString()} at {self.root}; "
                    "schema evolution never retypes a column (cast the "
                    "delta, or rewrite the table via write())"
                )
        merged_schema = StructType(
            list(pschema.fields)
            + [f for f in df.schema.fields if f.name not in pnames]
        )
        delta_dir = os.path.join(
            self.root, f"_v{version:08d}_{uuid.uuid4().hex[:8]}"
        )
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(delta_dir)
        # An EMPTY partitioned write creates no partition dirs and no
        # part files (only _SUCCESS) — referencing it would make every
        # later read fail schema inference on that dir. An empty delta
        # (e.g. a fully-deduped replay) commits as a manifest pointing at
        # the parent's files only; the version still advances.
        has_files = any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(delta_dir)
            for f in fs
        )
        parameters = dict(parameters or {})
        if max_chain is not None and len(parent_dirs) >= max_chain:
            # Absorb the PARENT CHAIN into one folded snapshot dir while
            # the fresh delta keeps ITS OWN dir: the manifest then
            # references [folded, delta] and fresh_dirs names exactly the
            # new rows, so the table_stream source can emit the delta and
            # skip the rewrite instead of (pre-r10) silently dropping a
            # fold commit's new rows under skip_change_commits. read()
            # unions the chain ONE SCAN PER DIR — a single multi-root
            # read crashes with CONFLICTING_DIRECTORY_STRUCTURES when the
            # dirs are hive-partitioned (the cell-partitioned index
            # tables are exactly that) — so the fold costs one parent
            # read + write, same as the old merged rewrite, and later
            # reads open ≤ 2 dirs.
            folded_dir = os.path.join(
                self.root, f"_v{version:08d}_{uuid.uuid4().hex[:8]}"
            )
            fw = self.read(spark, version=parent["version"]).write.mode(
                "overwrite"
            )
            if partition_by:
                fw = fw.partitionBy(partition_by)
            fw.parquet(folded_dir)
            parameters["absorbed_chain"] = len(parent_dirs)
            data_dirs = [folded_dir] + ([delta_dir] if has_files else [])
            # the fold rewrote the whole corpus, so its footers ARE the
            # authoritative parent count — no dependence on the parent
            # manifest having recorded one
            n_rows = self._dir_num_rows(folded_dir) + (
                self._dir_num_rows(delta_dir) if has_files else 0
            )
        else:
            data_dirs = parent_dirs + ([delta_dir] if has_files else [])
            # parent count + delta footers; a legacy parent without
            # n_rows leaves it unrecorded (readers fall back to count())
            # rather than paying an O(chain-files) footer walk here
            n_rows = (
                parent["n_rows"]
                + (self._dir_num_rows(delta_dir) if has_files else 0)
                if parent.get("n_rows") is not None
                else None
            )
        manifest = {
            "version": version,
            "timestamp": time.time(),
            "operation": operation,
            "parameters": parameters,
            "data_dirs": data_dirs,
            "n_rows": n_rows,
            # dirs holding rows NEW at this version (vs rewrites of data
            # older versions already reference) — the streaming source's
            # exactly-once signal; [] on an empty delta
            "fresh_dirs": [delta_dir] if has_files else [],
            "partition_by": partition_by,
            # an empty delta contributes no files, so its columns must
            # not enter the recorded schema either (they would exist in
            # no data dir: phantom columns that later appends would
            # validate against)
            "schema": (
                merged_schema if has_files else pschema
            ).jsonValue(),
        }
        self._commit_manifest(manifest, version)
        return version

    def commit_ref(
        self,
        operation: str,
        parameters: dict | None = None,
        version: int | None = None,
        parent_version: int | None = None,
    ) -> int:
        """Commit a new version whose DATA is byte-identical to
        ``parent_version`` — a manifest-only commit referencing the
        parent's data dirs (zero rows written, no Spark job). The CAS
        semantics of ``version`` match ``write``/``append``.

        This is the Delta-style metadata commit for lifecycle steps that
        advance a version number without changing table content — e.g.
        the ANN store's model re-pair on every coded append (the model
        arrays are unchanged by construction; pre-r12 each append re-ran
        createDataFrame + a parquet write of the identical model, one
        full Spark job per micro-batch on the streaming-ingest hot path —
        guide §1.2: remove work outright before tuning it). Readers of
        the new version get exactly the parent's files; ``fresh_dirs`` is
        empty so the table_stream source correctly sees no new rows;
        vacuum already reference-counts shared dirs across manifests."""
        parent = self._resolve(parent_version, None)
        if version is None:
            version = (self.latest_version() or 0) + 1
        manifest = {
            "version": version,
            "timestamp": time.time(),
            "operation": operation,
            "parameters": parameters or {},
            "data_dirs": self._data_dirs(parent),
            "n_rows": parent.get("n_rows"),
            "fresh_dirs": [],
            "partition_by": parent.get("partition_by"),
            "schema": parent.get("schema"),
        }
        self._commit_manifest(manifest, version)
        return version

    def row_count(self, spark: SparkSession, version: int | None = None) -> int:
        """Physical row count of the snapshot at ``version`` from the
        manifest's ``n_rows`` (summed from parquet footers at commit
        time — a metadata probe, no Spark job, no data scan); falls back
        to one ``read().count()`` only for legacy manifests written
        before ``n_rows`` existed. Equal to ``read(version).count()`` by
        construction: both count exactly the files the manifest
        references."""
        m = self._resolve(version, None)
        n = m.get("n_rows")
        if n is None:
            return self.read(spark, version=m["version"]).count()
        return int(n)

    def verify_row_counts(self) -> list[dict]:
        """Maintenance fsck for the ``n_rows`` trust chain (r13): since
        r12 the declared ingest queries read per-version cardinalities
        from the manifest's ``n_rows`` instead of counting data, so a
        manifest written by a buggy or hand-edited writer would silently
        change a declared output. This recomputes every kept version's
        physical row count from the parquet FOOTERS of the dirs the
        manifest references (metadata-only, no Spark job) and returns one
        dict per MISMATCH ({version, recorded, actual}) — empty means the
        chain is sound. Legacy manifests without ``n_rows`` are skipped
        (readers fall back to count() there anyway)."""
        bad = []
        for m in self._manifests():
            n = m.get("n_rows")
            if n is None:
                continue
            actual = sum(
                self._dir_num_rows(d) for d in self._data_dirs(m)
            )
            if int(n) != actual:
                bad.append(
                    {
                        "version": int(m["version"]),
                        "recorded": int(n),
                        "actual": actual,
                    }
                )
        return bad

    @staticmethod
    def _data_dirs(manifest: dict) -> list[str]:
        """Every data dir a manifest references: append commits carry
        ``data_dirs`` (parent chain + delta), full snapshots ``data_dir``."""
        return list(manifest.get("data_dirs") or [manifest["data_dir"]])

    @staticmethod
    def _dir_num_rows(path: str) -> int:
        """Row count of every parquet file under ``path``, summed from the
        FOOTERS (pyarrow metadata reads — no data scan, no Spark job).
        Feeds the manifest's ``n_rows``: O(files-just-written) metadata
        I/O per commit, so maintenance code (e.g. the ANN store's
        auto-purge fraction check) can size decisions against the table
        without a count() scan on the hot path."""
        import pyarrow.parquet as pq

        total = 0
        for dirpath, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(dirpath, f)
                    ).metadata.num_rows
        return total

    def _raise_occupied(self, final: str, version: int) -> None:
        """The CAS target is occupied. Distinguish a real winner (or a
        racer still mid-write — O_EXCL makes its file visible before the
        single write lands) from a CRASHED commit's torn manifest: readers
        skip a torn tail, so the next retry re-derives the SAME version
        and hits the same file forever — without this check the retry
        loop burns out and blames contention when the table needs repair."""
        try:
            with open(final) as fh:
                json.load(fh)
        except FileNotFoundError:
            pass  # occupant vanished (repair raced us) — plain retry works
        except (json.JSONDecodeError, ValueError):
            try:
                age = time.time() - os.path.getmtime(final)
            except OSError:
                age = 0.0
            if age > self.torn_grace_seconds:
                raise TornCommitError(
                    f"version {version} at {self.root} is occupied by an "
                    f"unparseable manifest untouched for {age:.0f}s — a "
                    "crashed commit, not contention; remove it with "
                    "repair_torn_tail() and retry"
                ) from None
        raise ConcurrentCommitError(
            f"version {version} at {self.root} was committed by "
            "another writer; re-read the head and retry"
        )

    def repair_torn_tail(self) -> str | None:
        """Remove a torn TRAILING manifest (a crashed commit that readers
        already treat as never committed) so its version number frees up
        for writers. Refuses to touch a parseable manifest or anything
        younger than the in-flight grace window. Returns the removed file
        name, or None if there was nothing to repair.

        Mtime age is the only liveness signal available, so repair CAN
        race a writer stalled longer than ``torn_grace_seconds`` between
        creating its manifest and finishing the write. Two guards make
        that race a retry or a loud error, never silent loss: the
        writer's post-fsync self-check (see ``_commit_manifest``) refuses
        to acknowledge a commit whose manifest was unlinked mid-write,
        and repair itself QUARANTINES (renames) the file and re-verifies
        it before deleting — a write that completed between the first
        parse and the rename is restored in place. A self-check that
        finds its manifest quarantined WAITS for repair's decision
        (``_landed_after_repair``) and acknowledges a restored commit,
        so the writer can never NACK a commit repair then restores (the
        retry would land the same data at two versions). The only
        residue is a microsecond double-occupancy window (rival writer
        re-uses the version while the complete manifest sits
        quarantined), which raises TornCommitError rather than dropping
        either commit."""
        if not os.path.isdir(self.log_dir):
            return None
        names = sorted(
            f for f in os.listdir(self.log_dir) if _MANIFEST_RE.match(f)
        )
        if not names:
            return None
        tail = os.path.join(self.log_dir, names[-1])
        try:
            with open(tail) as fh:
                json.load(fh)
            return None
        except (OSError, ValueError):
            pass
        quarantine = f"{tail}.quarantine_{uuid.uuid4().hex[:8]}"
        try:
            if time.time() - os.path.getmtime(tail) <= self.torn_grace_seconds:
                return None  # could still be a live writer's in-flight file
            # rename, don't unlink: parse -> unlink is not atomic, and the
            # stalled writer's fsync (and self-check ack) can land in
            # between; the rename freezes the inode so it can be
            # re-verified and restored if the write actually completed
            os.rename(tail, quarantine)
        except OSError:
            return None
        try:
            with open(quarantine) as fh:
                json.load(fh)
        except (OSError, ValueError):
            # confirmed torn after the rename barrier: safe to drop
            try:
                os.unlink(quarantine)
            except OSError:
                pass
            return names[-1]
        # the manifest is COMPLETE — the writer finished (and may have
        # acknowledged) between the first parse and the rename. Restore
        # it under its committed name; link-not-rename so a rival that
        # already re-used the freed version number is never clobbered.
        try:
            os.link(quarantine, tail)
        except FileExistsError:
            raise TornCommitError(
                f"{names[-1]} at {self.root}: a complete manifest was "
                f"quarantined ({os.path.basename(quarantine)}) and its "
                "version was re-committed by another writer before it "
                "could be restored; resolve the duplicate manually"
            ) from None
        try:
            os.unlink(quarantine)
        except OSError:
            pass
        return None

    def _commit_manifest(self, manifest: dict, version: int) -> None:
        os.makedirs(self.log_dir, exist_ok=True)
        tmp = os.path.join(self.log_dir, f".tmp_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        # Version allocation is read-then-increment, so two concurrent
        # writers can both pick N+1. The commit must therefore be
        # create-if-absent, not rename: os.link fails with EEXIST when the
        # manifest is already there (rename would silently replace it and
        # drop the winner's commit). The loser gets ConcurrentCommitError
        # and can re-derive against the new head; its snapshot dir is an
        # orphan until vacuum.
        final = os.path.join(self.log_dir, f"{version:08d}.json")
        try:
            try:
                os.link(tmp, final)
            except FileExistsError:
                self._raise_occupied(final, version)
            except OSError:
                # Filesystem without hard links (some NFS/object-store/
                # overlay mounts): O_CREAT|O_EXCL open keeps the same
                # create-if-absent guarantee with wider FS support. Unlike
                # the link path the file IS visible before its content, so
                # publish with ONE os.write + fsync (never incremental
                # json.dump into the live fd) — a reader can then only ever
                # observe empty-or-complete, and _manifests() treats a torn
                # trailing manifest as uncommitted.
                try:
                    fd = os.open(final, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
                except FileExistsError:
                    self._raise_occupied(final, version)
                try:
                    if self._test_stall_after_manifest_create is not None:
                        self._test_stall_after_manifest_create()
                    os.write(fd, json.dumps(manifest).encode())
                    os.fsync(fd)
                    # Post-fsync self-check: a writer stalled between the
                    # O_EXCL create and this write can have its in-flight
                    # (empty ⇒ unparseable) manifest removed by
                    # repair_torn_tail() and the version reused by a rival
                    # — without this re-stat the stalled writer would
                    # finish writing to the removed inode and report
                    # success: an acknowledged-but-lost commit. This check
                    # NARROWS the window (a complete-and-acked manifest
                    # could still race repair's parse→remove); repair's
                    # quarantine-rename + re-verify closes the rest — a
                    # write that completed in between is restored, never
                    # dropped.
                    if self._test_stall_after_manifest_write is not None:
                        self._test_stall_after_manifest_write()
                    st_fd = os.fstat(fd)
                    try:
                        st_path = os.stat(final)
                    except FileNotFoundError:
                        st_path = None
                    if st_path is None or (
                        st_path.st_dev,
                        st_path.st_ino,
                    ) != (st_fd.st_dev, st_fd.st_ino):
                        # The manifest is not (or no longer) at its path.
                        # Either repair_torn_tail unlinked it while this
                        # writer stalled pre-write (commit lost — retry is
                        # correct), or repair QUARANTINED it after the
                        # write completed and is about to re-verify and
                        # RESTORE it (commit LANDS — a retry would commit
                        # the same data twice). Wait out repair's decision
                        # before answering the caller.
                        if not self._landed_after_repair(
                            final, version, st_fd
                        ):
                            raise ConcurrentCommitError(
                                f"version {version} at {self.root}: this "
                                "writer's manifest was unlinked mid-commit "
                                "(repair_torn_tail classified the stalled "
                                "write as crashed); the commit did NOT "
                                "land — re-read the head and retry"
                            )
                finally:
                    os.close(fd)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        self._maybe_checkpoint(version)

    def _landed_after_repair(self, final: str, version: int, st_fd) -> bool:
        """Disambiguate the self-check's missing-manifest finding against
        a concurrent repair_torn_tail (the double-commit window: a writer
        whose complete manifest was quarantined would otherwise NACK,
        retry, and land the same data at two versions once repair
        restores the original). The quarantine protocol makes the
        writer's view decidable by inode:

        - ``final`` holds THIS writer's inode again → repair restored it
          (restore links BEFORE removing the quarantine): the commit
          landed — acknowledge success.
        - a ``final.quarantine_*`` entry holds this writer's inode →
          repair is mid-decision; since this writer's write+fsync already
          completed, the re-verify will parse a complete manifest and
          restore it — keep waiting (bounded by
          ``repair_ack_grace_seconds``).
        - NEITHER exists → repair (or a racer) unlinked the inode: the
          commit is definitively lost — return False so the caller
          retries.

        A quarantine that outlives the grace (repair crashed mid-restore,
        or its restore hit a rival's re-commit of the version and raised)
        is the genuinely ambiguous case: raise TornCommitError loudly —
        the data sits complete in the quarantine file and must be
        resolved by an operator, not silently re-committed."""
        deadline = time.time() + self.repair_ack_grace_seconds
        ident = (st_fd.st_dev, st_fd.st_ino)
        while True:
            try:
                st = os.stat(final)
                if (st.st_dev, st.st_ino) == ident:
                    return True  # restored under its committed name
            except OSError:
                pass
            held = False
            for q in os.listdir(self.log_dir):
                if not q.startswith(os.path.basename(final) + ".quarantine_"):
                    continue
                try:
                    sq = os.stat(os.path.join(self.log_dir, q))
                except OSError:
                    continue
                if (sq.st_dev, sq.st_ino) == ident:
                    held = True
                    break
            if not held:
                # repair decided. Restore publishes the link BEFORE the
                # quarantine disappears, so one more stat of ``final``
                # closes that ordering; otherwise the inode was unlinked.
                try:
                    st = os.stat(final)
                    if (st.st_dev, st.st_ino) == ident:
                        return True
                except OSError:
                    pass
                return False
            if time.time() >= deadline:
                raise TornCommitError(
                    f"version {version} at {self.root}: this writer's "
                    "complete manifest was quarantined by "
                    "repair_torn_tail and neither restored nor dropped "
                    f"within {self.repair_ack_grace_seconds}s (repair "
                    "crashed, or a rival re-committed the version and "
                    "blocked the restore); the commit outcome is "
                    "ambiguous — resolve the quarantined manifest "
                    "manually before retrying"
                )
            time.sleep(0.02)

    def _maybe_checkpoint(self, version: int) -> None:
        """Auto-checkpoint every ``checkpoint_interval`` commits. The
        auto path writes an INCREMENTAL checkpoint — only the manifests
        above the previous checkpoint's floor, plus a pointer to it — so
        checkpoint bytes per write are O(interval) and cumulative write
        volume O(commits), independent of table age (a full-state fold
        per interval re-wrote the entire kept log every time:
        O(commits²/interval) cumulative on a continuous-ingest ledger).
        Head reads still stop at the first chunk; only full-history scans
        walk the chain, and vacuum()/checkpoint() fold it back to one
        file. Best effort: the commit above is already durable, so a
        checkpoint failure must not make the caller believe the commit
        failed (it would re-commit and hit ConcurrentCommitError on its
        own version) — warn and move on; the next commit retries."""
        # The pointer probe must not pollute last_log_files_opened: the
        # counter is documented as "files opened by the most recent
        # log-read call" and tests/benches read it right after a write
        # path — restored in a finally so the warn path keeps the
        # contract too.
        saved = self.last_log_files_opened
        try:
            try:
                self.last_log_files_opened = 0
                cp = self._read_last_checkpoint()
                floor = cp["version"] if cp else -1
                if version - floor >= self.checkpoint_interval:
                    chunk = self._tail_manifests(floor)
                    if chunk:
                        self._write_checkpoint(
                            chunk,
                            parent=cp["_name"] if cp else None,
                            floor=floor,
                        )
            finally:
                self.last_log_files_opened = saved
        except Exception as exc:  # noqa: BLE001 — cache maintenance only
            warnings.warn(
                f"checkpoint after version {version} at {self.root} "
                f"failed ({exc}); reads fall back to log replay",
                stacklevel=2,
            )

    # -- read path ----------------------------------------------------------

    def _resolve(self, version: int | None, as_of_ts: float | None) -> dict:
        ms = self._manifests()
        if not ms:
            raise FileNotFoundError(f"no versions at {self.root}")
        if version is not None:
            for m in ms:
                if m["version"] == version:
                    return m
            raise ValueError(f"version {version} not found at {self.root}")
        if as_of_ts is not None:
            eligible = [m for m in ms if m["timestamp"] <= as_of_ts]
            if not eligible:
                raise ValueError(f"no version at or before ts={as_of_ts}")
            return eligible[-1]
        return ms[-1]

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        as_of_ts: float | None = None,
    ) -> DataFrame:
        """Current snapshot, or time travel by version / timestamp
        (``VERSION AS OF`` / ``TIMESTAMP AS OF`` analogue). Append-chain
        dirs are read ONE SCAN EACH and unioned by name: a single
        multi-path read cannot mix hive-partitioned snapshot layouts
        (CONFLICTING_DIRECTORY_STRUCTURES without a common basePath), and
        per-dir scans keep partition pruning and column order independent
        per snapshot. Chain length — and so the union width — is bounded
        by ``append(max_chain=...)``."""
        m = self._resolve(version, as_of_ts)
        dirs = self._data_dirs(m)
        out = spark.read.parquet(dirs[0])
        for d in dirs[1:]:
            # allowMissingColumns: merge-schema appends (see append()) may
            # add or omit columns per delta dir; absent columns read null.
            # Writes validate name/type compatibility, so this can never
            # mask a typo — only honor a declared evolution.
            out = out.unionByName(
                spark.read.parquet(d), allowMissingColumns=True
            )
        return self._cast_partition_col(out, m)

    @staticmethod
    def _cast_partition_col(out: DataFrame, m: dict) -> DataFrame:
        """The hive PARTITION column's on-disk form is only a dir-name
        string, so scan inference can disagree with the table's logical
        schema (long written as ``p=3`` reads back int). Cast it back to
        the manifest-RECORDED type so batch reads, the table_stream
        source, and the writer all agree on types. Partition pruning
        survives the cast: Catalyst's UnwrapCastInBinaryComparison
        rewrites ``cast(p as bigint) = 3L`` back to ``p = 3``."""
        rec = m.get("schema")
        part = m.get("partition_by")
        if rec is not None and part and part in out.columns:
            from pyspark.sql.types import StructType

            st = StructType.fromJson(rec)
            if (
                part in st.fieldNames()
                and out.schema[part].dataType != st[part].dataType
            ):
                out = out.withColumn(
                    part, F.col(part).cast(st[part].dataType)
                )
        return out

    def _read_dirs(
        self, spark: SparkSession, dirs: list[str], fallback_version: int
    ) -> DataFrame:
        """Per-dir union of a SUBSET of a version's data dirs (same
        one-scan-per-dir rule as ``read``). An empty subset still needs
        the version's schema for the diff join, so it reads the version
        under limit(0) — Catalyst collapses that to an empty relation."""
        if not dirs:
            return self.read(spark, version=fallback_version).limit(0)
        out = spark.read.parquet(dirs[0])
        for d in dirs[1:]:
            out = out.unionByName(
                spark.read.parquet(d), allowMissingColumns=True
            )
        return out

    def _touched_partitions(self, pre_m: dict, post_m: dict) -> list:
        """Partition VALUES whose parquet file sets differ between two
        manifests — a pure file-listing computation (the manifests name
        whole dirs; shared dirs contribute identical file sets by
        construction, so only partitions reached by an exclusive dir can
        differ). Hive dir names decode via unquote; the null-partition
        sentinel maps to None."""
        from urllib.parse import unquote

        def inventory(m: dict) -> dict:
            inv: dict[str, set] = {}
            for d in self._data_dirs(m):
                for dirpath, _, files in os.walk(d):
                    pqs = [f for f in files if f.endswith(".parquet")]
                    if not pqs:
                        continue
                    rel = os.path.relpath(dirpath, d)
                    inv.setdefault(rel, set()).update(
                        os.path.join(dirpath, f) for f in pqs
                    )
            return inv

        a, b = inventory(pre_m), inventory(post_m)
        out = []
        for rel in set(a) | set(b):
            if a.get(rel) == b.get(rel):
                continue
            val = rel.split("=", 1)[1] if "=" in rel else rel
            out.append(
                None if val == "__HIVE_DEFAULT_PARTITION__" else unquote(val)
            )
        return sorted(out, key=lambda v: (v is None, str(v)))

    def history(self, spark: SparkSession, limit: int | None = None) -> DataFrame:
        """(version, timestamp, operation, parameters) — newest first, like
        ``DeltaTable.history()`` (view_delta_history.py:57-59). ``limit``
        is Delta's ``history(N)``: only the newest N commits, and — with
        the incremental checkpoint chain — the log walk STOPS as soon as
        it has them (``history(1)`` on a 100k-commit table parses one
        chunk, not the chain)."""
        if limit is None:
            ms = list(reversed(self._manifests()))
        else:
            ms, seen = [], set()
            for _, chunk in self._chunks():
                for m in reversed(chunk):
                    # racing auto-checkpoints can leave overlapping
                    # chunks; first (newest) occurrence wins
                    if m["version"] in seen:
                        continue
                    seen.add(m["version"])
                    ms.append(m)
                    if len(ms) >= limit:
                        break
                if len(ms) >= limit:
                    break
        rows = [
            (
                m["version"],
                float(m["timestamp"]),
                m["operation"],
                json.dumps(m["parameters"], sort_keys=True),
            )
            for m in ms
        ]
        return spark.createDataFrame(
            rows, "version BIGINT, timestamp DOUBLE, operation STRING, parameters STRING"
        )

    def changes(
        self,
        spark: SparkSession,
        v_from: int,
        v_to: int,
        key_cols: list[str],
    ) -> DataFrame:
        """Change-data-feed analogue: the row-level diff between two
        committed versions, keyed by ``key_cols`` — one row per
        insert/delete, two rows (update_preimage, update_postimage) per
        key whose non-key columns changed. Delta's table_changes() records
        changes at write time; over snapshot logs the changelog is
        RECONSTRUCTED as a keyed diff (the Iceberg changelog-scan
        approach), which stays correct for any pair of versions including
        non-adjacent ones.

        Plan shape: one full-outer equi-join on the key (both snapshots
        shuffle once on the same key — co-partitioned, no broadcast of a
        data-sized side), null-safe column compares JVM-side, then a
        two-element array explode for updates. Linear in |v_from|+|v_to|
        at any scale.

        ``key_cols`` must uniquely identify rows within each snapshot
        (the same precondition Delta MERGE enforces); duplicate keys fan
        the diff join out and the classification is undefined.

        Pruning: the two manifests usually SHARE data dirs (append commits
        inherit the parent's dirs), and a shared dir contributes byte-
        identical rows to both snapshots — under the unique-key
        precondition those rows can never produce a diff row (a key living
        in a shared dir on one side and a changed dir on the other would
        be a duplicate key within a snapshot). Each side therefore scans
        only its EXCLUSIVE dirs — metadata-sized for an append lineage
        instead of two full-table scans — and on a hive-partitioned table
        the partitions actually present in those exclusive dirs are pushed
        as PartitionFilters on both scans, keeping the job bounded by the
        touched data even if a future commit shape shares dirs across
        partition rewrites. Version pairs with no shared dirs (full
        rewrites) fall back to the full keyed diff — with rewritten file
        names there is no metadata signal for which partitions changed."""
        pre_m = self._resolve(v_from, None)
        post_m = self._resolve(v_to, None)
        pre_dirs, post_dirs = self._data_dirs(pre_m), self._data_dirs(post_m)
        shared = set(pre_dirs) & set(post_dirs)
        # the same recorded-type partition-column normalization read()
        # applies — a mixed raw/normalized pair would look like a retype
        pre = self._cast_partition_col(
            self._read_dirs(
                spark, [d for d in pre_dirs if d not in shared], v_from
            ),
            pre_m,
        )
        post = self._cast_partition_col(
            self._read_dirs(
                spark, [d for d in post_dirs if d not in shared], v_to
            ),
            post_m,
        )
        part_by = pre_m.get("partition_by")
        if shared and part_by and part_by == post_m.get("partition_by"):
            touched = self._touched_partitions(pre_m, post_m)
            # Literals are cast to the PARTITION COLUMN's type: a mixed-
            # type IN would coerce the column to string and the predicate
            # would no longer push as a PartitionFilter.
            dt = pre.schema[part_by].dataType
            cond = F.lit(False)
            for v in touched:
                term = (
                    F.col(part_by).isNull()
                    if v is None
                    else F.col(part_by) == F.lit(v).cast(dt)
                )
                cond = cond | term
            pre, post = pre.filter(cond), post.filter(cond)
        # Schema evolution (append(merge_schema=True)) lets the two
        # versions differ by ADDED/OMITTED columns; diff over the union
        # of columns with the missing side null-filled — Delta CDF's
        # semantics (a column added between v_from and v_to shows up as
        # null→value updates). Retyped columns cannot exist (the write
        # path rejects them); raise if an out-of-band rewrite made one.
        missing_keys = [
            k
            for k in key_cols
            if k not in pre.columns or k not in post.columns
        ]
        if missing_keys:
            raise ValueError(
                f"changes() key columns {missing_keys} missing from one "
                f"side: {pre.columns} vs {post.columns}"
            )
        types: dict[str, object] = {}
        for side in (pre, post):
            for f in side.schema:
                if f.name in types and types[f.name] != f.dataType:
                    raise ValueError(
                        f"changes() column '{f.name}' has conflicting "
                        f"types across versions ({types[f.name].simpleString()}"
                        f" vs {f.dataType.simpleString()}); schema "
                        "evolution never retypes a column"
                    )
                types.setdefault(f.name, f.dataType)
        all_cols = pre.columns + [
            c for c in post.columns if c not in pre.columns
        ]

        def with_all(df: DataFrame) -> DataFrame:
            return df.select(
                *[
                    F.col(c)
                    if c in df.columns
                    else F.lit(None).cast(types[c]).alias(c)
                    for c in all_cols
                ]
            )

        pre, post = with_all(pre), with_all(post)
        data_cols = [c for c in all_cols if c not in key_cols]

        def tagged(df: DataFrame, tag: str) -> DataFrame:
            renamed = df.select(
                *[F.col(k) for k in key_cols],
                *[F.col(c).alias(f"{tag}_{c}") for c in data_cols],
                F.lit(1).alias(f"{tag}_present"),
            )
            return renamed

        j = tagged(pre, "a").join(tagged(post, "b"), on=key_cols, how="full_outer")
        a_absent = F.col("a_present").isNull()
        b_absent = F.col("b_present").isNull()
        differs = None
        for c in data_cols:
            d = ~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
            differs = d if differs is None else (differs | d)
        if differs is None:  # key-only table: presence IS the row identity
            differs = F.lit(False)

        def img(tag: str, change: str) -> Column:
            return F.struct(
                *[F.col(f"{tag}_{c}").alias(c) for c in data_cols],
                F.lit(change).alias("_change_type"),
            )

        # Unchanged keys drop BEFORE the explode so every CASE branch yields
        # a same-typed non-empty array (and the explode input stays small).
        j = j.filter(a_absent | b_absent | differs)
        rows = (
            F.when(b_absent, F.array(img("a", "delete")))
            .when(a_absent, F.array(img("b", "insert")))
            .otherwise(
                F.array(img("a", "update_preimage"), img("b", "update_postimage"))
            )
        )
        out = j.select(*key_cols, F.explode(rows).alias("_chg"))
        return out.select(
            *key_cols,
            *[F.col(f"_chg.{c}").alias(c) for c in data_cols],
            F.col("_chg._change_type").alias("_change_type"),
        )

    def compact(self, spark: SparkSession) -> int:
        """Fold the head's file set — possibly a long append chain — back
        into ONE full snapshot (OPTIMIZE for the manifest log): reading a
        table that took 10,000 micro-batch appends should not open 10,000
        delta dirs forever. The head's recorded hive partitioning is
        PRESERVED — a compaction that silently flattened a cell-
        partitioned index table would destroy its partition pruning with
        no error. Old versions stay time-travelable until vacuum retires
        them."""
        head = self._resolve(None, None)
        return self.write(
            self.read(spark),
            "COMPACT",
            {"compacted_from": head["version"]},
            partition_by=head.get("partition_by"),
        )

    def restore(self, spark: SparkSession, version: int) -> int:
        """RESTORE TABLE ... TO VERSION AS OF: re-commit an old snapshot as
        the new head (Delta-parity; keeps the log linear, preserves the
        source version's hive partitioning)."""
        src = self._resolve(version, None)
        df = self.read(spark, version=version)
        return self.write(
            df,
            "RESTORE",
            {"restored_version": version},
            partition_by=src.get("partition_by"),
        )

    # -- maintenance --------------------------------------------------------

    def vacuum(
        self,
        keep_last: int = 2,
        orphan_grace_seconds: float | None = None,
        retain_hours: float | None = None,
    ) -> "VacuumResult":
        """Retire snapshot dirs older than the newest ``keep_last`` versions
        (and stale orphan ``_v*`` dirs with no manifest). Time travel below
        the horizon stops working — same contract as Delta VACUUM.

        ``retain_hours`` is the Delta ``RETAIN N HOURS`` form: every
        version committed within the window is ALSO kept (the horizon is
        the union of the newest ``keep_last`` and the time window), so a
        scheduled vacuum can promise "time travel covers the last N
        hours" regardless of commit rate.

        Orphan dirs (referenced by NO manifest) are reclaimed only when
        their newest file is older than ``orphan_grace_seconds`` (default:
        the class attribute, 1h): an append writes its delta dir BEFORE
        its manifest commits, so a young orphan may be an in-flight write —
        deleting it would let the manifest commit referencing a missing
        dir, and because append manifests inherit parent dirs the hole
        poisons every descendant version. Delta VACUUM's retention-window
        rule; like Delta, vacuum still must not run concurrently with a
        writer that can stall longer than the grace. Dirs referenced by a
        manifest being RETIRED are committed history and reclaim
        immediately.

        Retiring manifests also folds the log: a fresh checkpoint over the
        kept manifests is written first, so the checkpoint never resurrects
        a retired version whose files are gone.

        Returns ``VacuumResult(retired, removed_dirs)``: ``retired`` lists
        only versions whose MANIFEST was deleted (time travel to them is
        gone); ``removed_dirs`` lists every snapshot dir removed, including
        commit-losing orphan attempt dirs whose parsed version number may
        match a kept, still-readable snapshot — conflating those two was a
        false 'version retired' signal."""
        import shutil

        grace = (
            self.orphan_grace_seconds
            if orphan_grace_seconds is None
            else orphan_grace_seconds
        )
        ms = self._manifests()
        kept = ms[-keep_last:] if ms else []
        if retain_hours is not None and ms:
            cutoff_ts = time.time() - retain_hours * 3600.0
            kept_v = {m["version"] for m in kept}
            kept = [
                m
                for m in ms
                if m["version"] in kept_v or m["timestamp"] >= cutoff_ts
            ]
        keep_dirs = {
            os.path.basename(d) for m in kept for d in self._data_dirs(m)
        }
        keep_versions = {m["version"] for m in kept}
        retiring = [m for m in ms if m["version"] not in keep_versions]
        # Dirs owned by retired history reclaim immediately; keyed on the
        # dirs manifests actually reference, not parsed version numbers —
        # a commit-losing writer's orphan dir can share a version number
        # with the winner's kept snapshot.
        retired_dirs = {
            os.path.basename(d) for m in retiring for d in self._data_dirs(m)
        } - keep_dirs
        removed_dirs: list[str] = []
        retired: list[int] = []
        if not os.path.isdir(self.root):
            return VacuumResult(retired, removed_dirs)
        # Fold the log BEFORE deleting anything: if this crashes mid-way,
        # reads already resolve from the kept-only checkpoint and the
        # leftover retired manifests/dirs are below its floor — consistent,
        # and the next vacuum finishes the reclaim.
        if retiring and kept:
            self._write_checkpoint(kept)
        for m in retiring:
            mf = os.path.join(self.log_dir, f"{m['version']:08d}.json")
            if os.path.exists(mf):
                os.remove(mf)
                retired.append(m["version"])
        cutoff = time.time() - grace
        for d in os.listdir(self.root):
            if not d.startswith("_v") or d in keep_dirs:
                continue
            if d not in retired_dirs and self._newest_mtime(
                os.path.join(self.root, d)
            ) > cutoff:
                continue  # young orphan — possibly an in-flight append
            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
            removed_dirs.append(d)
        return VacuumResult(retired, removed_dirs)

    @staticmethod
    def _newest_mtime(path: str) -> float:
        try:
            newest = os.path.getmtime(path)
        except OSError:
            return 0.0
        for dirpath, _, files in os.walk(path):
            for f in files:
                try:
                    newest = max(
                        newest, os.path.getmtime(os.path.join(dirpath, f))
                    )
                except OSError:
                    pass
        return newest
