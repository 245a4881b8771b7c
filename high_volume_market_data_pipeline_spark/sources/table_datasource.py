"""Versioned table as a STREAMING SOURCE — ``readStream`` over the
manifest-log table (Delta streaming-source parity; the reference has no
streaming at all, and Delta itself is absent from this environment).

``spark.readStream.format("table_stream").option("root", ...)`` turns a
``VersionedParquetTable`` into an append stream: offsets are committed
VERSION numbers, and each micro-batch emits the rows of the data dirs a
version NEWLY references. Structural rules (no reliance on free-text
operation names):

- an APPEND manifest references its parent's dirs plus fresh delta dirs
  → the batch is exactly the delta rows;
- a FULL-WRITE manifest (overwrite / COMPACT / RESTORE) rewrites data
  the stream already emitted → skipped when ``skip_change_commits`` is
  true (the default; Delta's ``skipChangeCommits``), otherwise the
  stream raises — silently re-emitting a whole snapshot would duplicate
  every row downstream;
- the ``starting_version`` snapshot (default 0) is emitted in full as
  the first batch — the Delta "initial snapshot then tail the log"
  contract.

Scale shape: this is a FULL ``DataSourceStreamReader`` — planning only
lists manifests (metadata-sized; the checkpointed log keeps that O(1) in
table age) and emits one InputPartition PER PARQUET FILE; executors read
their own files with pyarrow and yield Arrow record batches zero-copy
into Spark. Nothing data-sized ever crosses the planning process.

Vacuum interacts like Delta: computing version v's new dirs needs
manifest v-1, so the table's vacuum horizon must cover the stream's lag
(a retired manifest raises with the vacuum hint rather than silently
re-emitting shared dirs).

Reference: extract_crypto_data.py:226-241 writes versioned snapshots the
batch way; this module is the beyond-reference streaming consumption of
the same table (SURVEY §2.10 mandate).
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_PARTITIONING = "hive"

# SELF-CONTAINED manifest-log reading. Spark runs a Python DataSource's
# plan-time methods (schema / offsets / partitions) in a fresh "plan
# runner" python process — NOT the driver — so this module may not import
# anything from this repo package at runtime (the process inherits the
# driver's cwd; see the NOTES cwd-portability rule). The reader therefore
# parses the ON-DISK log format directly, the way Delta readers in other
# engines parse the Delta log: pointer + checkpoint + post-checkpoint
# tail, torn trailing manifest treated as uncommitted. Format owner:
# sinks/history.py (_manifests / _read_last_checkpoint) — any format
# change must land in both files; tests/test_table_stream.py pins the
# agreement by streaming tables history.py wrote.
_MANIFEST_RE = re.compile(r"^(\d{8})\.json$")


def _read_manifests(root: str) -> dict[int, dict]:
    log_dir = os.path.join(root, "_log")
    if not os.path.isdir(log_dir):
        return {}
    base: list[dict] = []
    floor = -1
    try:
        with open(os.path.join(log_dir, "_last_checkpoint")) as fh:
            name = json.load(fh)["checkpoint"]
        with open(os.path.join(log_dir, name)) as fh:
            cp = json.load(fh)
        base, floor = cp["manifests"], cp["version"]
    except (OSError, ValueError, KeyError):
        pass  # checkpoint is a cache; fall back to full log replay
    names = sorted(
        f
        for f in os.listdir(log_dir)
        if _MANIFEST_RE.match(f) and int(f[:8]) > floor
    )
    out = {m["version"]: m for m in base}
    for i, f in enumerate(names):
        try:
            with open(os.path.join(log_dir, f)) as fh:
                m = json.load(fh)
            out[m["version"]] = m
        except (json.JSONDecodeError, ValueError):
            if i == len(names) - 1:
                continue  # torn trailing manifest: not committed yet
            raise RuntimeError(
                f"corrupt non-trailing manifest {f} at {root}"
            ) from None
    return out


def _manifest_dirs(manifest: dict) -> list[str]:
    return list(manifest.get("data_dirs") or [manifest["data_dir"]])


def _parquet_files(d: str) -> list[str]:
    out = []
    for dirpath, _, files in os.walk(d):
        out.extend(
            os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
        )
    return sorted(out)


def _arrow_schema(dirs: list[str]):
    """Unified arrow schema of a snapshot: pyarrow.dataset resolves hive
    partition columns the same way every read() does, so planning and
    execution can never disagree on column types. A list of directory
    sources needs one child dataset per dir (pyarrow's list form is
    files-only)."""
    import pyarrow.dataset as ds

    children = [
        ds.dataset(d, format="parquet", partitioning=_PARTITIONING)
        for d in dirs
    ]
    return (children[0] if len(children) == 1 else ds.dataset(children)).schema


class TableFilesPartition(InputPartition):
    """One parquet file plus the dir root it is hive-relative to."""

    def __init__(self, file: str, base_dir: str):
        self.file = file
        self.base_dir = base_dir


class TableStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema=None):
        self.root = options.get("root")
        if not self.root:
            raise ValueError("table_stream requires option 'root'")
        self.starting_version = int(options.get("starting_version", 0))
        self.skip_change_commits = str(
            options.get("skip_change_commits", "true")
        ).lower() in ("1", "true", "yes")
        self._spark_schema = schema

    # -- offsets (plan runner, metadata-sized) -----------------------------

    def _manifest_map(self) -> dict[int, dict]:
        return _read_manifests(self.root)

    def initialOffset(self) -> dict:
        # One version BELOW the starting snapshot: the first batch then
        # covers (start-1, start], i.e. the snapshot itself.
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        # Always the head: per-batch version bounds would need the last
        # COMMITTED offset, which this API revision only surfaces through
        # checkpoint state Spark keeps to itself — an in-memory floor
        # would go stale on restart and plan a non-monotonic offset. A
        # long-idle consumer therefore catches up in one (replayable)
        # batch whose size is bounded by the table's append rate × lag.
        ms = self._manifest_map()
        return {"version": max(ms) if ms else self.starting_version - 1}

    def commit(self, end: dict) -> None:
        pass  # offsets resolve from the persistent manifest log

    # -- batch planning (plan runner) ---------------------------------------

    def _new_dirs(self, v: int, ms: dict[int, dict]) -> list[str]:
        if v not in ms:
            raise ValueError(
                f"version {v} of {self.root} is no longer in the manifest "
                "log (vacuumed?); the table's vacuum horizon must cover "
                "the stream's lag"
            )
        dirs = _manifest_dirs(ms[v])
        if v == self.starting_version:
            return dirs  # the initial snapshot is emitted in full
        if v - 1 not in ms:
            raise ValueError(
                f"version {v - 1} of {self.root} is no longer in the "
                "manifest log (vacuumed?); cannot derive version "
                f"{v}'s delta"
            )
        parent = set(_manifest_dirs(ms[v - 1]))
        fresh = [d for d in dirs if d not in parent]
        if parent - set(dirs) or (fresh and "data_dirs" not in ms[v]):
            # dirs were dropped (overwrite/compact/restore) — a change
            # commit, not an append
            if self.skip_change_commits:
                return []
            raise ValueError(
                f"version {v} of {self.root} rewrites existing data "
                "(overwrite/compact/restore); set skip_change_commits=true "
                "to tail only appends"
            )
        return fresh

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[TableFilesPartition]:
        ms = self._manifest_map()
        out: list[TableFilesPartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            for d in self._new_dirs(v, ms):
                out.extend(
                    TableFilesPartition(f, d) for f in _parquet_files(d)
                )
        if not out:
            # Spark requires ≥1 partition per batch; an empty sentinel
            # yields no record batches in read().
            out.append(TableFilesPartition("", ""))
        return out

    # -- execution (executor, pyarrow) ------------------------------------

    def read(self, partition: TableFilesPartition) -> Iterator:
        if not partition.file:
            return
        import pyarrow.dataset as ds

        # Scan AGAINST THE PLANNED SCHEMA: pyarrow projects/casts each
        # file (and fills hive partition columns) to it, so every batch
        # matches the declared stream schema in names, order, and types
        # no matter which snapshot generation wrote the file.
        target = None
        if self._spark_schema is not None:
            from pyspark.sql.pandas.types import to_arrow_schema

            target = to_arrow_schema(self._spark_schema)
        dataset = ds.dataset(
            partition.file,
            format="parquet",
            partitioning=_PARTITIONING,
            partition_base_dir=partition.base_dir,
            schema=target,
        )
        yield from dataset.to_batches()


class TableStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "table_stream"

    def schema(self):
        # Resolved from the HEAD version: the head is the table's
        # authoritative schema, and a resumed stream must be plannable
        # even after its starting snapshot was vacuumed away (only the
        # versions the resume actually READS need to be retained).
        from pyspark.sql.pandas.types import from_arrow_schema

        root = self.options.get("root")
        if not root:
            raise ValueError("table_stream requires option 'root'")
        ms = _read_manifests(root)
        if not ms:
            raise ValueError(f"no committed versions at {root}")
        return from_arrow_schema(_arrow_schema(_manifest_dirs(ms[max(ms)])))

    def streamReader(self, schema):
        return TableStreamReader(self.options, schema=schema)


def register_table_stream(spark) -> None:
    """Idempotent registration: after this,
    ``spark.readStream.format("table_stream").option("root", path)``
    tails the versioned table at ``path``.

    The module registers itself for BY-VALUE pickling first: the reader
    object (whose ``read`` runs executor-side) and its InputPartitions
    live in this repo package, and by-reference pickling would require
    Python workers — which inherit the driver's cwd — to re-import the
    package (the NOTES cwd-portability rule). ``read`` itself touches
    only pyarrow/pyspark at runtime; every repo-module import in this
    file sits inside driver-only methods."""
    from pyspark import cloudpickle

    import high_volume_market_data_pipeline_spark.sources.table_datasource as m

    cloudpickle.register_pickle_by_value(m)
    spark.dataSource.register(TableStreamDataSource)
