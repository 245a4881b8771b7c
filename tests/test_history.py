"""S8 — versioned parquet table: history, time travel, restore, vacuum.

Reference parity: view_delta_history.py:44-72 (history DataFrame, newest
first), README time-travel claims; M5 existence probe.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.sinks.history import (
    VersionedParquetTable,
)


@pytest.fixture()
def table(tmp_path):
    return VersionedParquetTable(str(tmp_path / "tbl"))


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_versions_and_time_travel(spark, table):
    assert not table.exists()
    v0 = table.write(_df(spark, 5, "a"), "WRITE")
    v1 = table.write(_df(spark, 8, "b"), "MERGE")
    assert (v0, v1) == (0, 1)
    assert table.exists()

    assert table.read(spark).count() == 8
    assert table.read(spark, version=0).count() == 5
    assert table.read(spark, version=0).select("tag").distinct().collect()[0][0] == "a"

    ts0 = table._manifests()[0]["timestamp"]
    assert table.read(spark, as_of_ts=ts0).count() == 5


def test_history_newest_first(spark, table):
    table.write(_df(spark, 3, "a"), "WRITE", {"mode": "overwrite"})
    table.write(_df(spark, 4, "b"), "OPTIMIZE")
    hist = table.history(spark).collect()
    assert [r["version"] for r in hist] == [1, 0]
    assert [r["operation"] for r in hist] == ["OPTIMIZE", "WRITE"]


def test_restore_recommits_old_snapshot(spark, table):
    table.write(_df(spark, 5, "a"), "WRITE")
    table.write(_df(spark, 9, "b"), "WRITE")
    v2 = table.restore(spark, 0)
    assert v2 == 2
    assert table.read(spark).count() == 5
    assert table.history(spark).collect()[0]["operation"] == "RESTORE"


def test_vacuum_retires_below_horizon(spark, table):
    for i in range(4):
        table.write(_df(spark, i + 1, f"t{i}"), "WRITE")
    result = table.vacuum(keep_last=2)
    assert sorted(result.retired) == [0, 1]
    assert len(result.removed_dirs) == 2
    assert table.read(spark).count() == 4
    assert table.read(spark, version=2).count() == 3
    with pytest.raises((ValueError, FileNotFoundError)):
        table.read(spark, version=0)


def test_merge_upsert_versioned_transactional(spark, table):
    """K3 through the manifest log: MERGE commits a new version — source
    wins on key collisions, unmatched rows survive, and the pre-merge
    state stays time-travelable (the transactional behavior the reference
    gets from Delta MERGE, bronze_to_silver_crypto.py:96-108)."""
    from high_volume_market_data_pipeline_spark.sinks.merge import (
        merge_upsert_versioned,
    )

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "id int, val string, seq int"
    )
    v0 = merge_upsert_versioned(base, table, keys=["id"], order_col="seq")
    update = spark.createDataFrame(
        [(2, "B2", 20), (3, "c", 20)], "id int, val string, seq int"
    )
    v1 = merge_upsert_versioned(update, table, keys=["id"], order_col="seq")
    assert (v0, v1) == (0, 1)

    now = {(r["id"], r["val"]) for r in table.read(spark).collect()}
    assert now == {(1, "a"), (2, "B2"), (3, "c")}
    before = {(r["id"], r["val"]) for r in table.read(spark, version=0).collect()}
    assert before == {(1, "a"), (2, "b")}
    assert table.history(spark).collect()[0]["operation"] == "MERGE"


def test_crashed_writer_leaves_current_version_intact(spark, table):
    table.write(_df(spark, 5, "a"), "WRITE")
    # Simulate a writer that died after the snapshot dir, before the
    # manifest: readers must still see v0; vacuum cleans the orphan.
    orphan = os.path.join(table.root, "_v00000042")
    _df(spark, 2, "zz").write.parquet(orphan)
    assert table.latest_version() == 0
    assert table.read(spark).count() == 5
    # A YOUNG orphan could be an in-flight append whose manifest is about
    # to commit (data dirs land before manifests) — the default vacuum
    # grace must leave it alone, or the commit would reference a deleted
    # dir and poison every descendant version.
    result = table.vacuum(keep_last=1)
    assert "_v00000042" not in result.removed_dirs
    assert os.path.exists(orphan)
    # Past the grace window (forced to 0 here) the orphan is a crashed
    # writer's leftovers: removed, but NOT reported as a retired version —
    # its parsed number could collide with a kept snapshot's.
    result = table.vacuum(keep_last=1, orphan_grace_seconds=0.0)
    assert "_v00000042" in result.removed_dirs
    assert 42 not in result.retired
    assert not os.path.exists(orphan)


def test_changes_classifies_insert_delete_update(spark, tmp_path):
    from high_volume_market_data_pipeline_spark.sinks.history import (
        VersionedParquetTable,
    )

    t = VersionedParquetTable(str(tmp_path / "cdf"))
    v0 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, s string, v double",
    )
    v1 = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)],
        "id long, s string, v double",
    )
    t.write(v0)
    t.write(v1)
    got = {
        (r["id"], r["_change_type"]): (r["s"], r["v"])
        for r in t.changes(spark, 0, 1, key_cols=["id"]).collect()
    }
    assert got == {
        (1, "delete"): ("a", 10.0),
        (3, "update_preimage"): ("c", 30.0),
        (3, "update_postimage"): ("c", 99.0),
        (4, "insert"): ("d", 40.0),
    }  # id=2 unchanged: no row


def test_changes_null_safe_and_non_adjacent(spark, tmp_path):
    """NULL→value counts as a change (eqNullSafe, not =), and the diff
    works across non-adjacent versions."""
    from high_volume_market_data_pipeline_spark.sinks.history import (
        VersionedParquetTable,
    )

    t = VersionedParquetTable(str(tmp_path / "cdf2"))
    t.write(spark.createDataFrame([(1, None)], "id long, v string"))
    t.write(spark.createDataFrame([(1, "mid")], "id long, v string"))
    t.write(spark.createDataFrame([(1, "x")], "id long, v string"))
    got = sorted(
        (r["_change_type"], r["v"])
        for r in t.changes(spark, 0, 2, key_cols=["id"]).collect()
    )
    assert got == [("update_postimage", "x"), ("update_preimage", None)]


def test_changes_plan_is_single_equi_join(spark, tmp_path):
    from high_volume_market_data_pipeline_spark.sinks.history import (
        VersionedParquetTable,
    )

    t = VersionedParquetTable(str(tmp_path / "cdf3"))
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    t.write(df)
    t.write(df)
    plan = (
        t.changes(spark, 0, 1, key_cols=["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_changes_append_lineage_prunes_to_exclusive_dirs(spark, tmp_path):
    """CDF between an append child and its parent must be metadata-sized:
    shared dirs contribute byte-identical rows to both snapshots, so the
    diff scans only the EXCLUSIVE dirs — on a partitioned table the plan
    carries real PartitionFilters for the touched partition, and the
    parent snapshot is never re-scanned (its side collapses to an empty
    relation)."""
    from high_volume_market_data_pipeline_spark.sinks.history import (
        VersionedParquetTable,
    )

    t = VersionedParquetTable(str(tmp_path / "cdf_prune"))
    base = spark.createDataFrame(
        [(1, 1, "a"), (2, 2, "b"), (3, 3, "c"), (4, 1, "d")],
        "id long, p int, s string",
    )
    t.write(base, partition_by="p")
    delta = spark.createDataFrame([(10, 3, "x"), (11, 3, "y")],
                                  "id long, p int, s string")
    t.append(delta, partition_by="p")

    diff = t.changes(spark, 0, 1, key_cols=["id"])
    got = sorted((r["id"], r["_change_type"]) for r in diff.collect())
    assert got == [(10, "insert"), (11, "insert")]

    plan = diff._jdf.queryExecution().executedPlan().toString()
    # only the touched partition is admitted, as a pushed partition filter
    import re

    assert "PartitionFilters" in plan
    assert "PartitionFilters: []" not in plan
    assert re.search(r"PartitionFilters: \[[^\]]*p#\d+L? = 3", plan), plan
    # the parent's full-snapshot dir must not be scanned: v0's dir appears
    # in no FileScan (the pre side is an empty relation after limit(0))
    import json, os

    with open(os.path.join(t.log_dir, "00000000.json")) as fh:
        v0_dir = json.load(fh)["data_dir"]
    assert os.path.basename(v0_dir) not in plan


def test_changes_reverse_append_diff_is_deletes_only(spark, tmp_path):
    """Diffing DOWN an append lineage (v_from newer) emits the delta rows
    as deletes — same exclusive-dir reduction, opposite side."""
    from high_volume_market_data_pipeline_spark.sinks.history import (
        VersionedParquetTable,
    )

    t = VersionedParquetTable(str(tmp_path / "cdf_rev"))
    t.write(spark.createDataFrame([(1, "a")], "id long, s string"))
    t.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    got = sorted(
        (r["id"], r["_change_type"])
        for r in t.changes(spark, 1, 0, key_cols=["id"]).collect()
    )
    assert got == [(2, "delete")]
    # identical versions: every dir shared, diff is empty
    assert t.changes(spark, 1, 1, key_cols=["id"]).count() == 0


def test_concurrent_commit_is_create_if_absent(spark, table):
    """Version allocation is read-then-increment, so two writers can both
    pick the same next version; the manifest commit must then FAIL for the
    loser (create-if-absent), never silently replace the winner's manifest
    (which would drop its commit and leave readers on the loser's data)."""
    from high_volume_market_data_pipeline_spark.sinks.history import (
        ConcurrentCommitError,
    )

    import json as _json

    table.write(_df(spark, 3, "a"), "WRITE")
    winner_df = _df(spark, 4, "winner")
    table.write(winner_df, "WRITE")  # v1 — the racer that committed first
    winner = os.path.join(table.log_dir, "00000001.json")

    # Simulate the loser's stale read: it chose its version BEFORE the
    # winner's manifest appeared, so it also picks v1.
    real_latest = table.latest_version
    table.latest_version = lambda: 0
    try:
        with pytest.raises(ConcurrentCommitError):
            table.write(_df(spark, 9, "loser"), "WRITE")
    finally:
        table.latest_version = real_latest

    # The winner's manifest is untouched and no temp litter remains.
    with open(winner) as fh:
        assert _json.load(fh)["version"] == 1
    assert table.read(spark, version=1).select("tag").distinct().collect()[
        0
    ][0] == "winner"
    assert not [f for f in os.listdir(table.log_dir) if f.startswith(".tmp")]


def test_sketch_merge_commit_retries_on_collision(spark, tmp_path):
    """merge_commit_sketches must survive a commit collision by re-reading
    the new head and re-unioning (sound because HLL union is idempotent):
    after a forced collision, the final state must still include BOTH
    writers' items."""
    from high_volume_market_data_pipeline_spark.operators.sketches import (
        hll_estimate, hll_rollup,
    )
    from high_volume_market_data_pipeline_spark.sinks.history import (
        VersionedParquetTable,
    )
    from high_volume_market_data_pipeline_spark.streaming.sketch_state import (
        merge_commit_sketches,
    )

    t = VersionedParquetTable(str(tmp_path / "sk"))
    mk = lambda lo, hi: hll_rollup(  # noqa: E731
        spark.range(lo, hi).select(
            F.lit("g").alias("grp"), F.col("id").alias("item")
        ),
        ["grp"],
        "item",
    )
    merge_commit_sketches(t, mk(0, 100), ["grp"])

    # Interpose: the first write attempt collides (another writer grabbed
    # the version between our read and our commit), forcing the retry
    # path to re-read the NEW head — racer included — and re-merge.
    from high_volume_market_data_pipeline_spark.sinks.history import (
        ConcurrentCommitError,
    )

    real_write = t.write
    state = {"failed": False}

    from high_volume_market_data_pipeline_spark.operators.sketches import (
        hll_merge,
    )

    def racing_write(df, operation="WRITE", parameters=None, partition_by=None):
        if not state["failed"]:
            state["failed"] = True
            racer = hll_merge(
                t.read(spark).unionByName(mk(100, 200)), ["grp"]
            )
            real_write(racer, operation="RACER")
            raise ConcurrentCommitError("simulated race")
        return real_write(df, operation, parameters, partition_by)

    t.write = racing_write
    merge_commit_sketches(t, mk(200, 300), ["grp"])
    t.write = real_write

    est = (
        t.read(spark)
        .select(hll_estimate(F.col("sketch")).alias("est"))
        .collect()[0]["est"]
    )
    direct = (
        hll_rollup(
            spark.range(0, 300).select(
                F.lit("g").alias("grp"), F.col("id").alias("item")
            ),
            ["grp"],
            "item",
        )
        .select(hll_estimate(F.col("sketch")).alias("est"))
        .collect()[0]["est"]
    )
    assert est == direct  # union exactness: nobody's items were dropped


def test_torn_trailing_manifest_is_skipped_not_fatal(spark, table):
    """A crashed O_EXCL-fallback commit can leave a truncated trailing
    manifest. Readers must treat it as never-committed (head = previous
    version) instead of raising JSONDecodeError forever; a torn manifest
    in the MIDDLE of the log is real corruption and must fail loudly."""
    table.write(_df(spark, 3, "a"), "WRITE")
    table.write(_df(spark, 5, "b"), "WRITE")

    torn = os.path.join(table.log_dir, "00000002.json")
    with open(torn, "w") as fh:
        fh.write('{"version": 2, "timestamp"')  # truncated mid-write

    assert table.latest_version() == 1  # torn tail ignored
    assert table.read(spark).count() == 5
    # Recovery: the next write claims the torn version number via the
    # create-if-absent gate — with the torn file present that raises
    # ConcurrentCommitError (a writer must not assume a torn tail is
    # reclaimable; an admin removes it), which is loud, not corrupt.
    from high_volume_market_data_pipeline_spark.sinks.history import (
        ConcurrentCommitError,
    )

    with pytest.raises(ConcurrentCommitError):
        table.write(_df(spark, 7, "c"), "WRITE")
    os.unlink(torn)
    v = table.write(_df(spark, 7, "c"), "WRITE")
    assert v == 2 and table.read(spark).count() == 7

    # Mid-log corruption is NOT skippable.
    mid = os.path.join(table.log_dir, "00000001.json")
    with open(mid, "w") as fh:
        fh.write("{nope")
    with pytest.raises(RuntimeError, match="non-trailing"):
        table.latest_version()


def test_append_commits_delta_files_only(spark, table):
    """append() must reference the parent's data dirs plus ONE new delta
    dir — commit cost O(appended rows) — while read/time-travel behave
    exactly as if the table had been fully rewritten."""
    table.write(_df(spark, 5, "a"))
    v1 = table.append(_df(spark, 3, "b"))
    assert v1 == 1
    assert table.read(spark).count() == 8
    assert table.read(spark, version=0).count() == 5

    dirs_v1 = table._data_dirs(table._resolve(1, None))
    v0_dir = table._data_dirs(table._resolve(0, None))[0]
    assert len(dirs_v1) == 2 and v0_dir in dirs_v1  # parent referenced

    table.append(_df(spark, 2, "c"))
    assert len(table._data_dirs(table._resolve(2, None))) == 3
    tags = {
        r["tag"] for r in table.read(spark).select("tag").distinct().collect()
    }
    assert tags == {"a", "b", "c"} and table.read(spark).count() == 10

    # compaction folds the chain back to one snapshot, same rows
    v3 = table.compact(spark)
    assert len(table._data_dirs(table._resolve(v3, None))) == 1
    assert table.read(spark).count() == 10


def test_vacuum_keeps_shared_parent_dirs(spark, table):
    """Retiring an old version must NOT delete a data dir that a kept
    append manifest still references — append chains share files."""
    table.write(_df(spark, 5, "a"))
    table.append(_df(spark, 3, "b"))
    table.append(_df(spark, 2, "c"))
    res = table.vacuum(keep_last=2)
    assert res.retired == [0]  # v0's manifest is gone (no time travel)
    # ...but v0's DATA survives: kept v1/v2 manifests reference its dir
    assert table.read(spark).count() == 10
    assert table.read(spark, version=1).count() == 8


def test_append_max_chain_absorbs_into_snapshot(spark, table):
    """Continuous ingest must not grow read fan-in without bound:
    append(max_chain=k) folds the PARENT CHAIN into one snapshot dir once
    it reaches k dirs, while the fresh delta keeps its own dir (so the
    streaming source can emit exactly the new rows — see
    test_table_stream) — same version numbering, same rows, and every
    later read opens at most k dirs."""
    table.write(_df(spark, 4, "a"))
    for i in range(5):
        table.append(_df(spark, 1, f"d{i}"), max_chain=3)

    # chain lengths per version: v0=1, v1=2, v2=3, v3 folds the 3-dir
    # parent + keeps its delta = 2, v4=3, v5 folds again = 2 — never
    # above the bound
    lens = [
        len(table._data_dirs(table._resolve(v, None))) for v in range(6)
    ]
    assert lens == [1, 2, 3, 2, 3, 2]
    fold = table._resolve(3, None)
    assert fold["parameters"]["absorbed_chain"] == 3
    # the fold's fresh_dirs names exactly the delta dir — the one dir the
    # parent chain's fold did not rewrite
    assert len(fold["fresh_dirs"]) == 1
    assert fold["fresh_dirs"][0] in fold["data_dirs"]
    assert set(table._data_dirs(table._resolve(2, None))).isdisjoint(
        fold["fresh_dirs"]
    )
    assert table.read(spark).count() == 9
    # absorption is invisible to readers: every version's content is the
    # prefix-sum of appends
    assert [table.read(spark, version=v).count() for v in range(6)] == [
        4, 5, 6, 7, 8, 9
    ]


def test_partitioned_append_chain_absorbs_and_compacts(spark, table):
    """The absorb and compact rewrites must work on HIVE-PARTITIONED
    chains and preserve the partition layout: a single multi-root read
    of partitioned dirs crashes (CONFLICTING_DIRECTORY_STRUCTURES), and
    a compaction that silently flattened the layout would destroy
    partition pruning with no error."""
    table.write(_df(spark, 4, "a").withColumn("p", F.col("id") % 2),
                partition_by="p")
    for i in range(4):
        # the 3rd append hits max_chain and must absorb, not crash
        table.append(
            _df(spark, 1, f"d{i}").withColumn("p", F.lit(i % 2)),
            partition_by="p",
            max_chain=3,
        )
    assert table.read(spark).count() == 8

    v = table.compact(spark)
    compacted = table._resolve(v, None)
    assert compacted.get("partition_by") == "p"  # layout preserved
    ddir = table._data_dirs(compacted)[0]
    assert {d for d in os.listdir(ddir) if d.startswith("p=")} == {
        "p=0", "p=1"
    }
    assert table.read(spark).count() == 8
    # restore of a partitioned version keeps its layout too
    rv = table.restore(spark, 0)
    assert table._resolve(rv, None).get("partition_by") == "p"
    assert table.read(spark).count() == 4


def test_checkpoint_bounds_log_opens_and_preserves_reads(spark, table):
    """Every ``checkpoint_interval`` commits the log auto-writes an
    INCREMENTAL checkpoint (chunk above the previous floor + parent
    pointer — Delta's ``_last_checkpoint`` pattern with O(commits)
    cumulative write volume instead of a full-state rewrite per fold): a
    HEAD read opens pointer + newest checkpoint + at most ``interval``
    tail manifests, NOT O(total commits) — and history()/time-travel are
    byte-for-byte unchanged, including versions below the newest floor
    (they resolve down the chain)."""
    for i in range(25):
        table.write(_df(spark, i + 1, f"t{i}"), "WRITE")
    names = os.listdir(table.log_dir)
    assert "_last_checkpoint" in names
    # two auto-checkpoints landed (v9 full, v19 incremental chained to it)
    cps = sorted(n for n in names if n.endswith(".checkpoint.json"))
    assert cps == ["00000009.checkpoint.json", "00000019.checkpoint.json"]
    import json as _json

    with open(os.path.join(table.log_dir, cps[1])) as fh:
        inc = _json.load(fh)
    assert inc["parent"] == cps[0] and inc["floor"] == 9
    assert [m["version"] for m in inc["manifests"]] == list(range(10, 20))

    assert table.latest_version() == 24
    assert table.last_log_files_opened <= table.checkpoint_interval + 2
    # time travel below the newest floor resolves down the chain
    assert table.read(spark, version=3).count() == 4
    hist = table.history(spark).collect()
    assert [r["version"] for r in hist] == list(range(24, -1, -1))
    # an explicit checkpoint() FOLDS the chain back to one full file
    table.checkpoint()
    names = os.listdir(table.log_dir)
    assert sum(1 for n in names if n.endswith(".checkpoint.json")) == 1
    assert [r["version"] for r in table.history(spark).collect()] == list(
        range(24, -1, -1)
    )


def test_checkpoint_thousand_commit_log_constant_opens(spark, table):
    """A 1,000-commit table reads its log in a CONSTANT number of file
    opens once checkpointed — the continuous-ingest scale contract.
    Manifests are fabricated directly (this exercises only the log
    layer; data-path reads are covered above)."""
    os.makedirs(table.log_dir)
    for v in range(1000):
        with open(os.path.join(table.log_dir, f"{v:08d}.json"), "w") as fh:
            fh.write(
                '{"version": %d, "timestamp": %d.0, "operation": "WRITE",'
                ' "parameters": {}, "data_dir": "/nope/_v%08d_x"}' % (v, v, v)
            )
    assert table.versions() == list(range(1000))
    assert table.last_log_files_opened == 1000  # pre-checkpoint: full replay
    table.checkpoint()
    assert table.versions() == list(range(1000))
    assert table.last_log_files_opened <= 3
    # a torn trailing manifest past the checkpoint stays tolerated
    with open(os.path.join(table.log_dir, "00001000.json"), "w") as fh:
        fh.write('{"version": 1000, "time')
    assert table.latest_version() == 999
    os.unlink(os.path.join(table.log_dir, "00001000.json"))

    # 100 MORE commits on top: every auto-checkpoint is INCREMENTAL —
    # each embeds exactly one interval's manifests (bounded bytes per
    # checkpoint, O(commits) cumulative write volume), never the whole
    # 1,000-commit history again; head reads stay constant-opens and the
    # full log is still exact down the chain.
    import json as _json

    for v in range(1000, 1100):
        table._commit_manifest(
            {
                "version": v,
                "timestamp": float(v),
                "operation": "WRITE",
                "parameters": {},
                "data_dir": f"/nope/_v{v:08d}_x",
            },
            v,
        )
    cps = sorted(
        n for n in os.listdir(table.log_dir) if n.endswith(".checkpoint.json")
    )
    assert len(cps) == 11  # the v999 fold + 10 incrementals
    sizes = []
    for n in cps[1:]:
        with open(os.path.join(table.log_dir, n)) as fh:
            cp = _json.load(fh)
        assert len(cp["manifests"]) == table.checkpoint_interval
        assert "parent" in cp
        sizes.append(os.path.getsize(os.path.join(table.log_dir, n)))
    # bounded: every incremental within 2x of the smallest, and an order
    # of magnitude below the full fold
    assert max(sizes) <= 2 * min(sizes)
    assert max(sizes) < os.path.getsize(os.path.join(table.log_dir, cps[0])) / 10
    assert table.latest_version() == 1099
    assert table.last_log_files_opened <= 3
    assert table.versions() == list(range(1100))


def test_vacuum_folds_checkpoint_and_never_resurrects(spark, table):
    """vacuum() rewrites the checkpoint over the KEPT manifests before
    deleting anything: a stale checkpoint must never resurrect a retired
    version whose files are gone."""
    for i in range(12):  # crosses the auto-checkpoint at v9
        table.write(_df(spark, i + 1, f"t{i}"), "WRITE")
    res = table.vacuum(keep_last=2, orphan_grace_seconds=0.0)
    assert res.retired == list(range(10))
    assert table.versions() == [10, 11]
    assert table.read(spark, version=10).count() == 11
    with pytest.raises(ValueError):
        table.read(spark, version=5)
    # exactly one checkpoint file remains and it covers only kept versions
    cps = [
        n for n in os.listdir(table.log_dir) if n.endswith(".checkpoint.json")
    ]
    assert len(cps) == 1
    import json as _json

    with open(os.path.join(table.log_dir, cps[0])) as fh:
        cp = _json.load(fh)
    assert [m["version"] for m in cp["manifests"]] == [10, 11]


def test_stale_torn_manifest_raises_repair_needed(spark, table):
    """A CAS commit landing on a STALE torn manifest (a crashed commit,
    not live contention) must fail with the repair-needed error instead
    of letting retry loops burn out blaming contention — and
    repair_torn_tail() frees the version."""
    from high_volume_market_data_pipeline_spark.sinks.history import (
        TornCommitError,
    )

    table.write(_df(spark, 3, "a"), "WRITE")
    assert table.repair_torn_tail() is None  # refuses a healthy tail
    torn = os.path.join(table.log_dir, "00000001.json")
    with open(torn, "w") as fh:
        fh.write('{"version": 1, "timestamp"')
    table.torn_grace_seconds = -1.0  # stale immediately, for the test
    with pytest.raises(TornCommitError, match="repair_torn_tail"):
        table.write(_df(spark, 5, "b"), "WRITE")
    assert table.repair_torn_tail() == "00000001.json"
    assert table.write(_df(spark, 5, "b"), "WRITE") == 1
    assert table.read(spark).count() == 5


def test_append_schema_evolution(spark, tmp_path):
    """merge_schema=False rejects column drift (a typo must not become an
    all-null column); merge_schema=True evolves: added columns read back
    null on old rows, omitted columns null on delta rows, and a retyped
    column is always rejected."""
    from high_volume_market_data_pipeline_spark.sinks.history import (
        VersionedParquetTable,
    )

    t = VersionedParquetTable(str(tmp_path / "evo"))
    t.write(spark.createDataFrame([(1, "a")], "id long, s string"))

    extra = spark.createDataFrame([(2, "b", 0.5)], "id long, s string, q double")
    with pytest.raises(ValueError, match="merge_schema"):
        t.append(extra)
    t.append(extra, merge_schema=True)
    rows = {r["id"]: (r["s"], r["q"]) for r in t.read(spark).collect()}
    assert rows == {1: ("a", None), 2: ("b", 0.5)}

    # delta OMITTING a column also evolves (null on the delta rows)
    t.append(spark.createDataFrame([(3,)], "id long"), merge_schema=True)
    rows = {r["id"]: (r["s"], r["q"]) for r in t.read(spark).collect()}
    assert rows[3] == (None, None)

    # same name, different type: never allowed, even with merge_schema
    retyped = spark.createDataFrame([(4, 9, 1.0)], "id long, s int, q double")
    with pytest.raises(ValueError, match="never retypes"):
        t.append(retyped, merge_schema=True)

    # time travel still sees each version's own column set semantics
    assert set(t.read(spark, version=0).columns) == {"id", "s"}

    # absorb path unions with missing columns allowed
    t.append(
        spark.createDataFrame([(5, "e", 2.5)], "id long, s string, q double"),
        merge_schema=True,
        max_chain=2,
    )
    rows = {r["id"]: (r["s"], r["q"]) for r in t.read(spark).collect()}
    assert rows == {1: ("a", None), 2: ("b", 0.5), 3: (None, None), 5: ("e", 2.5)}


def test_stalled_writer_self_check_never_loses_commit(spark, table, monkeypatch):
    """The torn-commit race closed for real: a writer stalled between its
    O_EXCL manifest create and the write+fsync gets its in-flight file
    repaired away and its version reused by a rival — the stalled writer
    must then raise ConcurrentCommitError from its post-fsync self-check,
    NEVER report success for a commit that is not the one readers see."""
    import re as _re

    from high_volume_market_data_pipeline_spark.sinks.history import (
        ConcurrentCommitError,
    )

    table.write(_df(spark, 2, "base"))

    # force the O_EXCL fallback (the path with the create→write window)
    monkeypatch.setattr(os, "link", _raise_oserror)

    rival = VersionedParquetTable(table.root)
    rival.torn_grace_seconds = 0.01
    rival_df = _df(spark, 3, "rival")

    def stall():
        # while the writer is stalled: its freshly created (empty ⇒
        # unparseable) manifest ages past the grace window, a repair
        # unlinks it, and the rival commits the same version number
        tail = sorted(
            f
            for f in os.listdir(table.log_dir)
            if _re.match(r"^\d{8}\.json$", f)
        )[-1]
        os.utime(os.path.join(table.log_dir, tail), (1, 1))
        assert rival.repair_torn_tail() == tail
        assert rival.write(rival_df) == 1

    table._test_stall_after_manifest_create = stall
    with pytest.raises(ConcurrentCommitError, match="unlinked mid-commit"):
        table.write(_df(spark, 5, "stalled"))

    # the table head is the rival's commit, intact and readable
    table._test_stall_after_manifest_create = None
    assert table.latest_version() == 1
    assert table.read(spark).count() == 3


def _raise_oserror(*_a, **_k):
    raise OSError("filesystem without hard links")


def test_changes_across_schema_evolution(spark, tmp_path):
    """changes() across a merge_schema append boundary diffs over the
    UNION of columns with the missing side null-filled (Delta CDF
    semantics): pre-evolution rows whose new column stays null are
    unchanged; a row that gains a value shows as a null→value update."""
    t = VersionedParquetTable(str(tmp_path / "cevo"))
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    # v1 adds column q and a new row
    t.append(
        spark.createDataFrame([(3, "c", 1.5)], "id long, s string, q double"),
        merge_schema=True,
    )
    ch = {
        (r["id"], r["_change_type"]): (r["s"], r["q"])
        for r in t.changes(spark, 0, 1, ["id"]).collect()
    }
    # rows 1/2: q is null-filled on the v0 side and null in v1 ⇒ unchanged
    assert ch == {(3, "insert"): ("c", 1.5)}

    # v2 rewrites row 1 giving q a value: null→value update across the
    # evolution boundary, diffed against v0 (non-adjacent pair)
    v1 = t.read(spark)
    t.write(
        v1.replace(  # noqa: PD010 — DataFrame.replace not pandas pivot
            to_replace=float("nan"), value=None
        ).selectExpr(
            "id", "s", "case when id = 1 then 9.9 else q end as q"
        )
    )
    rows = t.changes(spark, 0, 2, ["id"]).collect()
    byid = {(r["id"], r["_change_type"]): (r["s"], r["q"]) for r in rows}
    assert byid[(1, "update_preimage")] == ("a", None)
    assert byid[(1, "update_postimage")] == ("a", 9.9)
    assert byid[(3, "insert")] == ("c", 1.5)
    assert (2, "update_preimage") not in byid


def test_empty_merge_schema_append_records_parent_schema(spark, tmp_path):
    """An EMPTY delta with merge_schema=True must not evolve the recorded
    schema: its columns exist in no data dir, so recording them would
    declare phantom columns that read() lacks and later appends would
    validate against."""
    from pyspark.sql.types import StructType

    t = VersionedParquetTable(str(tmp_path / "phantom"))
    t.write(
        spark.createDataFrame([(1, "a", 0)], "id long, s string, p int"),
        partition_by="p",
    )
    # an empty PARTITIONED write creates no partition dirs and no part
    # files — the has_files=False commit path
    empty = spark.createDataFrame(
        [], "id long, s string, p int, q double"
    ).filter("1=0")
    v = t.append(empty, merge_schema=True, partition_by="p")
    rec = StructType.fromJson(t._resolve(v, None)["schema"])
    assert {f.name for f in rec} == {"id", "s", "p"}  # no phantom q
    assert set(t.read(spark).columns) == {"id", "s", "p"}
    # a later append matching the REAL table schema still validates
    t.append(
        spark.createDataFrame([(2, "b", 1)], "id long, s string, p int"),
        partition_by="p",
    )
    assert t.read(spark).count() == 2


def test_history_limit_stops_at_first_chunks(spark, table):
    """history(limit=N) returns the newest N commits AND stops the log
    walk early (Delta's history(N)): with the incremental checkpoint
    chain, history(1) on a deep table parses pointer + newest chunk, not
    the whole chain."""
    for v in range(35):
        table._commit_manifest(
            {
                "version": v,
                "timestamp": float(v),
                "operation": "WRITE",
                "parameters": {},
                "data_dir": f"/nope/_v{v:08d}_x",
            },
            v,
        )
    got = table.history(spark, limit=3).collect()
    assert [r["version"] for r in got] == [34, 33, 32]
    # the walk stopped at the loose tail: pointer + cp + tail(5) opens,
    # never the chain below the newest checkpoint
    assert table.last_log_files_opened <= table.checkpoint_interval + 2
    full = table.history(spark).collect()
    assert [r["version"] for r in full] == list(range(34, -1, -1))


def test_checkpoint_chain_damage_falls_back_to_replay(spark, table):
    """Checkpoints are CACHES: deleting a mid-chain checkpoint file (or
    the pointer target) must degrade reads to a full manifest replay with
    identical results, never an error or a truncated history — and the
    stream source's self-contained parser honors the same rule."""
    import json as _json

    for v in range(25):
        table._commit_manifest(
            {
                "version": v,
                "timestamp": float(v),
                "operation": "WRITE",
                "parameters": {},
                "data_dir": f"/nope/_v{v:08d}_x",
            },
            v,
        )
    cps = sorted(
        n for n in os.listdir(table.log_dir) if n.endswith(".checkpoint.json")
    )
    assert len(cps) == 2  # v9 full + v19 incremental
    # destroy the PARENT of the newest checkpoint: the chain is broken
    os.unlink(os.path.join(table.log_dir, cps[0]))
    assert table.versions() == list(range(25))
    assert table.latest_version() == 24
    # the stream-side parser agrees
    from high_volume_market_data_pipeline_spark.sources.table_datasource import (
        _read_manifests,
    )

    assert sorted(_read_manifests(table.root)) == list(range(25))

    # now garble the pointer itself: same degradation
    with open(os.path.join(table.log_dir, "_last_checkpoint"), "w") as fh:
        fh.write("{not json")
    assert table.versions() == list(range(25))
    assert sorted(_read_manifests(table.root)) == list(range(25))

    # a cycle (checkpoint naming itself as parent) must not loop forever
    name = cps[1]
    p = os.path.join(table.log_dir, name)
    with open(p) as fh:
        cp = _json.load(fh)
    cp["parent"] = name
    with open(p, "w") as fh:
        _json.dump(cp, fh)
    with open(os.path.join(table.log_dir, "_last_checkpoint"), "w") as fh:
        _json.dump({"checkpoint": name}, fh)
    assert table.versions() == list(range(25))
    assert sorted(_read_manifests(table.root)) == list(range(25))


def test_vacuum_retain_hours_keeps_time_window(spark, table):
    """vacuum(retain_hours=N) — Delta RETAIN N HOURS: versions committed
    within the window survive even beyond keep_last, so time travel over
    the promised wall-clock horizon holds regardless of commit rate."""
    import json as _json
    import time as _time

    for i in range(6):
        table.write(_df(spark, i + 1, f"t{i}"), "WRITE")
    # age versions 0..2 to "three hours ago"; 3..5 stay fresh
    old = _time.time() - 3 * 3600
    for v in range(3):
        p = os.path.join(table.log_dir, f"{v:08d}.json")
        with open(p) as fh:
            m = _json.load(fh)
        m["timestamp"] = old
        with open(p, "w") as fh:
            _json.dump(m, fh)
    table.checkpoint()  # fold so the edited timestamps are authoritative

    res = table.vacuum(keep_last=1, retain_hours=1.0)
    # keep_last=1 alone would retire 0..4; the 1h window saves 3 and 4
    assert sorted(res.retired) == [0, 1, 2]
    for v in (3, 4, 5):
        assert table.read(spark, version=v).count() == v + 1


def test_concurrent_writers_with_incremental_checkpoints(spark, table):
    """Eight threads race 10 commits each through the CAS retry loop
    while auto-checkpoints (incremental chain) fire concurrently: the
    log must come out contiguous with every writer's payloads exactly
    once, and reads must resolve through whatever chain/pointer state
    the races left behind (checkpoints are caches — racing pointers can
    orphan a chunk file, never lose a manifest)."""
    import threading

    from high_volume_market_data_pipeline_spark.sinks.history import (
        ConcurrentCommitError,
    )

    table.checkpoint_interval = 5  # force frequent chain activity
    n_threads, per_thread = 8, 10
    errors: list = []

    def writer(tid: int) -> None:
        try:
            for i in range(per_thread):
                for _ in range(200):  # CAS retry loop
                    target = (table.latest_version() or 0) + 1 if table.exists() else 0
                    try:
                        table._commit_manifest(
                            {
                                "version": target,
                                "timestamp": float(target),
                                "operation": "WRITE",
                                "parameters": {"tid": tid, "i": i},
                                "data_dir": f"/nope/_t{tid}_{i}",
                            },
                            target,
                        )
                        break
                    except ConcurrentCommitError:
                        continue
                else:
                    raise RuntimeError("retries exhausted")
        except Exception as exc:  # noqa: BLE001 — surfaced to the assert
            errors.append(exc)

    threads = [
        threading.Thread(target=writer, args=(t,)) for t in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []

    total = n_threads * per_thread
    ms = table._manifests()
    assert [m["version"] for m in ms] == list(range(total))
    payloads = {(m["parameters"]["tid"], m["parameters"]["i"]) for m in ms}
    assert payloads == {
        (t, i) for t in range(n_threads) for i in range(per_thread)
    }  # every commit exactly once, none lost to a race
    # head reads resolve through the racing-chain state in bounded opens
    # (a racing pointer can be a few intervals stale — bounded by the
    # race width, never O(total commits))
    assert table.latest_version() == total - 1
    assert table.last_log_files_opened <= 4 * table.checkpoint_interval + 2
    assert table.history(spark, limit=5).count() == 5


def test_repair_quarantine_restores_completed_write(spark, table):
    """The parse→remove TOCTOU in repair: a stalled writer's fsync can
    land BETWEEN repair's unparseable-parse and its removal — and the
    writer's post-fsync self-check may already have acknowledged the
    commit. Repair therefore quarantines (renames) and re-verifies: a
    manifest that is complete by then is restored under its committed
    name, never dropped."""
    import json as _json

    table.write(_df(spark, 3, "a"), "WRITE")
    torn = os.path.join(table.log_dir, "00000001.json")
    with open(torn, "w") as fh:
        fh.write("")  # in-flight: created, content not yet written
    table.torn_grace_seconds = -1.0

    real_rename = os.rename
    good = {
        "version": 1,
        "timestamp": 1.0,
        "operation": "WRITE",
        "parameters": {},
        "data_dir": os.path.join(table.root, "_v00000001_deadbeef"),
        "partition_by": None,
        "schema": None,
    }

    def rename_then_complete(src, dst):
        real_rename(src, dst)
        if src == torn:
            # the stalled writer's write+fsync lands on the same inode
            # right after the rename barrier
            with open(dst, "w") as fh:
                _json.dump(good, fh)

    import unittest.mock as mock

    with mock.patch("os.rename", side_effect=rename_then_complete):
        assert table.repair_torn_tail() is None  # restored, not repaired
    with open(torn) as fh:
        assert _json.load(fh)["version"] == 1  # back under its name
    assert not [
        f for f in os.listdir(table.log_dir) if ".quarantine_" in f
    ]


def test_repair_still_removes_confirmed_torn_tail(spark, table):
    """The quarantine re-verify keeps the normal repair behavior: a file
    that is still unparseable after the rename barrier is removed and
    its version number freed."""
    table.write(_df(spark, 3, "a"), "WRITE")
    torn = os.path.join(table.log_dir, "00000001.json")
    with open(torn, "w") as fh:
        fh.write('{"version": 1, "timesta')
    table.torn_grace_seconds = -1.0
    assert table.repair_torn_tail() == "00000001.json"
    assert not os.path.exists(torn)
    assert table.write(_df(spark, 4, "b"), "WRITE") == 1


def test_maybe_checkpoint_restores_counter_on_failure(spark, table,
                                                      monkeypatch):
    """last_log_files_opened is documented as 'files opened by the most
    recent log-read call'; a failing checkpoint write must restore it on
    the warn path too, not leave the probe's count behind."""
    for i in range(9):
        table.write(_df(spark, 1, f"t{i}"), "WRITE")

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(table, "_write_checkpoint", boom)
    table.read(spark)  # sets the counter to this read's file count
    before = table.last_log_files_opened
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        # crossing the interval triggers the (failing) checkpoint
        table.write(_df(spark, 1, "t9"), "WRITE")
    assert table.last_log_files_opened == before


def test_self_check_acks_commit_restored_by_repair(spark, table, monkeypatch):
    """The NACK-then-restore double-commit window closed: a writer whose
    COMPLETE manifest is quarantined by a repair racer between its fsync
    and its self-check stat must WAIT OUT repair's decision and
    acknowledge the restored commit — raising ConcurrentCommitError there
    would make the caller retry and land the same data at two versions
    once repair restores the original."""
    import threading
    import time as _time

    table.write(_df(spark, 2, "base"))
    real_link = os.link
    monkeypatch.setattr(os, "link", _raise_oserror)  # force O_EXCL path

    final = os.path.join(table.log_dir, "00000001.json")
    quarantine = final + ".quarantine_test0001"

    def stall():
        # repair's first half: the complete manifest is quarantined...
        os.rename(final, quarantine)

        # ...and its second half (re-verify parses complete JSON →
        # restore: link under the committed name, then drop the
        # quarantine) lands while the writer's self-check is polling
        def finish():
            _time.sleep(0.2)
            real_link(quarantine, final)
            os.unlink(quarantine)

        threading.Thread(target=finish, daemon=True).start()

    table._test_stall_after_manifest_write = stall
    try:
        assert table.write(_df(spark, 3, "restored")) == 1  # ACK, no raise
    finally:
        table._test_stall_after_manifest_write = None
    # exactly one commit of the data — no double-commit at version 2
    assert table.latest_version() == 1
    assert table.read(spark).count() == 3


def test_self_check_raises_when_repair_drops_the_manifest(
    spark, table, monkeypatch
):
    """The unlink side of the same window: no quarantine holds the
    writer's inode and the committed name is gone → the commit is
    definitively lost and the self-check reports it (retry is correct)."""
    from high_volume_market_data_pipeline_spark.sinks.history import (
        ConcurrentCommitError,
    )

    table.write(_df(spark, 2, "base"))
    monkeypatch.setattr(os, "link", _raise_oserror)

    final = os.path.join(table.log_dir, "00000001.json")
    table._test_stall_after_manifest_write = lambda: os.unlink(final)
    try:
        with pytest.raises(ConcurrentCommitError, match="unlinked"):
            table.write(_df(spark, 3, "dropped"))
    finally:
        table._test_stall_after_manifest_write = None
    assert table.latest_version() == 0


def test_self_check_ambiguous_quarantine_raises_torn(
    spark, table, monkeypatch
):
    """A quarantine that outlives the grace window (repair crashed
    mid-restore, or a rival re-committed the version and blocked the
    restore) is genuinely ambiguous: the writer must raise
    TornCommitError loudly — never ConcurrentCommitError, whose contract
    invites a retry that could double-commit the quarantined data."""
    from high_volume_market_data_pipeline_spark.sinks.history import (
        TornCommitError,
    )

    table.write(_df(spark, 2, "base"))
    monkeypatch.setattr(os, "link", _raise_oserror)
    monkeypatch.setattr(table, "repair_ack_grace_seconds", 0.3)

    final = os.path.join(table.log_dir, "00000001.json")
    quarantine = final + ".quarantine_test0002"
    table._test_stall_after_manifest_write = (
        lambda: os.rename(final, quarantine)
    )
    try:
        with pytest.raises(TornCommitError, match="ambiguous"):
            table.write(_df(spark, 3, "stuck"))
    finally:
        table._test_stall_after_manifest_write = None
        os.unlink(quarantine)


def test_commit_ref_metadata_only(spark, table, tmp_path):
    """r12 optimization contract: commit_ref advances a version with a
    manifest-only commit — the new version reads the PARENT'S files
    byte-identically, no new data dir is written, n_rows/row_count carry
    over, fresh_dirs is empty, and the explicit-version form keeps CAS
    semantics. Vacuum's dir reference-counting must keep the shared dirs
    alive while any referencing version is kept."""
    from high_volume_market_data_pipeline_spark.sinks.history import (
        ConcurrentCommitError,
    )

    table.write(_df(spark, 5, "a"), "WRITE")
    table.append(_df(spark, 3, "b"), "APPEND")

    def dirs():
        return {
            d for d in os.listdir(table.root) if d.startswith("_v")
        }

    before = dirs()
    v2 = table.commit_ref("REPAIR", {"k": 1}, version=2, parent_version=1)
    assert v2 == 2
    assert dirs() == before  # no data written
    assert table.row_count(spark, version=2) == 8
    assert sorted(
        tuple(r) for r in table.read(spark, version=2).collect()
    ) == sorted(tuple(r) for r in table.read(spark, version=1).collect())
    m = table._resolve(2, None)
    assert m["fresh_dirs"] == [] and m["n_rows"] == 8
    assert m["operation"] == "REPAIR" and m["parameters"] == {"k": 1}
    # CAS: the version is occupied now
    with pytest.raises(ConcurrentCommitError):
        table.commit_ref("REPAIR", version=2, parent_version=1)
    # appends on top of a ref commit extend the same chain
    table.append(_df(spark, 2, "c"), "APPEND")
    assert table.read(spark).count() == 10
    # vacuum to the newest 2 (v2 ref + v3): the dirs shared with retired
    # v0/v1 must survive because kept manifests still reference them
    table.vacuum(keep_last=2, orphan_grace_seconds=0.0)
    assert table.read(spark).count() == 10
    assert table.row_count(spark) == 10


def test_row_count_fsck_detects_corrupt_manifest(spark, tmp_path):
    """r13 hardening (VERDICT r12): the ingest queries' commit-trail
    counts read the manifest's ``n_rows`` instead of counting data, so a
    buggy or hand-edited writer could silently change a declared output.
    ``verify_row_counts()`` must (a) pass a healthy chain whose
    ``n_rows`` equals ``read().count()`` at every version, and (b)
    DETECT a manifest whose recorded count no longer matches the
    referenced files' parquet footers."""
    import json

    t = VersionedParquetTable(str(tmp_path / "tbl"))
    t.write(spark.createDataFrame([(i, f"r{i}") for i in range(10)],
                                  "id long, s string"))
    t.append(spark.createDataFrame([(10, "r10"), (11, "r11")],
                                   "id long, s string"))
    # healthy chain: fsck clean, and the metadata count equals the data
    # count at every version (the by-construction invariant)
    assert t.verify_row_counts() == []
    for v in (0, 1):
        assert t.row_count(spark, version=v) == t.read(spark, version=v).count()

    mpath = os.path.join(t.log_dir, "00000001.json")
    with open(mpath) as fh:
        m = json.load(fh)
    m["n_rows"] = int(m["n_rows"]) + 7
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    bad = t.verify_row_counts()
    assert [b["version"] for b in bad] == [1]
    assert bad[0]["recorded"] == bad[0]["actual"] + 7
