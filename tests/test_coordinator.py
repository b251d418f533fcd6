"""Coordinated commits: registration linearizes writers, staged files
back the unbackfilled tail, readers see commits before backfill."""

import glob
import json
import os
import threading

import pytest

from delta_spark import DeltaLog, DeltaTable, write_delta
from delta_spark import coordinator as C

CONF = {C.COORDINATOR_PROP: "filesystem"}


def _li(spark, sf_dir, n=300):
    from delta_spark.datasets import load_table

    return load_table(spark, sf_dir, "lineitem").limit(n)


def test_coordinated_end_to_end(spark, tmp_table, sf_dir):
    """Create → DELETE → UPDATE under the filesystem coordinator:
    every commit is staged + registered + backfilled, reads and
    history behave exactly like the classic path."""
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=CONF)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 40")
    dt.update({"l_discount": "l_discount + CAST(0.01 AS DOUBLE)"}, "l_quantity < 5")
    want = df.filter("NOT coalesce(l_quantity > 40, false)").count()
    assert dt.toDF().count() == want
    assert dt.asOfVersion(0).count() == df.count()
    assert dt.history().count() == 3

    log_path = os.path.join(tmp_table, "_delta_log")
    staged = glob.glob(os.path.join(log_path, C.STAGED_DIR, "*.json"))
    markers = glob.glob(os.path.join(log_path, C.MARKER_DIR, "*.json"))
    backfilled = glob.glob(os.path.join(log_path, "0*.json"))
    # registerBackfill drains the coordinator's tracked tail once the
    # classic files exist (markers removed, staged payloads remain)
    assert len(staged) == 3 and len(markers) == 0 and len(backfilled) == 3
    # backfilled content equals staged content
    v1 = os.path.join(log_path, "%020d.json" % 1)
    s1 = glob.glob(os.path.join(log_path, C.STAGED_DIR, "%020d.*.json" % 1))[0]
    assert open(v1).read() == open(s1).read()


def test_unbackfilled_commit_visible(spark, tmp_table, sf_dir):
    """Crash window: a commit that was registered but never backfilled
    is still served to readers (coordinator tail merge)."""
    df = _li(spark, sf_dir)
    # batchSize 100 → v1 stays registered-but-unbackfilled, exactly the
    # state a writer crash between registration and backfill leaves
    write_delta(df, tmp_table,
                configuration={**CONF, C.BATCH_SIZE_PROP: "100"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 40")
    log_path = os.path.join(tmp_table, "_delta_log")
    assert not os.path.exists(os.path.join(log_path, "%020d.json" % 1))
    DeltaLog.clear_cache()
    log = DeltaLog.for_table(tmp_table)
    assert log.latest_version() == 1
    snap = log.update()
    want = df.filter("NOT coalesce(l_quantity > 40, false)").count()
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == want
    assert snap.version == 1
    # history reads through the staged file too
    assert log.history()[0]["operation"] == "DELETE"


def test_registration_linearizes_writers(tmp_path):
    """Two writers racing for the same version: exactly one wins
    registration; with the in-memory coordinator (models an external
    service) and with the filesystem coordinator."""
    log_path = str(tmp_path / "_delta_log")
    os.makedirs(os.path.join(log_path, C.STAGED_DIR))
    for name in ("in-memory", "filesystem"):
        coord = C.COORDINATORS[name]
        results = []

        def race(i):
            try:
                coord.commit(log_path, 7, f"{log_path}/{C.STAGED_DIR}/x{i}.json", i)
                results.append(("win", i))
            except C.CommitConflictException:
                results.append(("lose", i))

        ts = [threading.Thread(target=race, args=(i,)) for i in range(8)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert sum(1 for r, _ in results if r == "win") == 1, name


def test_concurrent_appends_retry_through_coordinator(spark, tmp_table, sf_dir):
    """Disjoint blind appends from two transactions both land —
    the loser retries at the next version, like the classic path."""
    from delta_spark.io import write_delta as wd
    from delta_spark.transaction import OptimisticTransaction
    from delta_spark.writer import write_table_files

    df = _li(spark, sf_dir, 100)
    wd(df, tmp_table, configuration=CONF)
    log = DeltaLog.for_table(tmp_table)
    t1 = OptimisticTransaction(log)
    t2 = OptimisticTransaction(log)  # same read version
    a1 = write_table_files(df.limit(10), t1.snapshot)
    a2 = write_table_files(df.limit(20), t2.snapshot)
    v1 = t1.commit(list(a1), "WRITE", {}, {})
    v2 = t2.commit(list(a2), "WRITE", {}, {})
    assert {v1, v2} == {1, 2}
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 130


def test_unknown_coordinator_rejected(spark, tmp_table, sf_dir):
    with pytest.raises(ValueError, match="unknown commit coordinator"):
        write_delta(_li(spark, sf_dir, 50), tmp_table,
                    configuration={C.COORDINATOR_PROP: "nope"})


BATCH_CONF = {C.COORDINATOR_PROP: "filesystem",
              C.BATCH_SIZE_PROP: "3"}


def test_batch_backfill(spark, tmp_table, sf_dir):
    """batchSize=3: commits stay coordinator-only (no classic json)
    until a version divisible by 3 backfills the whole tail
    (AbstractBatchBackfillingCommitCoordinatorClient semantics)."""
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=BATCH_CONF)  # v0
    log_path = os.path.join(tmp_table, "_delta_log")

    def classic():
        return sorted(os.path.basename(p) for p in
                      glob.glob(os.path.join(log_path, "0*.json")))

    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 45")                          # v1
    dt.update({"l_discount": "CAST(0.0 AS DOUBLE)"}, "l_quantity < 2")  # v2
    # versions 1,2 are registered but not backfilled; reads still whole
    assert classic() == ["%020d.json" % 0]
    want = df.filter("NOT coalesce(l_quantity > 45, false)").count()
    DeltaLog.clear_cache()
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == want
    dt.update({"l_discount": "CAST(0.5 AS DOUBLE)"}, "l_quantity < 1")  # v3
    # v3 % 3 == 0 → tail backfilled, coordinator drained
    assert classic() == ["%020d.json" % v for v in range(4)]
    assert C.COORDINATORS["filesystem"].get_commits(log_path) == []
    assert DeltaTable.forPath(spark, tmp_table).history().count() == 4


def test_checkpoint_drains_tail(spark, tmp_table, sf_dir):
    """A checkpoint under coordinated commits first backfills the
    coordinator tail: the checkpointed prefix is always classic files."""
    write_delta(_li(spark, sf_dir, 50), tmp_table, configuration=BATCH_CONF)
    log = DeltaLog.for_table(tmp_table)
    log.checkpoint_interval = 5
    dt = DeltaTable.forPath(spark, tmp_table)
    for i in range(5):  # v1..v5; v5 hits the checkpoint interval
        dt.update({"l_discount": f"CAST(0.0{i} AS DOUBLE)"}, "l_quantity < 3")
    log_path = os.path.join(tmp_table, "_delta_log")
    cps = glob.glob(os.path.join(log_path, "*.checkpoint.parquet"))
    assert len(cps) == 1 and "%020d" % 5 in cps[0]
    # every version <= 5 was backfilled before the checkpoint was cut
    have = {os.path.basename(p) for p in glob.glob(os.path.join(log_path, "0*.json"))}
    assert {"%020d.json" % v for v in range(6)} <= have
    assert C.COORDINATORS["filesystem"].get_commits(log_path) == []
