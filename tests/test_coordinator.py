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
    assert len(staged) == 3 and len(markers) == 3 and len(backfilled) == 3
    # backfilled content equals staged content
    v1 = os.path.join(log_path, "%020d.json" % 1)
    m1 = json.load(open(os.path.join(log_path, C.MARKER_DIR, "%020d.json" % 1)))
    s1 = os.path.join(log_path, C.STAGED_DIR, m1["stagedFile"])
    assert open(v1).read() == open(s1).read()


def test_unbackfilled_commit_visible(spark, tmp_table, sf_dir):
    """Crash window: a commit that was registered but never backfilled
    is still served to readers (coordinator tail merge)."""
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=CONF)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 40")
    log_path = os.path.join(tmp_table, "_delta_log")
    # simulate the crash: drop the backfilled file for version 1,
    # keeping the staged file + coordinator registration
    os.unlink(os.path.join(log_path, "%020d.json" % 1))
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
