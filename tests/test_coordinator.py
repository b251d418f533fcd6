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


# ---------------------------------------------------------------------------
# ExternalTableCommitCoordinator: the DynamoDB scheme over a file-backed
# external table (reference dynamodb-commit-coordinator/
# DynamoDBCommitCoordinatorClient.java)
# ---------------------------------------------------------------------------

def _ext_conf(root):
    return {C.COORDINATOR_PROP: "external",
            C.COORDINATOR_CONF_PROP: json.dumps({"externalRoot": str(root)})}


def test_external_coordinator_end_to_end(spark, tmp_table, sf_dir, tmp_path):
    """Create → DELETE → UPDATE through the external coordinator; the
    head-pointer records live OUTSIDE the table's filesystem and mark
    backfilled after the classic file lands."""
    root = tmp_path / "coord_table"
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=_ext_conf(root))
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 40")
    dt.update({"l_discount": "l_discount + CAST(0.01 AS DOUBLE)"},
              "l_quantity < 5")
    want = df.filter("NOT coalesce(l_quantity > 40, false)").count()
    assert dt.toDF().count() == want
    assert dt.asOfVersion(0).count() == df.count()
    assert dt.history().count() == 3
    # records exist in the external table, all backfilled (batch 1)
    recs = glob.glob(os.path.join(str(root), "*", "version-*.json"))
    assert len(recs) == 3
    for p in recs:
        with open(p) as f:
            assert json.load(f)["backfilled"] is True


def test_external_coordinator_head_pointer_semantics(tmp_path):
    """The conditional-update contract
    (DynamoDBCommitCoordinatorClient.java:186-198): exactly one winner
    per version (retryable loss), continuity gaps unretryable, path
    pinned at onboarding."""
    coord = C.ExternalTableCommitCoordinator(str(tmp_path / "ext"))
    lp = str(tmp_path / "tbl" / "_delta_log")
    coord.commit(lp, 5, os.path.join(lp, C.STAGED_DIR, "a.json"), 100)
    # same version again -> retryable conflict
    with pytest.raises(C.CommitConflictException):
        coord.commit(lp, 5, os.path.join(lp, C.STAGED_DIR, "b.json"), 101)
    # stale writer (head moved past it) -> retryable conflict
    coord.commit(lp, 6, os.path.join(lp, C.STAGED_DIR, "c.json"), 102)
    with pytest.raises(C.CommitConflictException):
        coord.commit(lp, 6, os.path.join(lp, C.STAGED_DIR, "d.json"), 103)
    # continuity gap -> unretryable
    with pytest.raises(ValueError, match="gap"):
        coord.commit(lp, 9, os.path.join(lp, C.STAGED_DIR, "e.json"), 104)
    # unbackfilled tail served from the records
    tail = coord.get_commits(lp)
    assert [c.version for c in tail] == [5, 6]
    coord.register_backfill(lp, 5)
    assert [c.version for c in coord.get_commits(lp)] == [6]


def test_external_coordinator_registration_linearizes(tmp_path):
    """Thread race for one version: exactly one winner."""
    import threading as th

    coord = C.ExternalTableCommitCoordinator(str(tmp_path / "ext"))
    lp = str(tmp_path / "tbl" / "_delta_log")
    coord.commit(lp, 0, os.path.join(lp, C.STAGED_DIR, "seed.json"), 1)
    winners, losers = [], []
    barrier = th.Barrier(8)

    def attempt(i):
        barrier.wait()
        try:
            coord.commit(lp, 1,
                         os.path.join(lp, C.STAGED_DIR, f"w{i}.json"), 2)
            winners.append(i)
        except C.CommitConflictException:
            losers.append(i)

    ts = [th.Thread(target=attempt, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(winners) == 1 and len(losers) == 7


_EXT_MP_WORKER = r"""
import sys, json
table, root, wid, n = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
sys.path.insert(0, {repo!r})
from delta_spark.actions import AddFile
from delta_spark.log import DeltaLog
from delta_spark.transaction import DeltaConcurrentException, OptimisticTransaction
landed = []
for k in range(n):
    while True:
        DeltaLog.clear_cache()
        log = DeltaLog.for_table(table)
        txn = OptimisticTransaction(log)
        try:
            v = txn.commit([AddFile(path=f"w{{wid}}_{{k}}.parquet", size=1,
                                    modificationTime=1)], "WRITE")
            landed.append(v)
            break
        except DeltaConcurrentException:
            continue
print(",".join(map(str, landed)))
"""


def test_external_coordinator_multiprocess_writers(spark, tmp_table, sf_dir,
                                                   tmp_path):
    """Four OS processes race through the external coordinator (the
    coordinator comes from TABLE CONFIG, so workers pick it up from
    the snapshot): contiguous versions, no lost updates."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = tmp_path / "coord_table"
    write_delta(_li(spark, sf_dir, 20), tmp_table,
                configuration=_ext_conf(root))

    n_workers, n_commits = 4, 5
    script = _EXT_MP_WORKER.format(repo=repo)
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, tmp_table, str(root),
         str(w), str(n_commits)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for w in range(n_workers)]
    landed = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        landed.extend(int(x) for x in out.strip().split(","))
    assert sorted(landed) == list(range(1, n_workers * n_commits + 1))
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(tmp_table).update()
    paths = {f.path for f in snap.all_files}
    for w in range(n_workers):
        for k in range(n_commits):
            assert f"w{w}_{k}.parquet" in paths


def test_marker_slot_resurrection_is_refused(tmp_path, monkeypatch):
    """TOCTOU lost-write (r10, same hole class as the catalog's ratify
    guard): between the already-backfilled pre-check and the marker
    put-if-absent, the version's true winner can register + backfill +
    reclaim its marker — the stale writer's marker then lands on the
    resurrected slot and its commit would be acknowledged without ever
    reaching the log. The post-write classic-file check must withdraw
    it as a retryable conflict."""
    log_path = str(tmp_path / "_delta_log")
    os.makedirs(os.path.join(log_path, C.STAGED_DIR))
    co = C.FileSystemCommitCoordinator()
    # the winner's durable end-state: classic file present, marker gone
    classic = os.path.join(log_path, "%020d.json" % 0)
    with open(classic, "w") as f:
        f.write('{"commitInfo":{"txnId":"winner"}}')
    staged = os.path.join(log_path, C.STAGED_DIR, "00.loser.json")
    with open(staged, "w") as f:
        f.write('{"commitInfo":{"txnId":"loser"}}')

    # simulate the race window: the loser's pre-check ran before the
    # winner's backfill became visible
    real_exists = os.path.exists
    window = {"open": True}

    def stale_exists(p):
        if (window["open"] and p == classic):
            window["open"] = False
            return False
        return real_exists(p)

    monkeypatch.setattr(C.os.path, "exists", stale_exists)
    with pytest.raises(C.CommitConflictException, match="in flight"):
        co.commit(log_path, 0, staged, 123)
    monkeypatch.undo()
    # ghost marker withdrawn; winner's log intact; tail merge clean
    assert not real_exists(os.path.join(log_path, C.MARKER_DIR,
                                        "%020d.json" % 0))
    with open(classic) as f:
        assert "winner" in f.read()
    assert co.get_commits(log_path) == []

    # identical content (our own backfill raced ahead) stays accepted
    staged2 = os.path.join(log_path, C.STAGED_DIR, "00.same.json")
    with open(staged2, "w") as f:
        f.write('{"commitInfo":{"txnId":"winner"}}')
    window["open"] = True
    monkeypatch.setattr(C.os.path, "exists", stale_exists)
    got = co.commit(log_path, 0, staged2, 124)
    assert got.version == 0
