"""LogStore contract + conditional-write backend tests (reference
storage/src/main/java/io/delta/storage/LogStore.java:83-140 and the
S3+DynamoDB external-store scheme in storage-s3-dynamodb/).

The contract checker validates put-if-absent, read-after-write and
single-winner-under-contention with named violations; the engine then
runs end-to-end over the in-memory conditional-write backend (the seam
a DynamoDB/S3-conditional-put store fills), including concurrent and
fault-injected commit fuzz.
"""

import os
import random
import threading

import pytest

from delta_spark import DeltaLog, DeltaTable, write_delta
from delta_spark.datasets import load_table
from delta_spark.logstore import (
    ConcurrentModificationException,
    FaultInjectingLogStore,
    InMemoryLogStore,
    LocalLogStore,
    LogStoreContractViolation,
    check_logstore_contract,
)


@pytest.fixture()
def mem_store_log():
    """DeltaLog bound to the in-memory conditional-write backend for
    the duration of a test."""
    store = InMemoryLogStore()
    DeltaLog.clear_cache()
    DeltaLog.store_factory = lambda: store
    yield store
    DeltaLog.store_factory = LocalLogStore
    DeltaLog.clear_cache()


def test_contract_local_store(tmp_path):
    check_logstore_contract(LocalLogStore(), str(tmp_path))


def test_contract_in_memory_store(tmp_path):
    check_logstore_contract(InMemoryLogStore(), str(tmp_path))


def test_contract_catches_eventual_consistency(tmp_path):
    """A store with delayed listing visibility (bare pre-conditional-PUT
    S3) must FAIL the contract with the named clause — this is exactly
    why the reference ships the DynamoDB external store."""

    class EventuallyConsistentStore(InMemoryLogStore):
        def __init__(self):
            super().__init__()
            self._pending = set()

        def write_atomic(self, path, content):
            super().write_atomic(path, content)
            self._pending.add(os.path.abspath(path))

        def list_dir(self, path):
            names = super().list_dir(path)
            skip = {os.path.basename(p) for p in self._pending}
            self._pending.clear()   # visible on the NEXT listing
            return [n for n in names if n not in skip]

    with pytest.raises(LogStoreContractViolation, match="list-after-write"):
        check_logstore_contract(EventuallyConsistentStore(), str(tmp_path))


def test_contract_catches_lost_conditional_check(tmp_path):
    """A store whose put blindly overwrites (no conditional check) must
    fail the put-if-absent clause."""

    class BlindPutStore(InMemoryLogStore):
        def write_atomic(self, path, content):
            with self._lock:
                self._mem[os.path.abspath(path)] = content

    with pytest.raises(LogStoreContractViolation, match="put-if-absent"):
        check_logstore_contract(BlindPutStore(), str(tmp_path))


def test_engine_end_to_end_over_memory_store(spark, tmp_table, sf_dir,
                                             mem_store_log):
    """Full write → DML → time travel → checkpoint cycle with commits
    living in the external store: no <v>.json ever lands on disk, yet
    every read path (replay, history, time travel) works."""
    li = load_table(spark, sf_dir, "lineitem").limit(60)
    write_delta(li, tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 30")
    assert dt.toDF().count() == li.filter("l_quantity <= 30").count()
    assert dt.asOfVersion(0).count() == 60
    assert dt.history().count() == 2
    # commit JSONs are in memory only — nothing on the filesystem
    ld = os.path.join(tmp_table, "_delta_log")
    assert not (os.path.isdir(ld)
                and [n for n in os.listdir(ld) if n.endswith(".json")])
    assert len([p for p in mem_store_log._mem if p.endswith(".json")]) == 2
    # checkpoint parquet goes to disk (bulk bytes on the object store),
    # then replay stitches checkpoint + external-store tail together
    log = DeltaLog.for_table(tmp_table)
    log.write_checkpoint()
    write_delta(li.limit(5), tmp_table, mode="append")
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(tmp_table).update()
    assert snap.version == 2
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == \
        li.filter("l_quantity <= 30").count() + 5


def test_concurrent_appends_linearize_over_memory_store(
        spark, tmp_table, sf_dir, mem_store_log):
    """8 threads appending through the conditional-write backend: all
    land, versions are contiguous, total row count exact."""
    from delta_spark.transaction import OptimisticTransaction
    from delta_spark.writer import write_files

    li = load_table(spark, sf_dir, "lineitem").limit(10)
    write_delta(li, tmp_table)
    log = DeltaLog.for_table(tmp_table)
    adds_per_thread = [
        list(write_files(li, log.table_path, [])) for _ in range(8)]
    errs = []

    def worker(i):
        try:
            OptimisticTransaction(log).commit(adds_per_thread[i], "WRITE")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    snap = log.update()
    assert snap.version == 8
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 90


def test_fault_injected_commit_fuzz(spark, tmp_table, sf_dir):
    """Writers racing through a faulty store (transient pre-put errors
    and lost acks): every surviving state is consistent — versions
    contiguous, each version readable, row count equals the initial
    rows plus one batch per DURABLE commit (lost-ack commits are
    durable even though their writer saw an error)."""
    from delta_spark.transaction import OptimisticTransaction
    from delta_spark.writer import write_files

    li = load_table(spark, sf_dir, "lineitem").limit(10)
    rng = random.Random(99)

    for trial in range(4):
        path = tmp_table + "_ft%d" % trial
        store = FaultInjectingLogStore(
            InMemoryLogStore(), rng, fail_before=0.25, fail_after=0.2)
        DeltaLog.clear_cache()
        DeltaLog.store_factory = lambda s=store: s
        try:
            write_delta(li, path)       # v0 (may itself hit a fault)
        except IOError:
            DeltaLog.store_factory = InMemoryLogStore
            continue
        log = DeltaLog.for_table(path)
        base = log.update().version
        batches = [list(write_files(li, log.table_path, []))
                   for _ in range(6)]
        outcomes = []

        def worker(i):
            try:
                OptimisticTransaction(log).commit(batches[i], "WRITE")
                outcomes.append("ok")
            except IOError:
                outcomes.append("io")
            except ConcurrentModificationException:
                outcomes.append("conflict")

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        DeltaLog.store_factory = LocalLogStore
        DeltaLog.clear_cache()
        # re-read through the SAME store (without faults) for the check
        DeltaLog.store_factory = lambda s=store.inner: s
        DeltaLog.clear_cache()
        snap = DeltaLog.for_table(path).update()
        versions = DeltaLog.for_table(path).list_commit_versions()
        assert versions == list(range(len(versions))), \
            f"trial {trial}: versions not contiguous: {versions}"
        durable = snap.version - base
        n_ok = outcomes.count("ok")
        n_lost = len([p for p in store.lost_acks if p.endswith(".json")])
        assert n_ok <= durable <= n_ok + n_lost, \
            f"trial {trial}: durable={durable} ok={n_ok} lost_acks={n_lost}"
        assert DeltaTable.forPath(spark, path).toDF().count() == \
            10 * (1 + durable)
        DeltaLog.store_factory = LocalLogStore
        DeltaLog.clear_cache()


@pytest.mark.parametrize("seed", [13])
def test_conflict_fuzz_matrix_over_memory_store(spark, tmp_path, monkeypatch,
                                                mem_store_log, seed):
    """The phase-locked conflict fuzzer (test_concurrency_fuzz) runs
    green over the conditional-write backend too: the isolation and
    conflict guarantees come from the put-if-absent CONTRACT, not from
    the local filesystem (the seam an S3/DynamoDB backend fills)."""
    import test_concurrency_fuzz as fz

    fz.test_randomized_interleavings_serializable_equivalent(
        spark, tmp_path / "ri", monkeypatch, seed)
    fz.test_three_writer_chains_serializable_equivalent(
        spark, tmp_path / "tw", monkeypatch, seed)


# ---------------------------------------------------------------------------
# ExternalTableLogStore: the S3+DynamoDB scheme over a file-backed
# external table (reference storage-s3-dynamodb/BaseExternalLogStore)
# ---------------------------------------------------------------------------

@pytest.fixture()
def ext_store(tmp_path):
    from delta_spark.logstore import ExternalTableLogStore

    store = ExternalTableLogStore(str(tmp_path / "external_table"))
    DeltaLog.clear_cache()
    DeltaLog.store_factory = lambda: store
    yield store
    DeltaLog.store_factory = LocalLogStore
    DeltaLog.clear_cache()


def test_contract_external_table_store(tmp_path, ext_store):
    # run the contract INSIDE a _delta_log dir so the external-table
    # scheme (temp object + conditional entry + copy) is the code path
    # under test, not the plain-fs fallback
    workdir = tmp_path / "tbl" / "_delta_log"
    workdir.mkdir(parents=True)
    check_logstore_contract(ext_store, str(workdir))


def test_engine_end_to_end_over_external_store(spark, tmp_table, sf_dir,
                                               ext_store):
    li = load_table(spark, sf_dir, "lineitem").limit(300)
    write_delta(li, tmp_table)
    write_delta(li.limit(50), tmp_table, mode="append")
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF().count() == 350
    dt.delete("l_quantity > 30")
    kept = dt.toDF().count()
    assert 0 < kept < 350
    DeltaLog.clear_cache()
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == kept
    # entries acknowledged complete; TTL reaper removes them and the
    # table still reads (filesystem copies are the durable artifact)
    removed = ext_store.cleanup_expired(now=2**62)
    assert removed >= 3
    DeltaLog.clear_cache()
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == kept


def test_external_store_crash_recovery(tmp_path, ext_store):
    """A writer that crashes between the entry put (step 2, the commit
    point) and the filesystem copy (step 3) must not lose the commit:
    the next reader/lister completes the copy (fixDeltaLog)."""
    import json as _json

    table = str(tmp_path / "tbl")
    ld = os.path.join(table, "_delta_log")
    os.makedirs(ld)
    ext_store.write_atomic(os.path.join(ld, "%020d.json" % 0), '{"v":0}')

    # simulate the crash: temp object + incomplete entry, NO copy
    tmp_dir = os.path.join(ld, ".tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    temp_path = os.path.join(tmp_dir, "crashed_1.json")
    with open(temp_path, "w") as f:
        f.write('{"v":1}')
    rel = os.path.join("_delta_log", "%020d.json" % 1)
    ext_store._put_entry_if_absent(table, rel, {
        "tablePath": table, "fileName": rel, "tempPath": temp_path,
        "complete": False, "expireTime": None})
    target = os.path.join(ld, "%020d.json" % 1)
    assert not os.path.exists(target)

    # (a) a reader listing the log recovers the commit
    names = ext_store.list_dir(ld)
    assert "%020d.json" % 1 in names
    assert ext_store.read(target) == '{"v":1}'
    entry = ext_store._get_entry(table, rel)
    assert entry["complete"] is True

    # (b) a losing writer for the SAME version gets a conflict, never
    # a clobber
    with pytest.raises(ConcurrentModificationException):
        ext_store.write_atomic(target, '{"v":"liar"}')
    assert ext_store.read(target) == '{"v":1}'

    # (c) the NEXT version's writer sees a complete chain (step 1)
    ext_store.write_atomic(os.path.join(ld, "%020d.json" % 2), '{"v":2}')


def test_external_store_step1_detects_cleaned_prev(tmp_path, ext_store):
    """Step 1's guard: an entry for N-1 marked complete whose
    filesystem object is missing is unrecoverable corruption and must
    fail loudly, not commit on top of a hole."""
    table = str(tmp_path / "tbl")
    ld = os.path.join(table, "_delta_log")
    os.makedirs(ld)
    ext_store.write_atomic(os.path.join(ld, "%020d.json" % 0), '{"v":0}')
    os.unlink(os.path.join(ld, "%020d.json" % 0))
    with pytest.raises(OSError, match="external log store"):
        ext_store.write_atomic(os.path.join(ld, "%020d.json" % 1), '{"v":1}')


_MP_WORKER_SCRIPT = r"""
import sys
table, ext_root, wid, n = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
sys.path.insert(0, {repo!r})
from delta_spark.actions import AddFile
from delta_spark.log import DeltaLog
from delta_spark.logstore import ExternalTableLogStore
from delta_spark.transaction import DeltaConcurrentException, OptimisticTransaction
DeltaLog.store_factory = staticmethod(lambda: ExternalTableLogStore(ext_root))
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


def test_multiprocess_writers_linearize_over_external_store(
        tmp_path, ext_store, spark, sf_dir):
    """Four OS processes hammer the same table through the external-
    table scheme: every commit lands exactly once, versions are a
    contiguous range, and the final state holds every writer's files —
    the cross-process durability the r6 in-memory mock only pinned
    in-process."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    table = str(tmp_path / "tbl")
    li = load_table(spark, sf_dir, "lineitem").limit(20)
    write_delta(li, table)

    n_workers, n_commits = 4, 5
    script = _MP_WORKER_SCRIPT.format(repo=repo)
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, table,
         str(tmp_path / "external_table"), str(w), str(n_commits)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for w in range(n_workers)]
    landed: list[int] = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        landed.extend(int(x) for x in out.strip().split(","))

    # exactly one version per commit, contiguous, no lost updates
    assert len(landed) == n_workers * n_commits
    assert sorted(landed) == list(range(1, n_workers * n_commits + 1))
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(table).update()
    paths = {f.path for f in snap.all_files}
    for w in range(n_workers):
        for k in range(n_commits):
            assert f"w{w}_{k}.parquet" in paths


@pytest.mark.parametrize("seed", [17])
def test_conflict_fuzz_matrix_over_external_store(spark, tmp_path, monkeypatch,
                                                  ext_store, seed):
    """The phase-locked conflict fuzzer also holds over the external-
    table scheme — isolation comes from the conditional ENTRY put, with
    the filesystem demoted to a plain object store."""
    import test_concurrency_fuzz as fz

    fz.test_randomized_interleavings_serializable_equivalent(
        spark, tmp_path / "ri", monkeypatch, seed)
    fz.test_three_writer_chains_serializable_equivalent(
        spark, tmp_path / "tw", monkeypatch, seed)
