"""AMT — adaptiveMetadata-preview (delta_spark/amt.py; reference
spark/.../delta/amt/: AMTWriteHelper, IncrementalAMTWriter,
AMTCheckpointProvider, TableFeature.scala:922, amt test suites)."""

import glob
import json
import os

import pytest
import pyarrow.parquet as pq

from delta_spark import DeltaLog, DeltaTable, write_delta
from delta_spark import amt as AMT
from delta_spark.datasets import load_table

def _conf(extra=None):
    c = {
        "delta_spark.catalogManaged.catalog": "filesystem",
        "delta.enableRowTracking": "true",
        "delta.enableDeletionVectors": "true",
        "delta.columnMapping.mode": "id",
        "delta.feature.domainMetadata": "supported",
        "delta.feature.adaptiveMetadata-preview": "supported",
        "delta.checkpointInterval": "3",
        AMT.ENTRIES_PER_LEAF_PROP: "4",
    }
    c.update(extra or {})
    return c


def _mk(spark, path, sf_dir, extra=None, n=40):
    li = load_table(spark, sf_dir, "lineitem").limit(n)
    write_delta(li.coalesce(2), path, configuration=_conf(extra))
    return DeltaTable.forPath(spark, path)


def _amt_commits(path):
    """versions whose commit json carries an inline checkpoint action."""
    log = DeltaLog.for_table(path)
    out = []
    for v in log.list_commit_versions():
        for kind, a in log.read_commit_actions(v):
            if kind == "checkpoint":
                out.append((v, a))
    return out


def _active_paths(path):
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(path).update()
    return {f.path: (f.num_records, f.deletionVector is not None)
            for f in snap.all_files}


def test_enablement_writes_full_tree(spark, tmp_table, sf_dir):
    """The enablement commit writes the first (full) manifest tree: a
    checkpoint action with a ContentRoot, protocol+metadata inline, and
    a parquet root under <table>/metadata with Iceberg V4 field ids."""
    dt = _mk(spark, tmp_table, sf_dir)
    cks = _amt_commits(tmp_table)
    assert len(cks) == 1 and cks[0][0] == 0
    ck = cks[0][1]
    assert ck["version"] == 0
    tags = ck["contentRoot"]["tags"]
    assert tags["isIncremental"] == "false"
    assert tags["lastManifestCommitWithFullRewrite"] == "0"
    assert ck["protocol"]["readerFeatures"] is not None
    assert "adaptiveMetadata-preview" in ck["protocol"]["readerFeatures"]

    root = os.path.join(tmp_table, ck["contentRoot"]["path"])
    assert os.path.getsize(root) == ck["contentRoot"]["sizeInBytes"]
    sch = pq.read_schema(root)
    fid = {n: sch.field(n).metadata.get(b"PARQUET:field_id")
           for n in sch.names}
    assert fid["content_type"] == b"134"
    assert fid["location"] == b"100"
    assert fid["tracking"] == b"147"
    assert fid["manifest_info"] == b"150"
    # nested ids too (Iceberg V4 readers resolve by id)
    tr = sch.field("tracking").type
    assert tr.field(0).name == "status"
    assert tr.field(0).metadata.get(b"PARQUET:field_id") == b"0"
    assert dt.toDF().count() == 40


def test_cadence_and_bootstrap_equivalence(spark, tmp_table, sf_dir):
    """Trees land at the checkpointInterval cadence; at every AMT
    version the bootstrapped state (tree + replay of the tail) equals
    the linear-replay state exactly — files, stats, DV descriptors."""
    dt = _mk(spark, tmp_table, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").limit(10)
    for _ in range(7):
        write_delta(li.coalesce(1), tmp_table, mode="append")
    cks = _amt_commits(tmp_table)
    versions = [v for v, _ in cks]
    assert versions == [0, 3, 6], versions
    # later trees are incremental and carry the full-rewrite marker
    assert cks[1][1]["contentRoot"]["tags"]["isIncremental"] == "true"
    assert cks[1][1]["contentRoot"]["tags"][
        "lastManifestCommitWithFullRewrite"] == "0"

    # bootstrap vs linear replay: byte-level action equality
    log = DeltaLog.for_table(tmp_table)
    v, ck = cks[-1]
    adds, proto, meta, domains, txns = AMT.load_state(log, ck)
    from delta_spark.snapshot import Snapshot
    lin = log.snapshot_at(v)
    got = {a.path: a for a in adds}
    assert set(got) == set(f.path for f in lin.all_files)
    for f in lin.all_files:
        b = got[f.path]
        assert b.stats == f.stats and b.size == f.size
        assert b.deletionVector == f.deletionVector
        assert b.baseRowId == f.baseRowId
    assert meta.id == lin.metadata.id
    assert set(proto.writerFeatures) == set(lin.protocol.writerFeatures)


def test_leaf_mdv_masks_deleted_files(spark, tmp_table, sf_dir):
    """A file resident in a LEAF that is later removed must be masked
    by the pointer's MDV in the next incremental tree — never re-read,
    never resurrected (IncrementalAMTWriter carryForwardLeaves)."""
    dt = _mk(spark, tmp_table, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").limit(10)
    # grow past entriesPerLeaf=4 so a full rewrite spills leaves
    for _ in range(5):
        write_delta(li.coalesce(1), tmp_table, mode="append")
    # force a FULL tree now so files become leaf-resident
    log = DeltaLog.for_table(tmp_table)
    DeltaLog.clear_cache()
    dtf = DeltaTable.forPath(spark, tmp_table)
    before = dtf.toDF().count()

    # find a leaf-resident file via the bootstrapped snapshot
    snap = DeltaLog.for_table(tmp_table).update()
    leaf_resident = [f for f in snap.all_files if f.backReference]
    if not leaf_resident:
        # not yet spilled: force another interval of commits
        for _ in range(3):
            write_delta(li.coalesce(1), tmp_table, mode="append")
        DeltaLog.clear_cache()
        snap = DeltaLog.for_table(tmp_table).update()
        leaf_resident = [f for f in snap.all_files if f.backReference]
    assert leaf_resident, "fixture must produce leaf-resident files"

    # rewrite-delete everything (DVs would mask rows, we want file
    # removal): delete ALL rows so files are dropped or fully masked
    dtf.delete()                                   # v: delete all
    for _ in range(3):                             # roll to the next AMT
        write_delta(li.coalesce(1), tmp_table, mode="append")
    cks = _amt_commits(tmp_table)
    v, ck = cks[-1]
    if ck["contentRoot"]["tags"]["isIncremental"] == "true":
        # some pointer must now carry a non-empty MDV
        log = DeltaLog.for_table(tmp_table)
        root = AMT._read_manifest(tmp_table, ck["contentRoot"]["path"])
        mdvs = [r["manifest_info"]["dv_cardinality"] for r in root
                if r["content_type"] == AMT.DATA_MANIFEST]
        assert any((c or 0) > 0 for c in mdvs), "MDV never engaged"
    # and the bootstrapped state stays exact
    log = DeltaLog.for_table(tmp_table)
    adds, *_ = AMT.load_state(log, ck)
    lin = log.snapshot_at(v)
    assert {a.path for a in adds} == {f.path for f in lin.all_files}
    DeltaLog.clear_cache()
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 30


def test_log_cleanup_uses_amt_ceiling(spark, tmp_table, sf_dir):
    """Commits below the newest tree are reclaimable: the AMT commit is
    the cleanup ceiling, and reads reconstruct from the tree alone."""
    from delta_spark.util import current_time_millis

    dt = _mk(spark, tmp_table, sf_dir,
             extra={"delta.logRetentionDuration": "interval 1 second"})
    li = load_table(spark, sf_dir, "lineitem").limit(10)
    for _ in range(4):
        write_delta(li.coalesce(1), tmp_table, mode="append")
    cks = _amt_commits(tmp_table)
    amt_v = cks[-1][0]
    assert amt_v >= 3
    log = DeltaLog.for_table(tmp_table)
    deleted = log.cleanup_expired_logs(
        now_ms=current_time_millis() + 5_000)
    assert deleted >= amt_v  # the commits below the tree (+ their crcs)
    remaining = log.list_commit_versions()
    assert remaining[0] == amt_v
    DeltaLog.clear_cache()
    dtf = DeltaTable.forPath(spark, tmp_table)
    assert dtf.toDF().count() == 80
    # time travel below the horizon: the reference error shape
    with pytest.raises(ValueError, match="Cannot time travel"):
        dtf.asOfVersion(0)


def test_vacuum_never_reclaims_manifests(spark, tmp_table, sf_dir):
    """<table>/metadata is table state: VACUUM (0h retention) must not
    touch it even though manifests are unreferenced by AddFiles."""
    from delta_spark.commands.maintenance import vacuum

    _mk(spark, tmp_table, sf_dir, extra={
        "delta_spark.catalogManaged.allowMaintenanceOps": "true"})
    li = load_table(spark, sf_dir, "lineitem").limit(10)
    for _ in range(3):
        write_delta(li.coalesce(1), tmp_table, mode="append")
    manifests = set(glob.glob(os.path.join(tmp_table, "metadata", "*")))
    assert manifests
    # back-date manifests so only the protection rule shields them
    import time
    back = time.time() - 86400
    for m in manifests:
        os.utime(m, (back, back))
    log = DeltaLog.for_table(tmp_table)
    victims = vacuum(spark, log, retention_hours=0)
    assert not [v for v in victims if os.sep + "metadata" + os.sep in v]
    assert set(glob.glob(os.path.join(tmp_table, "metadata", "*"))) \
        == manifests
    DeltaLog.clear_cache()
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 70


def test_full_rewrite_after_multiplier(spark, tmp_table, sf_dir):
    """After interval x FULL_REWRITE_MULTIPLIER commits since the last
    full tree, the next tree is a full re-materialization and resets
    the marker (AMTWriterManager.planMaintenance role)."""
    dt = _mk(spark, tmp_table, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").limit(5)
    # interval=3, multiplier=4 -> full rewrite due at version >= 12
    for _ in range(13):
        write_delta(li.coalesce(1), tmp_table, mode="append")
    cks = _amt_commits(tmp_table)
    flags = [(v, c["contentRoot"]["tags"]["isIncremental"],
              c["contentRoot"]["tags"]["lastManifestCommitWithFullRewrite"])
             for v, c in cks]
    fulls = [v for v, inc, _ in flags if inc == "false"]
    assert fulls[0] == 0 and len(fulls) >= 2, flags
    second_full = fulls[1]
    assert second_full >= 12
    # markers carried correctly: incrementals before the second full
    # point at 0, those after point at the second full
    for v, inc, marker in flags:
        if inc == "true":
            assert int(marker) == (0 if v < second_full else second_full)


def test_concurrent_appends_rebuild_tree_per_attempt(spark, tmp_table,
                                                     sf_dir):
    """Conflict retry on an AMT table: the losing writer's retry must
    rebuild its manifest tree against the absorbed state (the reference
    recomputes the AMT per commit attempt, AMTWriterManager.writeAMT).
    After racing appends across an AMT boundary, every tree version
    reconstructs exactly the linear-replay state."""
    import threading

    dt = _mk(spark, tmp_table, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").limit(10)
    write_delta(li.coalesce(1), tmp_table, mode="append")   # v1
    # race four appends across the v2/v3 interval boundary (interval=3)
    from delta_spark.transaction import OptimisticTransaction
    from delta_spark.writer import write_files

    log = DeltaLog.for_table(tmp_table)
    batches = [list(write_files(li, log.table_path, [])) for _ in range(4)]
    errs = []

    def worker(i):
        try:
            OptimisticTransaction(log).commit(batches[i], "WRITE")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    snap = log.update()
    assert snap.version == 5
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 90
    # every tree describes exactly the state of its version
    for v, ck in _amt_commits(tmp_table):
        adds, *_ = AMT.load_state(log, ck)
        lin = log.snapshot_at(v)
        assert {a.path for a in adds} == {f.path for f in lin.all_files}, v
