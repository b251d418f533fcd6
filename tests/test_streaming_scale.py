"""Streaming source at metadata scale: the initial-snapshot drain over
a huge table must plan from the column-pruned checkpoint index
(streaming.py _build_lazy_snapshot_index), never from a driver-built
list of every AddFile (reference DeltaSourceSnapshot keeps the file
list a Dataset for the same reason)."""

import json
import os
import time

from delta_spark import DeltaLog
from delta_spark.streaming import DeltaStreamReader


def _synth_log(base_dir, n_commits=60, n_per=2500):
    """plan_1m_files-style synthetic log: n_commits x n_per AddFiles +
    a distributed classic checkpoint (typed stats / _last_checkpoint)."""
    ld = os.path.join(base_dir, "_delta_log")
    os.makedirs(ld)
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "p", "type": "string", "nullable": True, "metadata": {}}]})
    with open(os.path.join(ld, "%020d.json" % 0), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 1,
                                         "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "streamscale", "format": {"provider": "parquet",
                                            "options": {}},
            "schemaString": schema, "partitionColumns": ["p"],
            "configuration": {}, "createdTime": 1}}))
    for v in range(1, n_commits + 1):
        with open(os.path.join(ld, "%020d.json" % v), "w") as f:
            f.write("\n".join(json.dumps({"add": {
                "path": f"p={v % 10}/f_{v}_{i}.parquet",
                "partitionValues": {"p": str(v % 10)},
                "size": 1 << 20, "modificationTime": v, "dataChange": True,
                "stats": json.dumps({"numRecords": 1000})}})
                for i in range(n_per)))
    DeltaLog.clear_cache()
    return DeltaLog.for_table(base_dir)


def test_initial_snapshot_plans_lazily_at_150k_files(spark, tmp_path):
    table = str(tmp_path / "big")
    log = _synth_log(table)                       # 150k adds
    log.write_checkpoint_distributed(spark)       # parquet base
    DeltaLog.clear_cache()

    t0 = time.time()
    r = DeltaStreamReader(None, {"path": table,
                                 "maxfilespertrigger": "100"})
    off0 = r.initialOffset()
    off1 = r._latest_offset()
    parts = list(r.partitions(off0, off1))
    first_batch = time.time() - t0

    assert off0["isInitialSnapshot"] and off0["index"] == -1
    assert off1["index"] == 99                    # cap honored
    assert len(parts) == 100
    # the LAZY index served the batch: the materialized-list cache must
    # never have been populated (that is the 10⁶-AddFile driver build)
    assert getattr(r, "_snap_files_cache", None) is None
    assert getattr(r, "_snap_index_cache", None) is not None
    idx = r._snap_index_cache[1]
    assert idx.count == 60 * 2500
    # planning the first capped batch over 150k files stays interactive
    assert first_batch < 10.0, f"first microbatch planning {first_batch}s"

    # a mid-snapshot batch hydrates ONLY its slice, in path order
    off2 = r._latest_offset()
    parts2 = list(r.partitions(off1, off2))
    assert len(parts2) == 100
    assert {p.file_path for p in parts} .isdisjoint(
        {p.file_path for p in parts2})

    # slice content parity with the eager path on a sample window
    eager = sorted((f.path for v in range(1, 61)
                    for f in r._commit_adds(v)), )
    lazy_slice = idx.files_slice(1000, 1010)
    assert [f.path for f in lazy_slice] == eager[1000:1010]
    # sizes feed the byte cap
    assert idx.size_at(0) == 1 << 20


def test_lazy_index_respects_commit_tail(spark, tmp_path):
    """Adds/removes AFTER the checkpoint must reconcile into the index
    (remove drops a checkpointed file; re-add supersedes it)."""
    table = str(tmp_path / "tail")
    log = _synth_log(table, n_commits=50, n_per=2500)   # 125k adds
    log.write_checkpoint_distributed(spark)
    latest = log.latest_version()
    ld = os.path.join(table, "_delta_log")
    victim = "p=1/f_1_0.parquet"
    with open(os.path.join(ld, "%020d.json" % (latest + 1)), "w") as f:
        f.write(json.dumps({"remove": {"path": victim,
                                       "dataChange": False}}) + "\n")
        f.write(json.dumps({"add": {
            "path": "p=9/f_tail_readd.parquet",
            "partitionValues": {"p": "9"}, "size": 7,
            "modificationTime": 99, "dataChange": False}}))
    DeltaLog.clear_cache()

    r = DeltaStreamReader(None, {"path": table,
                                 "maxfilespertrigger": "50"})
    r.initialOffset()
    idx = r._snapshot_index(latest + 1)
    assert idx.count == 50 * 2500                  # -1 removed, +1 added
    all_paths = [f.path for f in idx.files_slice(0, idx.count)]
    assert victim not in all_paths
    assert "p=9/f_tail_readd.parquet" in all_paths
    assert all_paths == sorted(all_paths)


def test_cdf_stream_plans_lazily_over_big_snapshot(spark, tmp_path):
    """readChangeFeed streams plan their first microbatch from the
    SAME lazy checkpoint index as the plain source: the initial
    snapshot's synthesized-insert partitions hydrate only their own
    slice, and the materialized-list fallback never fires (mirrors
    stream_plan_1m's assertion for the CDF leg)."""
    table = str(tmp_path / "bigcdf")
    log = _synth_log(table)                       # 150k adds
    log.write_checkpoint_distributed(spark)
    DeltaLog.clear_cache()

    t0 = time.time()
    r = DeltaStreamReader(None, {"path": table,
                                 "maxfilespertrigger": "100",
                                 "readchangefeed": "true"})
    off0 = r.initialOffset()
    off1 = r._latest_offset()
    parts = list(r.partitions(off0, off1))
    first_batch = time.time() - t0

    assert off0["isInitialSnapshot"] and off0["index"] == -1
    assert len(parts) == 100                      # cap honored
    # initial-snapshot CDF partitions are synthesized inserts stamped
    # with the snapshot version
    assert all(p.is_cdf and p.change_type == "insert" for p in parts)
    # the lazy index served the batch — never the 10^6-AddFile driver
    # materialization
    assert getattr(r, "_snap_files_cache", None) is None
    assert getattr(r, "_snap_index_cache", None) is not None
    assert r._snap_index_cache[1].count == 60 * 2500
    assert first_batch < 10.0, f"first CDF microbatch {first_batch}s"

    # the next batch hydrates a DISJOINT slice
    off2 = r._latest_offset()
    parts2 = list(r.partitions(off1, off2))
    assert len(parts2) == 100
    assert {p.file_path for p in parts}.isdisjoint(
        {p.file_path for p in parts2})


def test_lazy_index_shared_across_reader_constructions(spark, tmp_path):
    """r10: the lazy snapshot index is a pure function of
    (log, version), so a SECOND reader construction in the same
    process (stream restart, concurrent stream on the same table)
    must reuse the instance cached on the DeltaLog instead of
    re-paying the pyarrow checkpoint sort."""
    table = str(tmp_path / "big2")
    log = _synth_log(table)
    log.write_checkpoint_distributed(spark)
    DeltaLog.clear_cache()

    opts = {"path": table, "maxfilespertrigger": "100"}
    r1 = DeltaStreamReader(None, opts)
    r1.initialOffset()
    list(r1.partitions(r1.initialOffset(), r1._latest_offset()))
    idx1 = r1._snap_index_cache[1]
    assert DeltaLog.for_table(table)._stream_snap_index_cache[1] is idx1

    r2 = DeltaStreamReader(None, opts)
    list(r2.partitions(r2.initialOffset(), r2._latest_offset()))
    assert r2._snap_index_cache[1] is idx1        # shared, not rebuilt

    # an exclude-filtered reader must NOT consume the shared index
    # (its file list depends on the option) nor poison the cache
    r3 = DeltaStreamReader(None, {**opts,
                                  "excluderegex": r"p=9/.*"})
    parts3 = list(r3.partitions(r3.initialOffset(), r3._latest_offset()))
    assert all("p=9/" not in p.file_path for p in parts3)
    assert DeltaLog.for_table(table)._stream_snap_index_cache[1] is idx1

    # cache dies with the log instance: a fresh process state rebuilds
    DeltaLog.clear_cache()
    r4 = DeltaStreamReader(None, opts)
    list(r4.partitions(r4.initialOffset(), r4._latest_offset()))
    assert r4._snap_index_cache[1] is not idx1
