"""Run the reference's kernel-benchmarks WORKLOAD SPECS against this
engine. The specs (kernel/kernel-benchmarks/src/test/resources/
workload_specs) are the reference's declarative conformance/benchmark
format: each directory holds a table plus spec.json files describing
reads (optionally at a version), snapshot construction, and writes (a
list of commits whose AddFiles come from data_files JSON). Executing
them here means this engine runs the reference's own workload
definitions, not just hand-picked scenarios.

Read checks are cell-level against the independent oracle from
test_golden_data_parity (naive replay + DuckDB decode); version-pinned
reads replay only the commits ≤ version.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable

WL = "/root/reference/kernel/kernel-benchmarks/src/test/resources/workload_specs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(WL), reason="workload specs absent")

APPEND = os.path.join(WL, "basic_append")
CATMAN = os.path.join(WL, "basic_catalog_managed")


def _replay_upto(table, upto=None):
    """Independent live-set replay of commits ≤ upto (all when None)."""
    logdir = os.path.join(table, "_delta_log")
    active = {}
    for n in sorted(x for x in os.listdir(logdir)
                    if x.endswith(".json") and x[:20].isdigit()):
        if upto is not None and int(n[:20]) > upto:
            break
        with open(os.path.join(logdir, n)) as f:
            for line in f:
                if not line.strip():
                    continue
                d = json.loads(line)
                if "add" in d:
                    active[d["add"]["path"]] = d["add"]
                elif "remove" in d:
                    active.pop(d["remove"]["path"], None)
    return active


def test_spec_read_latest(spark):
    """specs/read_latest: full read, cell-level vs the independent
    oracle."""
    from test_golden_data_parity import _assert_table_parity

    _assert_table_parity(spark, os.path.join(APPEND, "delta"))


def test_spec_read_v0(spark):
    """specs/read_v0: time-travel read at version 0 — live set and
    row count must match an independent replay of commit 0 only."""
    import pyarrow.parquet as pq

    table = os.path.join(APPEND, "delta")
    DeltaLog.clear_cache()
    want = _replay_upto(table, 0)
    snap = DeltaLog.for_table(table).snapshot_at(0)
    assert {f.path for f in snap.all_files} == set(want)
    expected_rows = sum(
        pq.ParquetFile(os.path.join(table, p)).metadata.num_rows
        for p in want)
    assert DeltaTable.forPath(spark, table).asOfVersion(0).count() \
        == expected_rows


def test_spec_snapshot_construction(spark):
    """specs/snapshot_latest + snapshot_v0: state reconstruction at
    both pins matches the independent replay."""
    table = os.path.join(APPEND, "delta")
    DeltaLog.clear_cache()
    log = DeltaLog.for_table(table)
    latest = log.update()
    assert {f.path for f in latest.all_files} == set(_replay_upto(table))
    v0 = log.snapshot_at(0)
    assert {f.path for f in v0.all_files} == set(_replay_upto(table, 0))


def test_spec_write_appends(spark, tmp_path):
    """specs/write_appends: two blind-append commits whose AddFiles
    (path/size/modificationTime/stats) come from the spec's data_files
    JSON. After committing through the optimistic transaction the
    snapshot must carry them, and the spec-supplied stats must drive
    file skipping."""
    from delta_spark.actions import AddFile
    from delta_spark.transaction import OptimisticTransaction

    src = os.path.join(APPEND, "delta")
    table = str(tmp_path / "wl_append")
    shutil.copytree(src, table)
    DeltaLog.clear_cache()
    log = DeltaLog.for_table(table)
    base_version = log.update().version
    spec_dir = os.path.join(APPEND, "specs", "write_appends")
    spec = json.load(open(os.path.join(spec_dir, "spec.json")))
    n_added = 0
    for commit in spec["commits"]:
        data = json.load(open(os.path.join(spec_dir,
                                           commit["data_files_path"])))
        adds = [AddFile(path=a["path"], partitionValues={},
                        size=a["size"],
                        modificationTime=a["modification_time"],
                        dataChange=True, stats=a.get("stats"))
                for a in data["adds"]]
        n_added += len(adds)
        txn = OptimisticTransaction(log)
        txn.commit(adds, "WRITE", {"mode": "Append"})
    snap = log.update()
    assert snap.version == base_version + len(spec["commits"])
    paths = {f.path for f in snap.all_files}
    assert "dummy_data_a.parquet" in paths
    assert len(paths) == len(_replay_upto(src)) + n_added
    # spec stats drive skipping: every dummy file has number ∈ [1, 10]
    survivors = {f.path for f in snap.files_for_scan("number > 1000")}
    assert not any(p.startswith("dummy_data") for p in survivors)
    survivors = {f.path for f in snap.files_for_scan("number <= 10")}
    assert any(p.startswith("dummy_data") for p in survivors)


def test_spec_catalog_managed_read_with_staged(spark):
    """basic_catalog_managed specs/read_with_staged (read_metadata):
    two backfilled commits + two STAGED commits ratified by the
    catalog (catalog_managed_info.json log_tail, max_ratified_version
    3). With the catalog registered, the snapshot tip must be the
    ratified version 3 with the staged commits' state applied."""
    from delta_spark import catalog_managed as CM

    info = json.load(open(os.path.join(CATMAN, "catalog_managed_info.json")))
    table = os.path.join(CATMAN, "delta")
    lp = os.path.join(table, "_delta_log")
    cat = CM.InMemoryCatalog()
    CM.CATALOGS["workload-spec"] = cat
    try:
        first_staged = 1 + max(
            int(n[:20]) for n in os.listdir(lp)
            if n.endswith(".json") and n[:20].isdigit())
        for i, ent in enumerate(info["log_tail"]):
            v = first_staged + i
            staged = os.path.join(lp, CM.STAGED_DIR,
                                  ent["staged_commit_file_name"])
            assert os.path.exists(staged)
            cat.ratify(lp, v, 1700000000000 + v, staged_path=staged)
        assert first_staged + len(info["log_tail"]) - 1 \
            == info["max_ratified_version"]
        DeltaLog.clear_cache()
        snap = DeltaLog.for_table(table).update()
        assert snap.version == info["max_ratified_version"]
        assert "catalogManaged" in (snap.protocol.readerFeatures or [])
        # the staged commits' file actions are applied
        staged_adds = set()
        for ent in info["log_tail"]:
            with open(os.path.join(lp, CM.STAGED_DIR,
                                   ent["staged_commit_file_name"])) as f:
                for line in f:
                    d = json.loads(line)
                    if "add" in d:
                        staged_adds.add(d["add"]["path"])
                    elif "remove" in d:
                        staged_adds.discard(d["remove"]["path"])
        have = {f.path for f in snap.all_files}
        assert staged_adds <= have
    finally:
        CM.CATALOGS.pop("workload-spec", None)
        DeltaLog.clear_cache()
