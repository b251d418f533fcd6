"""Distributed snapshot state reconstruction (DeltaLog.state_df) —
parity with the driver-side python replay on a synthetic many-file log
(reference Snapshot.scala:598 stateReconstruction)."""

import json
import os

from delta_spark.log import DeltaLog

_SCHEMA = json.dumps({
    "type": "struct",
    "fields": [{"name": "k", "type": "long", "nullable": True, "metadata": {}}]})


def _commit(log_dir: str, v: int, lines: list[dict]) -> None:
    with open(os.path.join(log_dir, "%020d.json" % v), "w") as f:
        f.write("\n".join(json.dumps(x) for x in lines))


def _synth_log(base: str, n_batches: int = 40, adds_per: int = 50):
    """Log-only table: thousands of AddFiles, periodic removes, no
    parquet data (replay never opens data files)."""
    ld = os.path.join(base, "_delta_log")
    os.makedirs(ld)
    _commit(ld, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "synth", "format": {"provider": "parquet", "options": {}},
                      "schemaString": _SCHEMA, "partitionColumns": ["p"],
                      "configuration": {}, "createdTime": 1}},
    ])
    v = 1
    for b in range(n_batches):
        lines = [{"add": {"path": f"p={b % 5}/f_{b}_{i}.parquet",
                          "partitionValues": {"p": str(b % 5)},
                          "size": 100 + i, "modificationTime": 1000 + v,
                          "dataChange": True,
                          "stats": json.dumps({"numRecords": i + 1})}}
                 for i in range(adds_per)]
        if b > 0 and b % 7 == 0:
            # tombstone an earlier file
            lines.append({"remove": {"path": f"p={(b - 1) % 5}/f_{b - 1}_0.parquet",
                                     "deletionTimestamp": 2000 + v,
                                     "dataChange": True}})
        _commit(ld, v, lines)
        v += 1
    return ld, v


def _key_set(files):
    return {(f.path, f.size, tuple(sorted((f.partitionValues or {}).items())))
            for f in files}


def test_distributed_state_reconstruction_parity(spark, tmp_path):
    base = str(tmp_path / "synth")
    os.makedirs(base)
    ld, v = _synth_log(base)
    log = DeltaLog.for_table(base)
    snap = log.update()
    want = _key_set(snap.all_files)
    assert len(want) == 40 * 50 - 5  # 5 tombstoned

    rows = log.state_df(spark).collect()
    got = {(r.path, r.size, tuple(sorted((r.partitionValues or {}).items())))
           for r in rows}
    assert len(rows) == len(got) == len(want)
    assert got == want


def test_distributed_replay_across_checkpoint(spark, tmp_path):
    """Checkpoint parquet + later commit JSONs reconcile together; a
    post-checkpoint remove kills a checkpointed add, and a DV-carrying
    re-add supersedes its predecessor."""
    base = str(tmp_path / "synth2")
    os.makedirs(base)
    ld, v = _synth_log(base, n_batches=10, adds_per=20)
    log = DeltaLog.for_table(base)
    log.write_checkpoint(log.update())
    # post-checkpoint commits: new adds, a remove of a checkpointed
    # file, and a DV re-add of another
    _commit(ld, v, [
        {"add": {"path": "p=0/late_0.parquet", "partitionValues": {"p": "0"},
                 "size": 7, "modificationTime": 99, "dataChange": True}},
        {"remove": {"path": "p=0/f_0_0.parquet", "deletionTimestamp": 9,
                    "dataChange": True}},
    ])
    _commit(ld, v + 1, [
        {"remove": {"path": "p=0/f_0_1.parquet", "deletionTimestamp": 9,
                    "dataChange": True}},
        {"add": {"path": "p=0/f_0_1.parquet", "partitionValues": {"p": "0"},
                 "size": 101, "modificationTime": 1001, "dataChange": True,
                 "deletionVector": {"storageType": "u", "pathOrInlineDv": "ab12",
                                    "offset": 1, "sizeInBytes": 40,
                                    "cardinality": 3}}},
    ])
    DeltaLog.clear_cache()
    log = DeltaLog.for_table(base)
    snap = log.update()
    want = _key_set(snap.all_files)
    df = log.state_df(spark)
    rows = df.collect()
    got = {(r.path, r.size, tuple(sorted((r.partitionValues or {}).items())))
           for r in rows}
    assert got == want
    assert "p=0/f_0_0.parquet" not in {r.path for r in rows}
    dvrow = [r for r in rows if r.path == "p=0/f_0_1.parquet"]
    assert len(dvrow) == 1 and dvrow[0].size == 101
    dv = json.loads(dvrow[0].deletionVector)
    assert dv["storageType"] == "u" and dv["cardinality"] == 3
    # stats survive as JSON strings (the skipping-reader contract)
    stats = [r.stats for r in rows if r.path == "p=1/f_1_3.parquet"]
    assert stats and json.loads(stats[0])["numRecords"] == 4
