"""Review repro: classic checkpoint newer than the AMT tree drops
backReferences -> removes can't mask leaf positions -> deleted file
resurrects in the next tree."""

import json
import os

from delta_spark import DeltaLog, DeltaTable, write_delta
from delta_spark import amt as AMT
from delta_spark.datasets import load_table


def test_backref_loss_resurrects_deleted_file(spark, tmp_table, sf_dir):
    conf = {
        "delta_spark.catalogManaged.catalog": "filesystem",
        "delta.enableRowTracking": "true",
        "delta.enableDeletionVectors": "true",
        "delta.columnMapping.mode": "id",
        "delta.feature.domainMetadata": "supported",
        "delta.checkpointInterval": "3",
        AMT.ENTRIES_PER_LEAF_PROP: "4",
    }
    li = load_table(spark, sf_dir, "lineitem").limit(60)
    # v0: create WITHOUT the AMT feature (classic cadence anchored at 0)
    write_delta(li.coalesce(2), tmp_table, configuration=conf)
    write_delta(li.limit(10).coalesce(2), tmp_table, mode="append")  # v1
    dt = DeltaTable.forPath(spark, tmp_table)
    # v2: enablement commit -> first full AMT tree at v2 (off-phase
    # with the classic checkpoints at 3, 6, ...)
    dt.addFeatureSupport("adaptiveMetadata-preview")
    write_delta(li.limit(10).coalesce(2), tmp_table, mode="append")  # v3 (+classic ckpt)
    write_delta(li.limit(10).coalesce(2), tmp_table, mode="append")  # v4
    write_delta(li.limit(10).coalesce(2), tmp_table, mode="append")  # v5 (+AMT tree 2+3)
    write_delta(li.limit(10).coalesce(2), tmp_table, mode="append")  # v6 (+classic ckpt 6 > AMT 5)

    log = DeltaLog.for_table(tmp_table)
    amt_v, _ = AMT.find_latest_checkpoint(log, log.latest_version())
    ckpts = log.list_checkpoint_versions()
    print("AMT at", amt_v, "classic ckpts", ckpts)
    assert ckpts and ckpts[-1] > amt_v, "need classic ckpt newer than AMT"

    # fresh process: snapshot now comes from the classic checkpoint
    DeltaLog.clear_cache()
    log = DeltaLog.for_table(tmp_table)
    snap = log.update()
    n_backref = sum(1 for f in snap.active.values() if f.backReference)
    print("backrefs after classic-checkpoint load:", n_backref,
          "of", len(snap.active))

    before = {f.path for f in snap.all_files}
    # v7: delete every row of the two v0 files -> whole-file RemoveFiles
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity >= 0")  # removes all files
    # v8: append -> v8 = 5+3 -> incremental AMT tree
    write_delta(li.limit(10).coalesce(2), tmp_table, mode="append")

    log = DeltaLog.for_table(tmp_table)
    # inspect v7 removes for backReference
    rem_br = []
    for kind, a in log.read_commit_actions(7):
        if kind == "remove":
            rem_br.append(a.backReference)
    print("v7 remove backrefs:", rem_br)

    amt_v2, ckd = AMT.find_latest_checkpoint(log, log.latest_version())
    print("newest AMT at", amt_v2)
    assert amt_v2 == 8
    adds, *_ = AMT.load_state(log, ckd)
    tree_paths = {a.path for a in adds}
    live = {f.path for f in log.update().all_files}
    resurrected = tree_paths - live
    print("paths in v8 tree but not live:", len(resurrected))
    assert not resurrected, (
        f"deleted files resurrected in the AMT tree: {sorted(resurrected)[:3]}")
