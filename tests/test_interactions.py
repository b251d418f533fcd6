"""Feature-interaction coverage: crossing the newest log-level features
(V2 checkpoints, minor log compaction) with column mapping, portable
deletion vectors, partitioning, CDF, and restore — the combinations
where round-1 probing kept finding real bugs."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from delta_spark import DeltaLog, DeltaTable, write_delta
from delta_spark.datasets import load_table
from delta_spark.util import current_time_millis


def test_v2_checkpoint_mapping_dv_partitioned(spark, tmp_table, sf_dir):
    """V2 checkpoint replay must preserve partition values, physical
    (column-mapped) names, and portable DV descriptors together."""
    orders = load_table(spark, sf_dir, "orders").limit(400)
    write_delta(orders, tmp_table, partition_by=["o_orderstatus"],
                configuration={"delta.enableDeletionVectors": "true",
                               "delta_spark.dv.portable": "true",
                               "delta.checkpointPolicy": "v2"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.enableColumnMapping()
    dt.renameColumn("o_totalprice", "price")
    dt.delete("price > 200000")          # portable DVs on mapped table
    snap = DeltaLog.for_table(tmp_table).update()
    assert any(f.deletionVector for f in snap.all_files)
    expect = dt.toDF().count()
    expect_f = dt.toDF().filter("o_orderstatus = 'F'").count()

    log = DeltaLog.for_table(tmp_table)
    log.write_checkpoint(snap)
    # wipe the commit jsons: state must come from the v2 checkpoint alone
    for v in log.list_commit_versions():
        os.unlink(log.commit_file(v))
    DeltaLog.clear_cache()
    dt2 = DeltaTable.forPath(spark, tmp_table)
    assert dt2.toDF().count() == expect
    assert "price" in dt2.toDF().columns
    snap2 = DeltaLog.for_table(tmp_table).update()
    assert any(f.deletionVector for f in snap2.all_files)
    # partition pruning still works through the replayed checkpoint
    pruned = snap2.files_for_scan("o_orderstatus = 'F'")
    assert len(pruned) < snap2.num_files
    assert dt2.toDF("o_orderstatus = 'F'").count() == expect_f


def test_compaction_preserves_rename_dv_and_restore(spark, tmp_table, sf_dir):
    """A compacted range spanning a rename + DV delete must replay to
    the same state; RESTORE across the compacted range still works."""
    li = load_table(spark, sf_dir, "lineitem").limit(500)
    write_delta(li, tmp_table,
                configuration={"delta.enableDeletionVectors": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.enableColumnMapping()             # v1
    dt.renameColumn("l_quantity", "qty")  # v2
    dt.delete("qty > 40")                # v3 (DV)
    write_delta(dt.toDF().limit(20), tmp_table, mode="append")  # v4
    log = DeltaLog.for_table(tmp_table)
    snap = log.update()
    expect = dt.toDF().count()

    log.compact_log(1, 4)
    for v in range(1, 4):
        os.unlink(log.commit_file(v))
    DeltaLog.clear_cache()
    dt2 = DeltaTable.forPath(spark, tmp_table)
    assert dt2.toDF().count() == expect
    assert "qty" in dt2.toDF().columns
    snap2 = DeltaLog.for_table(tmp_table).update()
    assert snap2.num_files == snap.num_files
    assert any(f.deletionVector for f in snap2.all_files)

    # metadata-only ops after the compacted replay still function
    dt2.update({"qty": "qty + 1"}, "qty < 5")
    assert dt2.toDF().count() == expect


def test_compaction_cdf_unaffected(spark, tmp_table, sf_dir):
    """CDF reads version-addressed change files; a compaction overlay
    must not change table_changes output."""
    cust = load_table(spark, sf_dir, "customer").limit(100)
    write_delta(cust, tmp_table,
                configuration={"delta.enableChangeDataFeed": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("c_custkey % 5 = 0")       # v1
    dt.update({"c_acctbal": "c_acctbal + 1"}, "c_custkey % 7 = 0")  # v2
    before = (dt.table_changes(0, 2).groupBy("_change_type").count()
              .orderBy("_change_type").collect())
    log = DeltaLog.for_table(tmp_table)
    log.compact_log(0, 2)
    DeltaLog.clear_cache()
    after = (DeltaTable.forPath(spark, tmp_table).table_changes(0, 2)
             .groupBy("_change_type").count().orderBy("_change_type")
             .collect())
    assert before == after


def test_v2_checkpoint_time_travel_and_restore(spark, tmp_table, sf_dir):
    """Time travel to a pre-checkpoint version and RESTORE both work
    when the only checkpoint is a V2 one."""
    part = load_table(spark, sf_dir, "part").limit(300)
    write_delta(part, tmp_table,
                configuration={"delta.checkpointPolicy": "v2"})
    dt = DeltaTable.forPath(spark, tmp_table)
    n0 = dt.toDF().count()
    dt.delete("p_size > 25")             # v1
    write_delta(part.limit(10), tmp_table, mode="append")  # v2
    log = DeltaLog.for_table(tmp_table)
    log.write_checkpoint(log.update())
    assert dt.asOfVersion(0).count() == n0
    dt.restoreToVersion(1)
    n1 = dt.toDF().count()
    assert n1 == part.filter("NOT coalesce(p_size > 25, false)").count()
