"""IcebergCompatV3: UniForm Iceberg format-version 3 output — deletion
vectors referenced as DeleteFiles, row lineage from Delta row tracking
(reference IcebergCompat.scala:96 IcebergCompatV3,
DeltaToIcebergConvert.scala:108 dvToDeleteFile)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from delta_spark import dv as dv_mod
from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable
from delta_spark.uniform import (
    UniFormValidationError,
    read_avro_file,
    read_current_metadata,
    read_iceberg_deletes,
    read_iceberg_files,
)

V3_PROPS = {
    "delta.universalFormat.enabledFormats": "iceberg",
    "delta.enableIcebergCompatV3": "true",
    "delta.enableDeletionVectors": "true",
    # RFC writer requirement: Iceberg field ids come from column mapping
    "delta.columnMapping.mode": "name",
}


def _mk_v3_table(spark, path, n=100):
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"),
        F.concat(F.lit("v"), F.col("id")).alias("val"))
    write_delta(df, path, configuration=V3_PROPS)
    return DeltaTable.forPath(spark, path)


def test_v3_metadata_and_row_lineage(spark, tmp_table):
    """format-version 3 everywhere; data files carry first_row_id from
    Delta's baseRowId space; next-row-id is one past the high
    watermark (setNextRowId role)."""
    _mk_v3_table(spark, tmp_table)
    meta = read_current_metadata(tmp_table)
    assert meta["format-version"] == 3
    snap = DeltaLog.for_table(tmp_table).update()
    # icebergCompatV3 force-enabled row tracking (RequireRowTracking)
    assert snap.configuration.get("delta.enableRowTracking") == "true"
    assert "icebergCompatV3" in (snap.protocol.writerFeatures or [])
    by_path = {os.path.join(tmp_table, f.path): f for f in snap.all_files}
    hwm = -1
    for e in read_iceberg_files(tmp_table):
        f = by_path[e["file_path"]]
        assert e["first_row_id"] == f.baseRowId
        hwm = max(hwm, f.baseRowId + e["record_count"] - 1)
    assert meta["next-row-id"] == hwm + 1
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    assert cur["first-row-id"] == min(f.baseRowId
                                      for f in snap.all_files)


def test_v3_dv_delete_yields_delete_manifest(spark, tmp_table):
    """A DV DELETE converts to a position-delete DeleteFile pointing at
    the Delta DV blob in place — reading the referenced window yields
    exactly the deleted row positions."""
    dt = _mk_v3_table(spark, tmp_table)
    dt.delete("id % 10 = 3")  # masks rows via DVs, no rewrite
    snap = dt.log.update()
    dv_files = {os.path.join(tmp_table, f.path): f
                for f in snap.all_files if f.deletionVector}
    assert dv_files, "delete should have produced deletion vectors"

    deletes = read_iceberg_deletes(tmp_table)
    assert {d["referenced_data_file"] for d in deletes} == set(dv_files)
    for d in deletes:
        f = dv_files[d["referenced_data_file"]]
        desc = f.deletionVector
        assert d["file_format"] == "PUFFIN"
        assert d["content"] == 1
        assert d["record_count"] == int(desc["cardinality"])
        assert d["content_offset"] == int(desc["offset"])
        assert d["content_size_in_bytes"] == int(desc["sizeInBytes"]) + 8
        # the referenced window IS the Delta blob: size|bitmap|crc
        blob = dv_mod.read_dv_blob(d["file_path"], d["content_offset"],
                                   int(desc["sizeInBytes"]))
        positions = dv_mod.deserialize_rbm_array(blob)
        want = dv_mod.descriptor_row_indexes(tmp_table, desc)
        assert list(positions) == list(want)
    # iceberg view row math: total data rows - delete cardinalities
    data_rows = sum(e["record_count"] for e in read_iceberg_files(tmp_table))
    del_rows = sum(d["record_count"] for d in deletes)
    assert data_rows - del_rows == dt.toDF().count()


def test_v3_roundtrip_convert_to_delta(spark, tmp_table, tmp_path):
    """CONVERT TO DELTA over the V3 Iceberg metadata imports the
    DeleteFiles as Delta DV descriptors in place — the converted table
    reads the same rows as the original."""
    dt = _mk_v3_table(spark, tmp_table)
    dt.delete("id % 10 = 3")
    from delta_spark.uniform import convert_iceberg_to_delta

    target = str(tmp_path / "from_ice")
    out = convert_iceberg_to_delta(spark, tmp_table, target)
    got = {r["id"] for r in out.toDF().select("id").collect()}
    want = {r["id"] for r in dt.toDF().select("id").collect()}
    assert got == want
    assert "deletionVectors" in (
        out.log.update().protocol.readerFeatures or [])


def test_v2_and_v3_mutually_exclusive(spark, tmp_table):
    df = spark.range(10).toDF("id")
    with pytest.raises(UniFormValidationError, match="SingleVersion"):
        write_delta(df, tmp_table, configuration={
            **V3_PROPS, "delta.enableIcebergCompatV2": "true"})


def test_v3_cannot_be_disabled(spark, tmp_table):
    dt = _mk_v3_table(spark, tmp_table, n=10)
    with pytest.raises(UniFormValidationError, match="CannotDisable"):
        dt.setProperties({"delta.enableIcebergCompatV3": "false"})


def test_v3_alter_with_existing_row_tracking_refused(spark, tmp_table):
    df = spark.range(10).toDF("id")
    write_delta(df, tmp_table,
                configuration={"delta.enableRowTracking": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    with pytest.raises(UniFormValidationError, match="RowTracking"):
        dt.setProperties({"delta.enableIcebergCompatV3": "true"})


def test_upgrade_uniform_v3_keeps_dvs_and_backfills(spark, tmp_table):
    """REORG UPGRADE UNIFORM(3): DVs are NOT purged (V3 converts them);
    row ids are backfilled so every data file gets a first_row_id."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"))
    write_delta(df, tmp_table, configuration={
        "delta.enableDeletionVectors": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("id % 7 = 1")
    n_dv_before = sum(1 for f in dt.log.update().all_files
                      if f.deletionVector)
    assert n_dv_before > 0
    dt.upgradeUniform(iceberg_compat_version=3)
    snap = dt.log.update()
    # DVs survived the upgrade
    assert sum(1 for f in snap.all_files if f.deletionVector) == n_dv_before
    meta = read_current_metadata(tmp_table)
    assert meta["format-version"] == 3
    assert all(e["first_row_id"] is not None
               for e in read_iceberg_files(tmp_table))
    assert read_iceberg_deletes(tmp_table)
    # counting through the iceberg view matches delta
    data_rows = sum(e["record_count"] for e in read_iceberg_files(tmp_table))
    del_rows = sum(d["record_count"]
                   for d in read_iceberg_deletes(tmp_table))
    assert data_rows - del_rows == dt.toDF().count()


def test_v2_dv_rejection_still_holds(spark, tmp_table):
    """The V2 rule is unchanged: DVs + UniForm without V3 is refused."""
    df = spark.range(10).toDF("id")
    with pytest.raises(UniFormValidationError, match="deletion vectors"):
        write_delta(df, tmp_table, configuration={
            "delta.universalFormat.enabledFormats": "iceberg",
            "delta.enableIcebergCompatV2": "true",
            "delta.enableDeletionVectors": "true"})
