"""materializePartitionColumns writer feature
(MaterializePartitionColumnsTableFeature, TableFeature.scala:1160):
partition column values are also stored physically in the data files
for external readers that require them in the parquet, while the
hive-style table layout and log partitionValues stay unchanged."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable

PROP = "delta.enableMaterializePartitionColumnsFeature"


def _df(spark, n=40):
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"),
        F.concat(F.lit("v"), F.col("id")).alias("val"))


def test_partition_columns_land_in_files(spark, tmp_table):
    write_delta(_df(spark), tmp_table, partition_by=["bucket"],
                configuration={PROP: "true"})
    snap = DeltaLog.for_table(tmp_table).update()
    assert "materializePartitionColumns" in (
        snap.protocol.writerFeatures or [])
    assert snap.all_files, "files written"
    for f in snap.all_files:
        # layout + log partitionValues unchanged
        assert f.path.startswith("bucket=")
        assert f.partitionValues.get("bucket") is not None
        # ...but the parquet physically contains the partition column
        names = pq.read_schema(os.path.join(tmp_table, f.path)).names
        assert "bucket" in names, names
        # file value agrees with the directory value
        t = pq.read_table(os.path.join(tmp_table, f.path),
                          columns=["bucket"])
        vals = set(t.column("bucket").to_pylist())
        assert vals == {int(f.partitionValues["bucket"])}


def test_reads_partition_pruning_and_dml(spark, tmp_table):
    df = _df(spark)
    write_delta(df, tmp_table, partition_by=["bucket"],
                configuration={PROP: "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    got = {(r["id"], r["bucket"], r["val"]) for r in dt.toDF().collect()}
    want = {(r["id"], r["bucket"], r["val"]) for r in df.collect()}
    assert got == want
    # partition pruning still file-exact
    snap = dt.log.update()
    assert len(snap.files_for_scan("bucket = 2")) < len(snap.all_files)
    assert dt.toDF().filter("bucket = 2").count() == 10
    # DML through the same write seam keeps materializing
    dt.delete("bucket = 1")
    dt.update({"val": "concat(val, '!')"}, "bucket = 2")
    assert dt.toDF().count() == 30
    assert dt.toDF().filter("val LIKE '%!'").count() == 10
    for f in dt.log.update().all_files:
        names = pq.read_schema(os.path.join(tmp_table, f.path)).names
        assert "bucket" in names


def test_unpartitioned_table_unaffected(spark, tmp_table):
    write_delta(_df(spark), tmp_table, configuration={PROP: "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF().count() == 40
