"""ALTER TABLE DROP FEATURE (reference:
AlterTableDropFeatureDeltaCommand, DeltaTableFeatureSuite)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.schema import TYPE_CHANGES_KEY
from delta_spark.table import DeltaTable


def _range_df(spark, n=100):
    return spark.range(n).select(F.col("id"),
                                 (F.col("id") % 5).alias("g"))


def test_drop_deletion_vectors(spark, tmp_table):
    write_delta(_range_df(spark).coalesce(2), tmp_table,
                configuration={"delta.enableDeletionVectors": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("id % 10 = 0")
    snap = DeltaLog.for_table(tmp_table).update()
    assert any(f.deletionVector for f in snap.all_files)
    # without truncate_history the drop is refused (history protection)
    with pytest.raises(ValueError, match="truncate_history"):
        dt.dropFeature("deletionVectors")
    dt.dropFeature("deletionVectors", truncate_history=True)
    DeltaLog.clear_cache()
    log = DeltaLog.for_table(tmp_table)
    snap = log.update()
    assert not any(f.deletionVector for f in snap.all_files)
    p = snap.protocol
    assert "deletionVectors" not in (p.readerFeatures or [])
    assert snap.configuration.get("delta.enableDeletionVectors") == "false"
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 90
    # history behind the protecting checkpoint is gone
    versions = log.list_commit_versions()
    assert versions[0] > 0


def test_drop_row_tracking(spark, tmp_table):
    write_delta(_range_df(spark), tmp_table,
                configuration={"delta.enableRowTracking": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    p = DeltaLog.for_table(tmp_table).update().protocol
    assert "rowTracking" in (p.writerFeatures or [])
    dt.dropFeature("rowTracking")  # writer feature: no truncation needed
    snap = DeltaLog.for_table(tmp_table).update()
    assert "rowTracking" not in (snap.protocol.writerFeatures or [])
    assert "delta.enableRowTracking" not in snap.configuration
    assert dt.toDF().count() == 100


def test_drop_type_widening_rewrites(spark, tmp_table):
    df = spark.range(60).select(F.col("id").cast("int").alias("k"))
    write_delta(df, tmp_table,
                configuration={"delta.enableTypeWidening": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.changeColumnType("k", "bigint")
    dt.dropFeature("typeWidening", truncate_history=True)
    snap = DeltaLog.for_table(tmp_table).update()
    assert "typeWidening" not in (snap.protocol.readerFeatures or [])
    assert TYPE_CHANGES_KEY not in snap.schema["k"].metadata
    out = DeltaTable.forPath(spark, tmp_table).toDF()
    assert out.schema["k"].dataType.typeName() == "long"
    assert out.agg(F.sum("k").alias("s")).first()["s"] == sum(range(60))
    # rewritten files store the wide type natively: pyarrow sees int64
    import pyarrow.parquet as pq
    live = [os.path.join(tmp_table, f.path) for f in snap.all_files]
    for path in live:
        typ = pq.ParquetFile(path).schema_arrow.field("k").type
        assert str(typ) == "int64"


def test_drop_variant_refused_while_present(spark, tmp_table):
    df = spark.range(5).select(
        "id", F.parse_json(F.lit('{"a":1}')).alias("v"))
    write_delta(df, tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    with pytest.raises(ValueError, match="variant columns"):
        dt.dropFeature("variantType", truncate_history=True)


def test_drop_unknown_or_absent(spark, tmp_table):
    write_delta(_range_df(spark), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    with pytest.raises(ValueError, match="not enabled"):
        dt.dropFeature("deletionVectors")


def test_drop_row_tracking_unbackfills(spark, tmp_table):
    """DROP FEATURE rowTracking strips baseRowId/defaultRowCommitVersion
    from every AddFile (RowTrackingUnBackfillCommand), leaving no
    row-tracking state behind."""
    write_delta(spark.range(20).withColumnRenamed("id", "a"), tmp_table,
                configuration={"delta.enableRowTracking": "true"})
    write_delta(spark.range(20, 40).withColumnRenamed("id", "a"), tmp_table,
                mode="append")
    snap = DeltaLog.for_table(tmp_table).update()
    assert any(f.baseRowId is not None for f in snap.all_files)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.dropFeature("rowTracking")
    DeltaLog.clear_cache()
    snap2 = DeltaLog.for_table(tmp_table).update()
    assert all(f.baseRowId is None and f.defaultRowCommitVersion is None
               for f in snap2.all_files)
    assert "rowTracking" not in (snap2.protocol.writerFeatures or [])
    assert dt.toDF().count() == 40
