"""Type widening: metadata-only ALTER TABLE CHANGE COLUMN TYPE
(reference: TypeWidening.scala, TypeWideningMetadata.scala,
DeltaTypeWideningSuite)."""

import pytest
from pyspark.sql import functions as F, types as T

from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.schema import (
    TYPE_CHANGES_KEY,
    is_widening_supported,
    merge_schemas,
)
from delta_spark.table import DeltaTable

CONF = {"delta.enableTypeWidening": "true"}


def test_widening_matrix(spark):
    ok = [("int", "bigint"), ("tinyint", "smallint"), ("smallint", "double"),
          ("float", "double"), ("date", "timestamp_ntz"),
          ("int", "decimal(10,0)"), ("int", "decimal(12,2)"),
          ("bigint", "decimal(20,0)"), ("decimal(5,2)", "decimal(9,4)")]
    bad = [("bigint", "int"), ("double", "float"), ("string", "int"),
           ("int", "int"), ("decimal(10,2)", "decimal(10,1)"),
           ("decimal(10,2)", "decimal(11,4)"),  # int digits shrink
           ("bigint", "decimal(19,0)"), ("timestamp_ntz", "date")]
    p = T._parse_datatype_string
    for f, t in ok:
        assert is_widening_supported(p(f), p(t)), (f, t)
    for f, t in bad:
        assert not is_widening_supported(p(f), p(t)), (f, t)


def test_change_column_type_int_to_long(spark, tmp_table):
    df = spark.range(100).select(
        F.col("id").cast("int").alias("k"), F.lit(1.5).alias("x"))
    write_delta(df, tmp_table, configuration=CONF)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.changeColumnType("k", "bigint")
    # old narrow files served through the widened schema
    out = dt.toDF()
    assert out.schema["k"].dataType == T.LongType()
    assert out.agg(F.sum("k").alias("s")).first()["s"] == sum(range(100))
    # appends can exceed int range now
    big = spark.createDataFrame([(2**40, 2.5)], "k long, x double")
    write_delta(big, tmp_table, mode="append")
    assert dt.toDF().filter(F.col("k") > 2**39).count() == 1
    # typeChanges metadata + feature recorded
    snap = DeltaLog.for_table(tmp_table).update()
    md = snap.schema["k"].metadata
    assert md[TYPE_CHANGES_KEY] == [{"fromType": "int", "toType": "bigint"}]
    p = snap.protocol
    assert "typeWidening" in (p.readerFeatures or [])


def test_change_column_rejections(spark, tmp_table):
    df = spark.range(10).select(F.col("id").cast("int").alias("k"))
    write_delta(df, tmp_table)  # widening not enabled
    dt = DeltaTable.forPath(spark, tmp_table)
    with pytest.raises(ValueError, match="enableTypeWidening"):
        dt.changeColumnType("k", "bigint")
    dt.setProperties(CONF)
    with pytest.raises(ValueError, match="unsupported type change"):
        dt.changeColumnType("k", "smallint")
    with pytest.raises(ValueError, match="no such column"):
        dt.changeColumnType("zz", "bigint")


def test_widening_with_dml_and_time_travel(spark, tmp_table):
    df = spark.range(50).select(F.col("id").cast("int").alias("k"))
    write_delta(df, tmp_table, configuration=CONF)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.changeColumnType("k", "double")
    dt.delete("k < 10")  # rewrite mixes narrow files with wide schema
    assert dt.toDF().count() == 40
    got = dt.toDF().agg(F.sum("k").alias("s")).first()["s"]
    assert got == float(sum(range(10, 50)))
    # pre-change version still reads with the old type
    assert dt.asOfVersion(0).schema["k"].dataType == T.IntegerType()


def test_decimal_widening(spark, tmp_table):
    df = spark.range(20).select(
        F.col("id").cast("decimal(6,2)").alias("d"))
    write_delta(df, tmp_table, configuration=CONF)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.changeColumnType("d", "decimal(12,4)")
    out = dt.toDF()
    assert out.schema["d"].dataType == T.DecimalType(12, 4)
    assert float(out.agg(F.sum("d").alias("s")).first()["s"]) == float(
        sum(range(20)))


def test_merge_schemas_widening_still_works():
    a = T.StructType([T.StructField("x", T.IntegerType())])
    b = T.StructType([T.StructField("x", T.LongType())])
    assert merge_schemas(a, b)["x"].dataType == T.LongType()
