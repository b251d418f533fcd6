"""Variant type: storage, DML, feature auto-enablement
(reference: spark/src/test/scala/org/apache/spark/sql/delta/DeltaVariantSuite.scala)."""

import pytest
from pyspark.sql import functions as F

from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable


def _variant_df(spark, lo=0, hi=20):
    return spark.range(lo, hi).select(
        "id",
        F.parse_json(F.concat(
            F.lit('{"a": '), F.col("id").cast("string"),
            F.lit(', "tag": "t'), (F.col("id") % 3).cast("string"),
            F.lit('"}'))).alias("v"))


def test_variant_roundtrip_and_feature(spark, tmp_table):
    write_delta(_variant_df(spark), tmp_table)
    snap = DeltaLog.for_table(tmp_table).update()
    p = snap.protocol
    assert p.minReaderVersion >= 3 and p.minWriterVersion >= 7
    assert "variantType" in (p.readerFeatures or [])
    assert "variantType" in (p.writerFeatures or [])
    df = DeltaTable.forPath(spark, tmp_table).toDF()
    assert df.schema["v"].dataType.typeName() == "variant"
    got = (df.select(F.variant_get("v", "$.a", "long").alias("a"))
           .agg(F.sum("a").alias("s")).first())
    assert got["s"] == sum(range(20))


def test_variant_dml(spark, tmp_table):
    write_delta(_variant_df(spark), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    # delete via a variant-derived predicate
    dt.delete("variant_get(v, '$.tag', 'string') = 't0'")
    left = dt.toDF()
    assert left.count() == 13  # ids with id % 3 != 0
    assert (left.filter("variant_get(v, '$.tag', 'string') = 't0'").count()
            == 0)
    # update rewrites files containing variant values without corruption
    dt.update(condition="id < 5", set={"id": "id + 100"})
    assert dt.toDF().filter("id >= 100").count() == 3  # ids 1,2,4
    got = (dt.toDF()
           .select(F.variant_get("v", "$.a", "long").alias("a"),
                   "id")
           .filter("id = 101").first())
    assert got["a"] == 1  # variant payload rides through the rewrite


def test_variant_schema_evolution(spark, tmp_table):
    write_delta(spark.range(5).toDF("id"), tmp_table)
    evolved = _variant_df(spark, 5, 10)
    write_delta(evolved, tmp_table, mode="append", merge_schema=True)
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF().schema["v"].dataType.typeName() == "variant"
    p = DeltaLog.for_table(tmp_table).update().protocol
    assert "variantType" in (p.readerFeatures or [])
    assert dt.toDF().filter("v IS NULL").count() == 5


def test_variant_time_travel(spark, tmp_table):
    write_delta(_variant_df(spark, 0, 10), tmp_table)
    write_delta(_variant_df(spark, 10, 30), tmp_table, mode="append")
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.asOfVersion(0).count() == 10
    assert (dt.asOfVersion(0)
            .select(F.variant_get("v", "$.a", "long").alias("a"))
            .agg(F.max("a").alias("m")).first()["m"] == 9)


def test_variant_shredding(spark, tmp_table):
    """delta.enableVariantShredding=true: files store typed_value
    subcolumns beside the binary value WITH the parquet VARIANT
    logical-type annotation (PROTOCOL.md:1934), the variantShredding
    feature is auto-enabled, and reads (incl. variant_get paths)
    reproduce the unshredded values exactly."""
    import os

    import pyarrow.parquet as pq
    import pytest as _pytest

    write_delta(_variant_df(spark), tmp_table,
                configuration={"delta.enableVariantShredding": "true"})
    snap = DeltaLog.for_table(tmp_table).update()
    p = snap.protocol
    assert "variantShredding" in (p.readerFeatures or [])
    assert "variantShredding" in (p.writerFeatures or [])
    # physical layout + annotation: schema element names appear as
    # plain strings in the thrift footer, so the typed_value subtree
    # is byte-checkable; the VARIANT logical type itself makes this
    # pyarrow (<18) refuse the footer — that refusal IS the witness
    # that the annotation was written (annotation-free shredded files
    # parse fine)
    shredded = annotated = False
    files = list(snap.all_files)
    stats_have_bounds = False
    for f in files:
        fp = os.path.join(tmp_table, f.path)
        with open(fp, "rb") as fh:
            fh.seek(-min(1 << 20, os.path.getsize(fp)), os.SEEK_END)
            footer = fh.read()
        if b"typed_value" in footer:
            shredded = True
        with _pytest.raises(OSError, match="LogicalType"):
            pq.read_schema(fp)
        annotated = True
        # the stats pass must NOT degrade to numRecords-only: the
        # Spark fallback re-collects real bounds for annotated files
        if f.stats and '"minValues"' in f.stats and '"id"' in f.stats:
            stats_have_bounds = True
    assert shredded, "no typed_value group found in written files"
    assert annotated, "parquet VARIANT annotation missing"
    assert stats_have_bounds, "annotated files lost data-skipping stats"
    # logical round-trip identical to the unshredded table
    df = DeltaTable.forPath(spark, tmp_table).toDF()
    assert df.schema["v"].dataType.typeName() == "variant"
    got = (df.select(F.variant_get("v", "$.a", "long").alias("a"),
                     F.variant_get("v", "$.tag", "string").alias("tag"))
           .orderBy("a").collect())
    assert [r["a"] for r in got] == list(range(20))
    assert got[4]["tag"] == "t1"
    # DML over shredded files stays correct
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("variant_get(v, '$.tag', 'string') = 't0'")
    assert dt.toDF().count() == 13
