"""Non-default string collations (the `collations` writer table
feature; reference TableFeature CollationsTableFeature and the
collations-table golden fixture). Spark 4 serializes collated strings
exactly as the Delta protocol does (`__COLLATIONS` field metadata), so
the engine's job is feature gating and keeping binary-order stats away
from file skipping."""

import os

import pytest
from pyspark.sql import functions as F

from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable

GOLDEN = "/root/reference/connectors/golden-tables/src/main/resources/golden"


def _collated_df(spark, rows):
    vals = ", ".join(f"('{a}', '{b}')" for a, b in rows)
    return spark.sql(
        f"SELECT CAST(c AS STRING COLLATE UTF8_LCASE) AS c, p "
        f"FROM VALUES {vals} AS t(c, p)")


def test_write_read_roundtrip_and_feature(spark, tmp_table):
    df = _collated_df(spark, [("aa", "x"), ("Bb", "y"), ("CC", "z")])
    write_delta(df, tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    snap = dt.log.update()
    assert "collations" in (snap.protocol.writerFeatures or [])
    out = dt.toDF()
    # collation survives the log round-trip: comparisons on the read
    # side are case-insensitive
    assert out.schema["c"].dataType.collationName() == "UTF8_LCASE" \
        if hasattr(out.schema["c"].dataType, "collationName") \
        else "UTF8_LCASE" in repr(out.schema["c"].dataType)
    assert out.filter(F.col("c") == F.lit("bb")).count() == 1
    assert out.filter("c = 'cc'").count() == 1
    # the binary column stays binary
    assert out.filter("p = 'X'").count() == 0


def test_skipping_never_prunes_collated_columns(spark, tmp_table):
    """Binary-order MIN/MAX must not prune collation-semantics
    predicates: a file holding 'aa' MUST survive `c = 'AA'`."""
    write_delta(_collated_df(spark, [("aa", "x")]), tmp_table)
    write_delta(_collated_df(spark, [("zz", "y")]), tmp_table,
                mode="append")
    dt = DeltaTable.forPath(spark, tmp_table)
    snap = dt.log.update()
    assert len(snap.all_files) == 2
    # no pruning on the collated column — both files scanned...
    assert len(snap.files_for_scan("c = 'AA'")) == 2
    # ...but the row-level result is collation-correct
    assert dt.toDF().filter("c = 'AA'").count() == 1
    # the binary column still prunes
    assert len(snap.files_for_scan("p = 'x'")) == 1
    # MIN/MAX from metadata must decline the collated column
    aggs = snap.metadata_aggregates()
    assert aggs is not None
    assert "c" not in aggs["minValues"] and "p" in aggs["minValues"]


def test_no_stats_written_for_collated_columns(spark, tmp_table):
    """Parity with StatisticsCollection: writers don't record binary
    min/max for collated columns at all."""
    import json

    write_delta(_collated_df(spark, [("aa", "x"), ("Bb", "y")]), tmp_table)
    snap = DeltaLog.for_table(tmp_table).update()
    for f in snap.all_files:
        st = json.loads(f.stats)
        assert "c" not in st.get("minValues", {})
        assert "p" in st.get("minValues", {})


def test_collated_delete_correctness(spark, tmp_table):
    write_delta(_collated_df(spark, [("aa", "x"), ("zz", "y")]), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("c = 'AA'")  # must hit 'aa' under UTF8_LCASE
    rows = {r["c"] for r in dt.toDF().collect()}
    assert rows == {"zz"}


@pytest.mark.skipif(not os.path.isdir(GOLDEN), reason="golden absent")
def test_golden_collations_table_schema(spark):
    """The reference-written collations fixture reads with its collated
    types reconstructed from __COLLATIONS metadata."""
    DeltaLog.clear_cache()
    dt = DeltaTable.forPath(spark, os.path.join(GOLDEN, "collations-table"))
    sch = dt.log.update().schema
    assert "UTF8_LCASE" in repr(sch["utf8_lcase_col"].dataType)
    assert "UNICODE" in repr(sch["unicode_col"].dataType)
    assert dt.toDF().count() == 0  # fixture is empty, read must not fail
