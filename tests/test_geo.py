"""GeoSpatial (preview) column support: preview-conf gating on both
write and read, `geospatial` feature auto-enablement, WKB physical
round-trips through batch write/read, DML, CDF and time travel, and the
scoped-out envelope (nested geo, geo partition columns, streaming).
Reference: DeltaGeoSpatial.scala, TableFeature.scala:687."""

import pytest
from pyspark.sql import functions as F, types as T

from delta_spark import DeltaLog, DeltaTable, write_delta
from delta_spark import geo
from delta_spark.geo import GEO_PREVIEW_CONF, GeoNotSupportedException

pytestmark = pytest.mark.skipif(
    not geo._GEO_TYPES, reason="pyspark without GeometryType (4.1+)")

# WKB for POINT(1 2) / POINT(3 4), little-endian
WKB1 = "0101000000000000000000F03F0000000000000040"
WKB2 = "010100000000000000000008400000000000001040"


@pytest.fixture()
def geo_on(spark):
    spark.conf.set(GEO_PREVIEW_CONF, "true")
    spark.conf.set("spark.sql.geospatial.enabled", "true")
    yield spark
    spark.conf.set(GEO_PREVIEW_CONF, "false")


def _geo_df(spark, srid=4326):
    return spark.sql(f"""
        SELECT id,
               st_setsrid(st_geomfromwkb(unhex(wkb)), {srid}) AS geom,
               st_geogfromwkb(unhex(wkb)) AS geog
        FROM VALUES (1, '{WKB1}'), (2, '{WKB2}') AS t(id, wkb)""")


def _wkb_hex(df, col):
    return {r["id"]: r["w"].hex().upper()
            for r in df.selectExpr("id", f"st_asbinary({col}) AS w").collect()}


def test_write_read_round_trip(geo_on, tmp_table):
    spark = geo_on
    write_delta(_geo_df(spark), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    out = dt.toDF()
    by_name = {f.name: f.dataType for f in out.schema.fields}
    assert by_name["geom"] == T.GeometryType(4326)
    assert by_name["geog"] == T.GeographyType(4326)
    assert _wkb_hex(out, "geom") == {1: WKB1, 2: WKB2}
    assert _wkb_hex(out, "geog") == {1: WKB1, 2: WKB2}
    # SRID survives the round trip through the WKB seam
    assert out.selectExpr("st_srid(geom) s").distinct().collect()[0][0] == 4326
    # physical parquet column really is WKB binary (no geo logical type)
    snap = DeltaLog.for_table(tmp_table).update()
    import os
    raw = spark.read.parquet(
        os.path.join(tmp_table, snap.all_files[0].path)).schema
    assert {f.name: f.dataType for f in raw.fields}["geom"] == T.BinaryType()


def test_feature_auto_enabled(geo_on, tmp_table):
    write_delta(_geo_df(geo_on), tmp_table)
    p = DeltaLog.for_table(tmp_table).update().protocol
    assert "geospatial" in (p.readerFeatures or [])
    assert "geospatial" in (p.writerFeatures or [])


def test_preview_conf_gates_write_and_read(spark, tmp_table):
    spark.conf.set("spark.sql.geospatial.enabled", "true")
    spark.conf.set(GEO_PREVIEW_CONF, "true")
    df = _geo_df(spark)
    spark.conf.set(GEO_PREVIEW_CONF, "false")
    with pytest.raises(GeoNotSupportedException, match="preview"):
        write_delta(df, tmp_table)
    # write with the conf on, then reading with it off fails closed
    spark.conf.set(GEO_PREVIEW_CONF, "true")
    write_delta(df, tmp_table)
    spark.conf.set(GEO_PREVIEW_CONF, "false")
    DeltaLog.clear_cache()
    with pytest.raises(GeoNotSupportedException, match=GEO_PREVIEW_CONF):
        DeltaTable.forPath(spark, tmp_table).toDF().collect()


def test_dml_and_time_travel(geo_on, tmp_table):
    spark = geo_on
    write_delta(_geo_df(spark), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.update(condition="id = 1",
              set={"geom": f"st_setsrid(st_geomfromwkb(unhex('{WKB2}')), 4326)"})
    assert _wkb_hex(dt.toDF(), "geom") == {1: WKB2, 2: WKB2}
    dt.delete("id = 2")
    assert _wkb_hex(dt.toDF(), "geom") == {1: WKB2}
    # versionAsOf sees the original geometry
    v0 = DeltaTable.forPath(spark, tmp_table).asOfVersion(0)
    assert _wkb_hex(v0, "geom") == {1: WKB1, 2: WKB2}


def test_cdf_carries_geo(geo_on, tmp_table):
    spark = geo_on
    write_delta(_geo_df(spark), tmp_table,
                configuration={"delta.enableChangeDataFeed": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("id = 1")
    from delta_spark.cdf import table_changes
    ch = table_changes(spark, DeltaLog.for_table(tmp_table),
                       starting_version=1)
    rows = ch.selectExpr("id", "_change_type",
                         "st_asbinary(geom) w").collect()
    assert [(r["id"], r["_change_type"], r["w"].hex().upper())
            for r in rows] == [(1, "delete", WKB1)]


def test_merge_on_geo_table(geo_on, tmp_table):
    spark = geo_on
    write_delta(_geo_df(spark), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    src = spark.sql(f"""
        SELECT id, st_setsrid(st_geomfromwkb(unhex(wkb)), 4326) AS geom,
               st_geogfromwkb(unhex(wkb)) AS geog
        FROM VALUES (2, '{WKB1}'), (3, '{WKB1}') AS t(id, wkb)""")
    (dt.merge(src, "t.id = s.id", target_alias="t", source_alias="s")
       .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute())
    assert _wkb_hex(dt.toDF(), "geom") == {1: WKB1, 2: WKB1, 3: WKB1}


def test_nested_geo_rejected(geo_on, tmp_table):
    spark = geo_on
    nested = spark.sql(f"""
        SELECT 1 AS id,
               struct(st_geomfromwkb(unhex('{WKB1}')) AS g) AS payload""")
    with pytest.raises(GeoNotSupportedException, match="nested"):
        write_delta(nested, tmp_table)


def test_geo_partition_column_rejected(geo_on, tmp_table):
    with pytest.raises(GeoNotSupportedException, match="partition"):
        write_delta(_geo_df(geo_on), tmp_table, partition_by=["geom"])


def test_streaming_source_rejected(geo_on, tmp_table):
    spark = geo_on
    write_delta(_geo_df(spark), tmp_table)
    from delta_spark.streaming import DeltaStreamReader
    with pytest.raises(GeoNotSupportedException, match="[Ss]treaming"):
        DeltaStreamReader(None, {"path": tmp_table})


def test_stats_skip_geo_but_prune_others(geo_on, tmp_table):
    spark = geo_on
    write_delta(_geo_df(spark), tmp_table)
    snap = DeltaLog.for_table(tmp_table).update()
    import json
    stats = [json.loads(f.stats) for f in snap.all_files]
    assert all("geom" not in st.get("minValues", {}) for st in stats)
    assert sum(st["numRecords"] for st in stats) == 2
    # skipping on the scalar column still works over the geo table
    assert snap.files_for_scan("id > 99") == []


def test_datasource_batch_read_rejected(geo_on, tmp_table):
    spark = geo_on
    write_delta(_geo_df(spark), tmp_table)
    from delta_spark.streaming import DeltaBatchReader
    with pytest.raises(GeoNotSupportedException, match="delta_py"):
        DeltaBatchReader(None, {"path": tmp_table})


def test_cdf_read_gate_fails_closed(geo_on, tmp_table):
    spark = geo_on
    write_delta(_geo_df(spark), tmp_table,
                configuration={"delta.enableChangeDataFeed": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.update(condition="id = 1",
              set={"geom": f"st_setsrid(st_geomfromwkb(unhex('{WKB2}')), 4326)"})
    spark.conf.set(GEO_PREVIEW_CONF, "false")
    from delta_spark.cdf import table_changes
    with pytest.raises(GeoNotSupportedException):
        table_changes(spark, DeltaLog.for_table(tmp_table),
                      starting_version=1).collect()
    spark.conf.set(GEO_PREVIEW_CONF, "true")
    assert table_changes(spark, DeltaLog.for_table(tmp_table),
                         starting_version=1).count() > 0
