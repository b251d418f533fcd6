"""UniForm Iceberg metadata generation (reference: iceberg/ module,
UniFormE2EIcebergSuite / UniFormIcebergVerifier / IcebergCompat suites)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from delta_spark import uniform
from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable
from delta_spark.uniform import (
    UniFormValidationError,
    read_avro_file,
    read_current_metadata,
    read_iceberg_files,
    write_avro_file,
)

UNIFORM_PROPS = {
    "delta.universalFormat.enabledFormats": "iceberg",
    "delta.enableIcebergCompatV2": "true",
}


# ------------------------------------------------------------ avro codec ----

def test_avro_roundtrip(tmp_path):
    schema = {
        "type": "record", "name": "r", "fields": [
            {"name": "a", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "opt", "type": ["null", "int"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "raw", "type": "bytes"},
        ]}
    recs = [
        {"a": -(2 ** 40), "s": "héllo", "opt": None, "arr": [1, 2, 3],
         "m": {"k": "v"}, "d": 1.5, "b": True, "raw": b"\x00\xff"},
        {"a": 7, "s": "", "opt": -42, "arr": [], "m": {}, "d": -0.25,
         "b": False, "raw": b""},
    ]
    p = str(tmp_path / "t.avro")
    write_avro_file(p, schema, recs)
    got_schema, got = read_avro_file(p)
    assert got == recs
    assert got_schema["fields"][0]["name"] == "a"


# ------------------------------------------------------------ conversion ----

def _mk_uniform_table(spark, path, partitioned=False):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"),
        F.concat(F.lit("v"), F.col("id")).alias("val"))
    write_delta(df, path,
                partition_by=["bucket"] if partitioned else None)
    dt = DeltaTable.forPath(spark, path)
    dt.setProperties(UNIFORM_PROPS)
    return dt


def test_convert_creates_metadata(spark, tmp_table):
    _mk_uniform_table(spark, tmp_table)
    meta = read_current_metadata(tmp_table)
    assert meta is not None
    assert meta["format-version"] == 2
    assert meta["properties"]["delta-version"] == str(
        DeltaLog.for_table(tmp_table).update().version)
    # schema carries ids for every column
    fields = meta["schemas"][0]["fields"]
    assert [f["name"] for f in fields] == ["id", "bucket", "val"]
    assert len({f["id"] for f in fields}) == 3
    # data files in iceberg metadata == live delta files
    snap = DeltaLog.for_table(tmp_table).update()
    delta_paths = {os.path.join(tmp_table, f.path) for f in snap.all_files}
    ice = read_iceberg_files(tmp_table)
    assert {e["file_path"] for e in ice} == delta_paths
    assert sum(e["record_count"] for e in ice) == 100


def test_incremental_append_adds_manifest(spark, tmp_table):
    _mk_uniform_table(spark, tmp_table)
    v1_meta = read_current_metadata(tmp_table)
    df2 = spark.range(100, 150).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"),
        F.concat(F.lit("v"), F.col("id")).alias("val"))
    write_delta(df2, tmp_table, mode="append")
    meta = read_current_metadata(tmp_table)
    assert meta["_metadata_version"] == v1_meta["_metadata_version"] + 1
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    assert cur["summary"]["operation"] == "append"
    assert cur.get("parent-snapshot-id") == v1_meta["current-snapshot-id"]
    # append reuses the previous manifests and adds exactly one
    _, manifests = read_avro_file(cur["manifest-list"])
    _, prev_manifests = read_avro_file(
        next(s for s in v1_meta["snapshots"]
             if s["snapshot-id"] == v1_meta["current-snapshot-id"]
             )["manifest-list"])
    assert len(manifests) == len(prev_manifests) + 1
    assert sum(e["record_count"] for e in read_iceberg_files(tmp_table)) == 150


def test_delete_triggers_rewrite(spark, tmp_table):
    dt = _mk_uniform_table(spark, tmp_table)
    write_delta(spark.range(100, 150).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"),
        F.concat(F.lit("v"), F.col("id")).alias("val")),
        tmp_table, mode="append")
    dt.delete("id >= 100")
    meta = read_current_metadata(tmp_table)
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    assert cur["summary"]["operation"] == "overwrite"
    snap = DeltaLog.for_table(tmp_table).update()
    assert ({e["file_path"] for e in read_iceberg_files(tmp_table)}
            == {os.path.join(tmp_table, f.path) for f in snap.all_files})
    assert sum(e["record_count"] for e in read_iceberg_files(tmp_table)) == 100


def test_partitioned_table_partition_values(spark, tmp_table):
    _mk_uniform_table(spark, tmp_table, partitioned=True)
    meta = read_current_metadata(tmp_table)
    spec = meta["partition-specs"][0]["fields"]
    assert [f["name"] for f in spec] == ["bucket"]
    assert spec[0]["transform"] == "identity"
    ice = read_iceberg_files(tmp_table)
    buckets = {e["partition"]["bucket"] for e in ice}
    assert buckets == {0, 1, 2, 3}


def test_column_mapping_ids_flow_through(spark, tmp_table):
    dt = _mk_uniform_table(spark, tmp_table)
    dt.enableColumnMapping()
    dt.renameColumn("val", "renamed")
    meta = read_current_metadata(tmp_table)
    fields = meta["schemas"][0]["fields"]
    assert "renamed" in [f["name"] for f in fields]
    # name mapping resolves physical parquet names to the same ids
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    by_id = {e["field-id"]: e["names"] for e in nm}
    renamed = next(f for f in fields if f["name"] == "renamed")
    assert "val" in by_id[renamed["id"]]  # physical name preserved


def test_dv_blocked_with_uniform(spark, tmp_table):
    dt = _mk_uniform_table(spark, tmp_table)
    with pytest.raises(UniFormValidationError):
        dt.setProperties({"delta.enableDeletionVectors": "true"})


def test_noop_when_disabled(spark, tmp_table):
    write_delta(spark.range(10).toDF("id"), tmp_table)
    assert read_current_metadata(tmp_table) is None


def test_convert_iceberg_to_delta_roundtrip(spark, tmp_table, tmp_path, sf_dir):
    """Delta → UniForm Iceberg metadata → CONVERT TO DELTA again: the
    converted table reads identical content through the Iceberg
    manifests alone (schema, identity partitions, numRecords stats)."""
    from delta_spark.datasets import load_table
    from delta_spark.sql import delta_sql
    from delta_spark.uniform import convert_iceberg_to_delta

    ords = load_table(spark, sf_dir, "orders").limit(300)
    write_delta(ords, tmp_table, partition_by=["o_orderstatus"],
                configuration={"delta.enableIcebergCompatV2": "true",
                               "delta.universalFormat.enabledFormats": "iceberg"})
    write_delta(ords.limit(50), tmp_table, mode="append")

    dst = str(tmp_path / "from_ice")
    dt2 = convert_iceberg_to_delta(spark, tmp_table, dst)
    src_df = DeltaTable.forPath(spark, tmp_table).toDF()
    assert dt2.toDF().count() == src_df.count()
    assert set(dt2.toDF().columns) == set(src_df.columns)
    a = dt2.toDF().groupBy("o_orderstatus").count().orderBy("o_orderstatus").collect()
    b = src_df.groupBy("o_orderstatus").count().orderBy("o_orderstatus").collect()
    assert a == b
    # partition pruning works on the converted table
    from delta_spark.log import DeltaLog
    snap = DeltaLog.for_table(dst).update()
    assert snap.partition_columns == ["o_orderstatus"]
    assert len(snap.files_for_scan("o_orderstatus = 'F'")) < snap.num_files
    # metadata-only COUNT uses the record_count-derived stats
    assert snap.metadata_aggregates(["o_orderkey"]) is not None
    # converting onto an existing delta table refuses (the UniForm
    # source is itself a delta table — SQL in-place form covers fresh
    # iceberg-only dirs)
    with pytest.raises(Exception, match="already exists"):
        convert_iceberg_to_delta(spark, tmp_table)


def test_reorg_upgrade_uniform_sql(spark, tmp_path):
    """REORG TABLE ... APPLY (UPGRADE UNIFORM(ICEBERG_COMPAT_VERSION=2))
    (DeltaSqlBase.g4 reorgTable): DVs are purged, icebergCompatV2 +
    the iceberg UniForm leg turn on, and the next commit publishes
    Iceberg metadata."""
    import os

    from delta_spark.io import write_delta
    from delta_spark.log import DeltaLog
    from delta_spark.sql import delta_sql
    from delta_spark.table import DeltaTable

    p = str(tmp_path / "up")
    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"))
    write_delta(df, p,
                configuration={"delta.enableDeletionVectors": "true"})
    dt = DeltaTable.forPath(spark, p)
    dt.delete("id % 10 = 0")  # leaves DV-masked files behind
    assert any(f.deletionVector for f in DeltaLog.for_table(p).update().all_files)

    delta_sql(spark, f"REORG TABLE delta.`{p}` APPLY "
                     f"(UPGRADE UNIFORM(ICEBERG_COMPAT_VERSION = 2))")
    snap = DeltaLog.for_table(p).update()
    assert not any(f.deletionVector for f in snap.all_files)
    cfg = snap.configuration
    assert cfg.get("delta.enableIcebergCompatV2") == "true"
    assert "iceberg" in cfg.get("delta.universalFormat.enabledFormats", "")
    # a follow-up commit triggers the Iceberg metadata hook
    write_delta(df.limit(5), p, mode="append")
    assert os.path.isdir(os.path.join(p, "metadata"))
    assert dt.toDF().count() == 185


def test_nested_field_ids_match_delta_mapping(spark, tmp_table):
    """Nested struct/array/map fields carry delta.columnMapping.id at
    every level (round-7 recursive assignment); the Iceberg schema
    must reuse exactly those ids for the corresponding nested fields —
    an Iceberg reader resolving by field-id then sees the same columns
    a Delta reader does."""
    from delta_spark.io import write_delta
    from delta_spark.schema import field_id
    from delta_spark.log import DeltaLog

    write_delta(
        spark.sql("""SELECT 1 AS id,
                     named_struct('aa', 'x', 'ac',
                                  named_struct('aca', 7)) AS s,
                     array(named_struct('ab', CAST(5 AS LONG))) AS arr,
                     map('k', named_struct('mv', 2)) AS m"""),
        tmp_table,
        configuration={"delta.columnMapping.mode": "id", **UNIFORM_PROPS})
    snap = DeltaLog.for_table(tmp_table).update()
    meta = read_current_metadata(tmp_table)
    ice = {f["name"]: f for f in meta["schemas"][0]["fields"]}

    s_field = snap.schema["s"]
    assert ice["s"]["id"] == field_id(s_field)
    ice_s = {f["name"]: f for f in ice["s"]["type"]["fields"]}
    assert ice_s["aa"]["id"] == field_id(s_field.dataType["aa"])
    assert ice_s["ac"]["id"] == field_id(s_field.dataType["ac"])
    ice_aca = ice_s["ac"]["type"]["fields"][0]
    assert ice_aca["id"] == field_id(s_field.dataType["ac"].dataType["aca"])

    arr_el = snap.schema["arr"].dataType.elementType["ab"]
    ice_arr_struct = ice["arr"]["type"]["element"]
    assert ice_arr_struct["fields"][0]["id"] == field_id(arr_el)

    m_val = snap.schema["m"].dataType.valueType["mv"]
    ice_m_value = ice["m"]["type"]["value"]
    assert ice_m_value["fields"][0]["id"] == field_id(m_val)

    # every id in the iceberg schema is unique
    def walk(node, acc):
        if isinstance(node, dict):
            if "id" in node and isinstance(node.get("id"), int):
                acc.append(node["id"])
            for v in node.values():
                walk(v, acc)
        elif isinstance(node, list):
            for v in node:
                walk(v, acc)
    ids = []
    walk(meta["schemas"][0]["fields"], ids)
    assert len(ids) == len(set(ids))
