"""UniForm Hudi metadata generation (reference: hudi/ module —
HudiConverter / HudiConversionTransaction / HudiTransactionUtils /
HudiSchemaUtils, ConvertToHudiSuite)."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_spark import uniform_hudi
from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable
from delta_spark.uniform_hudi import (
    HudiConversionError,
    avro_schema,
    last_converted_delta_version,
    read_hudi_files,
)

HUDI_PROPS = {"delta.universalFormat.enabledFormats": "hudi"}


def _mk_hudi_table(spark, path, partitioned=False):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"),
        F.concat(F.lit("v"), F.col("id")).alias("val"))
    write_delta(df, path,
                partition_by=["bucket"] if partitioned else None)
    dt = DeltaTable.forPath(spark, path)
    dt.setProperties(HUDI_PROPS)
    return dt


def _live_delta_paths(path):
    snap = DeltaLog.for_table(path).update()
    return sorted(f.path for f in snap.all_files)


def test_convert_creates_timeline(spark, tmp_table):
    _mk_hudi_table(spark, tmp_table)
    hdir = os.path.join(tmp_table, ".hoodie")
    assert os.path.isdir(hdir)
    props = open(os.path.join(hdir, "hoodie.properties")).read()
    assert "hoodie.table.type=COPY_ON_WRITE" in props
    assert "hoodie.populate.meta.fields=false" in props
    assert ("hoodie.table.keygenerator.class="
            "org.apache.hudi.keygen.NonpartitionedKeyGenerator") in props
    assert "hoodie.table.checksum=" in props
    # requested → inflight → completed triplet exists for the instant
    completed = [n for n in os.listdir(hdir) if n.endswith(".replacecommit")]
    assert len(completed) == 1
    instant = completed[0][: -len(".replacecommit")]
    assert os.path.exists(
        os.path.join(hdir, f"{instant}.replacecommit.requested"))
    assert os.path.exists(
        os.path.join(hdir, f"{instant}.replacecommit.inflight"))
    assert len(instant) == 17 and instant.isdigit()
    # conversion tracks the delta version, commit carries the schema
    snap = DeltaLog.for_table(tmp_table).update()
    assert last_converted_delta_version(tmp_table) == snap.version
    meta = json.load(open(os.path.join(hdir, completed[0])))
    schema = json.loads(meta["extraMetadata"]["schema"])
    assert [f["name"] for f in schema["fields"]] == ["id", "bucket", "val"]
    # file listing round-trips
    assert read_hudi_files(tmp_table) == _live_delta_paths(tmp_table)


def test_write_stats_follow_convert_add_file(spark, tmp_table):
    _mk_hudi_table(spark, tmp_table)
    hdir = os.path.join(tmp_table, ".hoodie")
    completed = sorted(n for n in os.listdir(hdir)
                       if n.endswith(".replacecommit"))
    instant = completed[-1][: -len(".replacecommit")]
    meta = json.load(open(os.path.join(hdir, completed[-1])))
    stats = [s for group in meta["partitionToWriteStats"].values()
             for s in group]
    snap = DeltaLog.for_table(tmp_table).update()
    by_name = {os.path.basename(f.path): f for f in snap.all_files}
    assert {s["fileId"] for s in stats} == set(by_name)
    for s in stats:
        add = by_name[s["fileId"]]
        # external-file marker (HudiTransactionUtils.convertAddFile)
        assert s["path"].endswith(f"_{instant}_hudiext")
        assert s["fileSizeInBytes"] == add.size
        assert s["totalWriteBytes"] == add.size
        assert s["numWrites"] == json.loads(add.stats)["numRecords"]
    assert sum(s["numWrites"] for s in stats) == 100


def test_incremental_append(spark, tmp_table):
    _mk_hudi_table(spark, tmp_table)
    write_delta(spark.range(100, 150).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"),
        F.concat(F.lit("v"), F.col("id")).alias("val")),
        tmp_table, mode="append")
    hdir = os.path.join(tmp_table, ".hoodie")
    completed = sorted(n for n in os.listdir(hdir)
                       if n.endswith(".replacecommit"))
    assert len(completed) == 2
    # the append commit replaces nothing and adds only the new files
    meta = json.load(open(os.path.join(hdir, completed[-1])))
    assert meta["partitionToReplaceFileIds"] == {}
    assert read_hudi_files(tmp_table) == _live_delta_paths(tmp_table)
    assert last_converted_delta_version(tmp_table) == \
        DeltaLog.for_table(tmp_table).update().version


def test_delete_replaces_file_ids(spark, tmp_table):
    dt = _mk_hudi_table(spark, tmp_table)
    before = set(_live_delta_paths(tmp_table))
    dt.delete("id >= 50")
    hdir = os.path.join(tmp_table, ".hoodie")
    completed = sorted(n for n in os.listdir(hdir)
                       if n.endswith(".replacecommit"))
    meta = json.load(open(os.path.join(hdir, completed[-1])))
    replaced = {fid for ids in meta["partitionToReplaceFileIds"].values()
                for fid in ids}
    gone = before - set(_live_delta_paths(tmp_table))
    assert replaced == {os.path.basename(p) for p in gone}
    assert read_hudi_files(tmp_table) == _live_delta_paths(tmp_table)


def test_partitioned_hive_style_paths(spark, tmp_table):
    _mk_hudi_table(spark, tmp_table, partitioned=True)
    hdir = os.path.join(tmp_table, ".hoodie")
    props = open(os.path.join(hdir, "hoodie.properties")).read()
    assert "hoodie.table.partition.fields=bucket" in props
    assert ("hoodie.table.keygenerator.class="
            "org.apache.hudi.keygen.SimpleKeyGenerator") in props
    completed = sorted(n for n in os.listdir(hdir)
                       if n.endswith(".replacecommit"))
    meta = json.load(open(os.path.join(hdir, completed[-1])))
    parts = set(meta["partitionToWriteStats"])
    assert parts == {f"bucket={i}" for i in range(4)}
    assert read_hudi_files(tmp_table) == _live_delta_paths(tmp_table)


def test_full_restatement_after_log_cleanup(spark, tmp_table):
    """When the incremental commit range is gone, the conversion
    restates the world: every previously-tracked fileId is replaced and
    the live set re-registered (HudiConverter's full-sync fallback)."""
    dt = _mk_hudi_table(spark, tmp_table)
    log = DeltaLog.for_table(tmp_table)
    v_before = log.update().version
    write_delta(spark.range(100, 120).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"),
        F.concat(F.lit("v"), F.col("id")).alias("val")),
        tmp_table, mode="append")
    snap = log.update()  # snapshot advances BEFORE the commit expires
    # simulate an expired commit by renaming its backing json away
    src = os.path.join(tmp_table, "_delta_log", f"{v_before + 1:020d}.json")
    os.rename(src, src + ".hidden")
    hdir = os.path.join(tmp_table, ".hoodie")
    # drop the append's conversion so the converter must cover
    # (v_before, v_now] — whose commit json is now missing
    latest = sorted(n[:17] for n in os.listdir(hdir)
                    if n.endswith(".replacecommit"))[-1]
    for n in list(os.listdir(hdir)):
        if n.startswith(latest):
            os.remove(os.path.join(hdir, n))
    assert last_converted_delta_version(tmp_table) == v_before
    uniform_hudi.convert_snapshot(log, snap)
    os.rename(src + ".hidden", src)
    assert read_hudi_files(tmp_table) == _live_delta_paths(tmp_table)


def test_dv_blocked_with_hudi(spark, tmp_table):
    dt = _mk_hudi_table(spark, tmp_table)
    with pytest.raises(HudiConversionError):
        dt.setProperties({"delta.enableDeletionVectors": "true"})


def test_noop_when_disabled(spark, tmp_table):
    df = spark.range(10).select(F.col("id"))
    write_delta(df, tmp_table)
    assert not os.path.isdir(os.path.join(tmp_table, ".hoodie"))
    assert last_converted_delta_version(tmp_table) is None


def test_avro_schema_mapping():
    st = T.StructType([
        T.StructField("s", T.StringType(), False),
        T.StructField("i", T.IntegerType(), True),
        T.StructField("d", T.DateType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("dec", T.DecimalType(10, 2), True),
        T.StructField("arr", T.ArrayType(T.LongType(), True), False),
        T.StructField("m", T.MapType(T.StringType(), T.DoubleType()), False),
        T.StructField("nested", T.StructType([
            T.StructField("x", T.BooleanType(), True)]), False),
    ])
    s = avro_schema(st)
    by_name = {f["name"]: f["type"] for f in s["fields"]}
    assert by_name["s"] == "string"
    assert by_name["i"] == ["null", "int"]
    assert by_name["d"] == ["null", {"type": "int", "logicalType": "date"}]
    assert by_name["ts"] == {"type": "long",
                             "logicalType": "timestamp-micros"}
    assert by_name["dec"][1]["logicalType"] == "decimal"
    assert by_name["dec"][1]["precision"] == 10
    assert by_name["arr"]["type"] == "array"
    assert by_name["m"]["values"] == ["null", "double"]  # valueContainsNull
    assert by_name["nested"]["type"] == "record"
    assert by_name["nested"]["fields"][0]["type"] == ["null", "boolean"]


def test_lagged_conversion_reconciles_range(spark, tmp_table):
    """When the conversion lags several Delta commits, a file added AND
    removed inside the catch-up range must not resurface in the Hudi
    timeline (per-path reconciliation across the range)."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"),
        F.concat(F.lit("v"), F.col("id")).alias("val"))
    write_delta(df, tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.setProperties(HUDI_PROPS)
    hdir = os.path.join(tmp_table, ".hoodie")
    # drop the Hudi timeline back to the first conversion, then make
    # two commits: append F..., then a DELETE that rewrites files
    baseline = sorted(n for n in os.listdir(hdir)
                      if n.endswith(".replacecommit"))
    write_delta(df.limit(30), tmp_table, mode="append")
    dt.delete("id >= 20")  # rewrites (removes) files incl. the append
    # remove conversions made after the baseline → converter must catch
    # up over BOTH commits in one replacecommit
    for n in list(os.listdir(hdir)):
        if n.endswith((".replacecommit", ".replacecommit.requested",
                       ".replacecommit.inflight")) \
                and n[:17] not in {b[:17] for b in baseline}:
            os.remove(os.path.join(hdir, n))
    log = DeltaLog.for_table(tmp_table)
    uniform_hudi.convert_snapshot(log, log.update())
    assert read_hudi_files(tmp_table) == _live_delta_paths(tmp_table)


def test_metadata_table_files_listing(spark, tmp_table):
    """The .hoodie/metadata files partition serves the file listing a
    metadata-enabled Hudi reader resolves instead of listing the
    filesystem — names AND sizes match the live Delta snapshot, and the
    metadata timeline carries a completed deltacommit per conversion
    (HudiConversionTransaction.scala:152; base-file-format deviation
    documented in the module)."""
    from delta_spark.uniform_hudi import read_metadata_table_listing

    _mk_hudi_table(spark, tmp_table)
    mdt = os.path.join(tmp_table, ".hoodie", "metadata")
    assert os.path.isdir(os.path.join(mdt, ".hoodie"))
    props = open(os.path.join(mdt, ".hoodie", "hoodie.properties")).read()
    assert "hoodie.table.type=MERGE_ON_READ" in props

    def _expect(path):
        snap = DeltaLog.for_table(path).update()
        out = {}
        for f in snap.all_files:
            part = os.path.dirname(f.path) or "."
            out.setdefault(part, {})[os.path.basename(f.path)] = f.size
        return out

    listing = read_metadata_table_listing(tmp_table)
    assert listing == _expect(tmp_table)
    # every listed file exists physically with the recorded size
    for part, files in listing.items():
        for name, size in files.items():
            p = os.path.join(tmp_table,
                             "" if part == "." else part, name)
            assert os.path.getsize(p) == size
    # and the listing agrees with the timeline-replay reader
    timeline_files = {os.path.basename(p) for p in read_hudi_files(tmp_table)}
    mdt_files = {n for fs in listing.values() for n in fs}
    assert mdt_files == timeline_files

    # DML → next conversion refreshes the listing (removed files gone)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("id < 50")
    listing2 = read_metadata_table_listing(tmp_table)
    assert listing2 == _expect(tmp_table)
    assert listing2 != listing
    commits = [n for n in os.listdir(os.path.join(mdt, ".hoodie"))
               if n.endswith(".deltacommit")]
    assert len(commits) == 2


def test_metadata_table_partitioned(spark, tmp_table):
    """Hive-style partition paths appear as metadata-table keys; the
    __all_partitions__ record enumerates them."""
    import pyarrow.parquet as pq

    from delta_spark.uniform_hudi import read_metadata_table_listing

    _mk_hudi_table(spark, tmp_table, partitioned=True)
    listing = read_metadata_table_listing(tmp_table)
    assert set(listing) == {f"bucket={i}" for i in range(4)}
    files_dir = os.path.join(tmp_table, ".hoodie", "metadata", "files")
    newest = sorted(os.listdir(files_dir))[-1]
    rows = pq.read_table(os.path.join(files_dir, newest)).to_pylist()
    allp = [r for r in rows if r["type"] == 1]
    assert len(allp) == 1 and allp[0]["key"] == "__all_partitions__"
    assert {e["name"] for e in allp[0]["filesystemMetadata"]} == set(listing)
