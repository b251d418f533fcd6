"""Schema governance + concurrency: constraints, generated/identity
columns, schema evolution, ALTER surface, conflict checking
(reference: Invariants/Constraints suites, GeneratedColumnSuite,
IdentityColumnSuite, OptimisticTransactionSuite)."""

import os
import threading

import pytest
from pyspark.sql import functions as F, types as T

from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.schema import (
    IDENTITY_START_KEY,
    IDENTITY_STEP_KEY,
    SchemaEvolutionError,
    merge_schemas,
)
from delta_spark.table import DeltaTable
from delta_spark.transaction import (
    ConcurrentAppendException,
    ConcurrentDeleteDeleteException,
    MetadataChangedException,
    OptimisticTransaction,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


# ----------------------------------------------------------- constraints ----

def test_not_null_enforced(spark, tmp_table):
    dt = (DeltaTable.create(spark).location(tmp_table)
          .addColumn("id", "long", nullable=False)
          .addColumn("v", "double").execute())
    ok = spark.createDataFrame([(1, 1.0), (2, None)], "id long, v double")
    write_delta(ok, tmp_table, mode="append")
    bad = spark.createDataFrame([(None, 3.0)], "id long, v double")
    with pytest.raises(Exception, match="NOT NULL"):
        write_delta(bad, tmp_table, mode="append")
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 2


def test_check_constraint(spark, tmp_table, sf_dir):
    write_delta(_orders(spark, sf_dir).limit(100), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.addCheckConstraint("positive_price", "o_totalprice > 0")
    bad = _orders(spark, sf_dir).limit(5).withColumn("o_totalprice", F.lit(-1.0))
    with pytest.raises(Exception, match="CHECK constraint positive_price"):
        write_delta(bad, tmp_table, mode="append")
    # constraint rejected on existing violations
    with pytest.raises(ValueError, match="existing rows violate"):
        dt.addCheckConstraint("impossible", "o_totalprice > 1e12")
    dt.dropCheckConstraint("positive_price")
    write_delta(bad, tmp_table, mode="append")  # now allowed
    assert dt.toDF().filter("o_totalprice < 0").count() == 5


def test_generated_column_validation(spark, tmp_table, sf_dir):
    (DeltaTable.create(spark).location(tmp_table)
     .addColumn("o_orderkey", "long")
     .addColumn("o_orderdate", "timestamp")
     .addColumn("o_year", "int", generatedAlwaysAs="year(o_orderdate)")
     .execute())
    src = _orders(spark, sf_dir).limit(50).select("o_orderkey", "o_orderdate")
    write_delta(src, tmp_table, mode="append")
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF().filter("o_year <> year(o_orderdate)").count() == 0
    # explicitly provided wrong values must fail
    bad = src.limit(3).withColumn("o_year", F.lit(1900))
    with pytest.raises(Exception, match="generated column"):
        write_delta(bad, tmp_table, mode="append")


def test_identity_column(spark, tmp_table, sf_dir):
    schema = T.StructType([
        T.StructField("rid", T.LongType(), True,
                      {IDENTITY_START_KEY: 100, IDENTITY_STEP_KEY: 10}),
        T.StructField("name", T.StringType(), True),
    ])
    (DeltaTable.create(spark).location(tmp_table).addColumns(schema).execute())
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "name string")
    write_delta(df, tmp_table, mode="append")
    dt = DeltaTable.forPath(spark, tmp_table)
    vals = [r["rid"] for r in dt.toDF().select("rid").collect()]
    assert len(set(vals)) == 3
    assert all(v >= 100 and (v - 100) % 10 == 0 for v in vals)
    # second write continues past the watermark — no collisions
    write_delta(df, tmp_table, mode="append")
    vals2 = [r["rid"] for r in dt.toDF().select("rid").collect()]
    assert len(set(vals2)) == 6


# ------------------------------------------------------ schema evolution ----

def test_merge_schemas_widening_and_errors():
    a = T.StructType([T.StructField("x", T.IntegerType()), T.StructField("y", T.StringType())])
    b = T.StructType([T.StructField("x", T.LongType()), T.StructField("z", T.DoubleType())])
    m = merge_schemas(a, b)
    assert dict((f.name, f.dataType.typeName()) for f in m.fields) == {
        "x": "long", "y": "string", "z": "double"}
    with pytest.raises(SchemaEvolutionError):
        merge_schemas(T.StructType([T.StructField("x", T.StringType())]),
                      T.StructType([T.StructField("x", T.DoubleType())]))


def test_append_without_merge_schema_rejects_new_columns(spark, tmp_table, sf_dir):
    write_delta(_orders(spark, sf_dir).limit(10), tmp_table)
    evolved = _orders(spark, sf_dir).limit(5).withColumn("extra", F.lit(1))
    with pytest.raises(Exception, match="mergeSchema"):
        write_delta(evolved, tmp_table, mode="append")


def test_add_columns_alter(spark, tmp_table, sf_dir):
    write_delta(_orders(spark, sf_dir).limit(10), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.addColumns([T.StructField("note", T.StringType())])
    out = dt.toDF()
    assert "note" in out.columns
    assert out.filter("note IS NOT NULL").count() == 0
    # writes can now fill it
    write_delta(_orders(spark, sf_dir).limit(3).withColumn("note", F.lit("n")),
                tmp_table, mode="append")
    assert dt.toDF().filter("note = 'n'").count() == 3


def test_properties_roundtrip(spark, tmp_table, sf_dir):
    write_delta(_orders(spark, sf_dir).limit(5), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.setProperties({"delta.deletedFileRetentionDuration": "interval 1 days", "team": "data"})
    props = dt.detail().collect()[0]["properties"]
    assert props["team"] == "data"
    assert DeltaLog.for_table(tmp_table).deleted_file_retention_ms() == 86_400_000
    dt.unsetProperties(["team"])
    assert "team" not in dt.detail().collect()[0]["properties"]


# ---------------------------------------------------------- concurrency ----

def test_concurrent_blind_appends_both_win(spark, tmp_table, sf_dir):
    """Two writers race the same version; the loser retries onto the
    next version (blind appends never conflict)."""
    orders = _orders(spark, sf_dir)
    write_delta(orders.limit(10), tmp_table)
    log = DeltaLog.for_table(tmp_table)

    t1 = OptimisticTransaction(log)
    t2 = OptimisticTransaction(log)
    from delta_spark.writer import write_files
    adds1 = write_files(orders.limit(5), log.table_path, [])
    adds2 = write_files(orders.limit(7), log.table_path, [])
    v1 = t1.commit(list(adds1), "WRITE")
    v2 = t2.commit(list(adds2), "WRITE")  # collides on v1+0 → retries
    assert {v1, v2} == {1, 2}
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 22


def test_concurrent_delete_delete_conflict(spark, tmp_table, sf_dir):
    write_delta(_orders(spark, sf_dir).limit(100), tmp_table)
    log = DeltaLog.for_table(tmp_table)
    t1 = OptimisticTransaction(log)
    t2 = OptimisticTransaction(log)
    victim = t1.snapshot.all_files[0]
    v = t1.commit([victim.remove()], "DELETE")
    assert v == 1
    with pytest.raises(ConcurrentDeleteDeleteException):
        t2.commit([victim.remove()], "DELETE")


def test_concurrent_metadata_change_conflict(spark, tmp_table, sf_dir):
    write_delta(_orders(spark, sf_dir).limit(10), tmp_table)
    log = DeltaLog.for_table(tmp_table)
    t1 = OptimisticTransaction(log)
    t2 = OptimisticTransaction(log)
    from delta_spark.actions import Metadata
    m = t1.metadata
    new_meta = Metadata(id=m.id, schemaString=m.schemaString,
                        partitionColumns=m.partitionColumns,
                        configuration={**m.configuration, "k": "v"})
    t1.commit([new_meta], "SET TBLPROPERTIES")
    t2.read_whole_table()
    with pytest.raises(MetadataChangedException):
        t2.commit([t2.snapshot.all_files[0].remove()], "DELETE")


def test_concurrent_append_vs_predicate_read(spark, tmp_table, sf_dir):
    """A writer that scanned with a predicate conflicts with appends
    matching that predicate, but not with disjoint appends."""
    orders = _orders(spark, sf_dir)
    write_delta(orders.limit(100), tmp_table, partition_by=["o_orderstatus"])
    log = DeltaLog.for_table(tmp_table)

    # disjoint: reader scanned status='F', winner appends status='O'
    t1 = OptimisticTransaction(log)
    t1.files_for_scan("o_orderstatus = 'F'")
    from delta_spark.writer import write_files
    w = OptimisticTransaction(log)
    adds = write_files(orders.filter("o_orderstatus = 'O'").limit(5),
                       log.table_path, ["o_orderstatus"])
    w.commit(list(adds), "WRITE")
    # t1's serializable commit must survive (disjoint partition)
    v = t1.commit([], "DELETE", isolation_level="Serializable")
    assert v == 2

    # overlapping: reader scanned status='O', winner appends status='O'
    t3 = OptimisticTransaction(log)
    t3.files_for_scan("o_orderstatus = 'O'")
    w2 = OptimisticTransaction(log)
    adds2 = write_files(orders.filter("o_orderstatus = 'O'").limit(5),
                        log.table_path, ["o_orderstatus"])
    w2.commit(list(adds2), "WRITE")
    with pytest.raises(ConcurrentAppendException):
        t3.commit([], "DELETE", isolation_level="Serializable")


def test_many_threads_append(spark, tmp_table, sf_dir):
    """Thread fuzz: 8 concurrent appends all land, totals correct."""
    orders = _orders(spark, sf_dir)
    write_delta(orders.limit(1), tmp_table)
    log = DeltaLog.for_table(tmp_table)
    from delta_spark.writer import write_files

    errs = []

    def worker(i):
        try:
            txn = OptimisticTransaction(log)
            adds = write_files(orders.limit(3), log.table_path, [])
            txn.commit(list(adds), "WRITE")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 1 + 8 * 3
    assert DeltaLog.for_table(tmp_table).latest_version() == 8


# -------------------------------------------------------- column mapping ----

def test_rename_column_metadata_only(spark, tmp_table, sf_dir):
    orders = _orders(spark, sf_dir).limit(200)
    write_delta(orders, tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    files_before = set(DeltaLog.for_table(tmp_table).update().active)
    dt.renameColumn("o_totalprice", "price")
    files_after = set(DeltaLog.for_table(tmp_table).update().active)
    assert files_before == files_after  # no data rewrite
    out = dt.toDF()
    assert "price" in out.columns and "o_totalprice" not in out.columns
    want = orders.agg(F.sum("o_totalprice")).collect()[0][0]
    assert out.agg(F.sum("price")).collect()[0][0] == pytest.approx(want)
    # stats skipping works against the renamed logical name
    snap = DeltaLog.for_table(tmp_table).update()
    assert snap.files_for_scan("price < 0") == []
    # appends after the rename land under the new logical name
    write_delta(out.limit(10), tmp_table, mode="append")
    assert dt.toDF().count() == 210


def test_drop_column_metadata_only(spark, tmp_table, sf_dir):
    orders = _orders(spark, sf_dir).limit(50)
    write_delta(orders, tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.dropColumn("o_orderpriority")
    out = dt.toDF()
    assert "o_orderpriority" not in out.columns
    assert out.count() == 50
    with pytest.raises(ValueError, match="no such column"):
        dt.dropColumn("o_orderpriority")


def test_id_mapping_rename_and_drop(spark, tmp_table, sf_dir):
    """IdMapping mode (DeltaColumnMapping.scala:107): a creation-time
    property (the reference only allows the none→name upgrade) — files
    carry parquet field_ids, reads resolve by id, RENAME/DROP are
    metadata-only like NameMapping."""
    from pyspark.sql import types as T
    from delta_spark.table import DeltaTable as DT

    orders = _orders(spark, sf_dir).limit(200)
    (DT.create(spark).location(tmp_table)
     .addColumns(orders.schema)
     .property("delta.columnMapping.mode", "id")
     .execute())
    write_delta(orders, tmp_table, mode="append")
    dt = DeltaTable.forPath(spark, tmp_table)
    snap = DeltaLog.for_table(tmp_table).update()
    assert snap.column_mapping_mode == "id"
    # every data file carries parquet field_ids
    import pyarrow.parquet as pq
    import os as _os
    for f in snap.all_files:
        sch = pq.read_schema(_os.path.join(tmp_table, f.path))
        fids = [(fl.metadata or {}).get(b"PARQUET:field_id") for fl in sch]
        assert all(v is not None for v in fids), "id-mode file lacks field_ids"
    files_before = set(snap.active)
    dt.renameColumn("o_totalprice", "price")
    assert set(DeltaLog.for_table(tmp_table).update().active) == files_before
    out = dt.toDF()
    assert "price" in out.columns and "o_totalprice" not in out.columns
    want = orders.agg(F.sum("o_totalprice")).collect()[0][0]
    assert out.agg(F.sum("price")).collect()[0][0] == pytest.approx(want)
    write_delta(out.limit(10), tmp_table, mode="append")
    assert dt.toDF().count() == 210
    # DROP stays metadata-only and errors on a second attempt
    dt.dropColumn("o_orderpriority")
    assert "o_orderpriority" not in dt.toDF().columns
    with pytest.raises(ValueError, match="no such column"):
        dt.dropColumn("o_orderpriority")
    # DML after rename under id mode
    dt.delete("price > 200000")
    assert dt.toDF().filter("price > 200000").count() == 0
    # stats skipping works against the renamed logical name
    assert DeltaLog.for_table(tmp_table).update().files_for_scan("price < 0") == []


def test_id_mapping_upgrade_of_nonempty_table_rejected(spark, tmp_table, sf_dir):
    write_delta(_orders(spark, sf_dir).limit(10), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    with pytest.raises(ValueError, match="id column mapping"):
        dt.enableColumnMapping(mode="id")


def test_id_mapping_new_table_via_builder(spark, tmp_table, sf_dir):
    from delta_spark.table import DeltaTable as DT
    (DT.create(spark).location(tmp_table)
     .addColumn("k", "long").addColumn("v", "string")
     .property("delta.columnMapping.mode", "id")
     .execute())
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    write_delta(df, tmp_table, mode="append")
    dt = DT.forPath(spark, tmp_table)
    assert dt.toDF().count() == 2
    dt.renameColumn("v", "val")
    assert sorted(dt.toDF().columns) == ["k", "val"]
    assert dt.toDF().filter("val = 'a'").count() == 1


def test_rename_then_dml(spark, tmp_table, sf_dir):
    orders = _orders(spark, sf_dir).limit(100)
    write_delta(orders, tmp_table, partition_by=["o_orderstatus"])
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.renameColumn("o_totalprice", "price")
    dt.delete("price > 200000")
    want = orders.filter("NOT coalesce(o_totalprice > 200000, false)").count()
    assert dt.toDF().count() == want
    dt.update({"price": "price * 2"}, "price < 1000")
    # partition pruning still intact after rename
    assert dt.toDF("o_orderstatus = 'F'").count() == \
        dt.toDF().filter("o_orderstatus = 'F'").count()


def test_row_tracking(spark, tmp_table, sf_dir):
    from delta_spark.reader import read_with_row_ids

    write_delta(_orders(spark, sf_dir).limit(50), tmp_table,
                configuration={"delta.enableRowTracking": "true"})
    write_delta(_orders(spark, sf_dir).limit(30), tmp_table, mode="append")
    log = DeltaLog.for_table(tmp_table)
    snap = log.update()
    assert all(f.baseRowId is not None for f in snap.all_files)
    df = read_with_row_ids(spark, snap)
    rows = df.select("_row_id").collect()
    ids = [r["_row_id"] for r in rows]
    assert len(ids) == 80 and len(set(ids)) == 80  # unique stable ids
    # stable across reads
    ids2 = [r["_row_id"] for r in read_with_row_ids(spark, log.update()).select("_row_id").collect()]
    assert sorted(ids) == sorted(ids2)


def test_optimize_does_not_conflict_with_append(spark, tmp_table, sf_dir):
    """dataChange=false commits take SnapshotIsolation: a concurrent
    append between OPTIMIZE's read and commit must not abort it
    (isolationLevels.scala:70 semantics)."""
    from delta_spark.commands.optimize import OptimizeBuilder
    from delta_spark.io import write_delta as wd

    orders = _orders(spark, sf_dir)
    for i in range(4):
        wd(orders.limit(50), tmp_table, mode="append")
    log = DeltaLog.for_table(tmp_table)

    # interleave: capture optimize's txn snapshot, append, then commit
    from delta_spark.transaction import OptimisticTransaction
    from delta_spark.reader import read_files_df
    from delta_spark.writer import write_table_files

    txn = OptimisticTransaction(log)
    snap = txn.snapshot
    small = snap.all_files
    df = read_files_df(spark, snap, small)
    new = write_table_files(df.repartition(1), snap, data_change=False)
    wd(orders.limit(5), tmp_table, mode="append")  # concurrent append wins v4
    v = txn.commit(list(new) + [f.remove(data_change=False) for f in small], "OPTIMIZE")
    assert v == 5  # retried past the append, no conflict
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF().count() == 205  # both effects present


def test_merge_not_matched_by_source(spark, tmp_table, sf_dir):
    orders = _orders(spark, sf_dir)
    write_delta(orders.limit(100), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    src = orders.limit(30).select("o_orderkey", "o_totalprice")
    (dt.merge(src, "target.o_orderkey = source.o_orderkey")
       .whenMatchedUpdate({"o_orderpriority": "'KEPT'"})
       .whenNotMatchedBySourceDelete("o_totalprice < 50000")
       .whenNotMatchedBySourceUpdate({"o_orderpriority": "'STALE'"})
       .execute())
    out = dt.toDF()
    # rows matched by source → KEPT; unmatched cheap rows deleted;
    # unmatched remaining rows → STALE
    assert out.filter("o_orderpriority = 'KEPT'").count() == 30
    survivors = orders.limit(100).join(src, "o_orderkey", "left_anti") \
        .filter("NOT coalesce(o_totalprice < 50000, false)").count()
    assert out.filter("o_orderpriority = 'STALE'").count() == survivors
    assert out.count() == 30 + survivors


def test_append_only_table(spark, tmp_table, sf_dir):
    """delta.appendOnly (DeltaConfigs.IS_APPEND_ONLY): appends and
    dataChange=false rearrangement allowed; DML rejected."""
    df = _orders(spark, sf_dir).limit(200)
    write_delta(df, tmp_table, configuration={"delta.appendOnly": "true"})
    write_delta(df.limit(50), tmp_table, mode="append")  # allowed
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF().count() == 250
    with pytest.raises(ValueError, match="only allow appends"):
        dt.delete("o_orderkey % 2 = 0")
    with pytest.raises(ValueError, match="only allow appends"):
        dt.update({"o_totalprice": "o_totalprice * 2"}, "o_orderkey = 1")
    # OPTIMIZE rearranges without dataChange → allowed
    dt.optimize().executeCompaction()
    assert dt.toDF().count() == 250
    # unsetting the property re-enables DML
    dt.unsetProperties(["delta.appendOnly"])
    dt.delete("o_orderkey % 2 = 0")
    assert dt.toDF().count() < 250


def test_conflict_absorption_does_not_mutate_shared_snapshot(spark, tmp_table, sf_dir):
    """Retrying through a conflict absorbs the winner into the txn's
    snapshot — but on a CLONE: the log's cached snapshot (shared with
    in-process readers at our read version) must not change."""
    from delta_spark.writer import write_files

    orders = _orders(spark, sf_dir)
    write_delta(orders.limit(10), tmp_table)
    log = DeltaLog.for_table(tmp_table)

    reader_snap = log.update()            # shared cached snapshot @ v0
    files_v0 = set(reader_snap.active.keys())

    t1 = OptimisticTransaction(log)       # holds the same object
    assert t1.snapshot is reader_snap
    w = OptimisticTransaction(log)
    w.commit(list(write_files(orders.limit(5), log.table_path, [])), "WRITE")
    t1.commit(list(write_files(orders.limit(3), log.table_path, [])), "WRITE")

    # the reader's handle still sees exactly the v0 state
    assert set(reader_snap.active.keys()) == files_v0
    assert reader_snap.version == 0
    # and the table converged to all three writes
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 18


def test_retry_recomputes_ict_and_row_ids(spark, tmp_table, sf_dir):
    """After absorbing a winner, a retried commit must re-derive its
    in-commit timestamp (monotonic past the winner's) and its
    baseRowId ranges (no overlap with the winner's files)."""
    from delta_spark.writer import write_files

    orders = _orders(spark, sf_dir)
    write_delta(orders.limit(10), tmp_table,
                configuration={"delta.enableRowTracking": "true",
                               "delta.enableInCommitTimestamps": "true"})
    log = DeltaLog.for_table(tmp_table)

    t1 = OptimisticTransaction(log)
    w = OptimisticTransaction(log)
    w.commit(list(write_files(orders.limit(5), log.table_path, [])), "WRITE")
    t1.commit(list(write_files(orders.limit(3), log.table_path, [])), "WRITE")

    snap = log.update()
    ranges = sorted(
        (f.baseRowId, f.baseRowId + max(f.num_records or 0, 1) - 1)
        for f in snap.all_files if f.baseRowId is not None)
    assert ranges, "row tracking assigned no baseRowIds"
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert s2 > e1, f"overlapping baseRowId ranges {(s1, e1)} / {(s2, e2)}"
    ts = [log._commit_timestamp(v) for v in range(log.latest_version() + 1)]
    assert all(a < b for a, b in zip(ts, ts[1:])), f"non-monotonic ICT {ts}"


def test_incremental_update_falls_back_to_checkpoint(spark, tmp_table, sf_dir):
    """A long-lived DeltaLog whose cached snapshot predates log cleanup
    must rebuild from the checkpoint instead of failing on the missing
    commit json (SnapshotManagement checkpoint fallback)."""
    import os as _os

    from delta_spark.writer import write_files

    orders = _orders(spark, sf_dir)
    write_delta(orders.limit(5), tmp_table)
    log = DeltaLog.for_table(tmp_table)
    snap0 = log.update()
    assert snap0.version == 0

    for _ in range(3):
        txn = OptimisticTransaction(log)
        txn.commit(list(write_files(orders.limit(2), log.table_path, [])), "WRITE")
    log.write_checkpoint(log.update())

    # log cleanup removed v1's json (the checkpoint covers it); rewind
    # the cache to simulate a handle that last updated at v0
    _os.remove(_os.path.join(tmp_table, "_delta_log", "%020d.json" % 1))
    log._snapshot = snap0
    snap = log.update()
    assert snap.version == 3
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 11


def test_mixed_dml_stress_checksum_chain(spark, tmp_table, sf_dir):
    """Mixed concurrent DML storm: disjoint-partition deletes race
    blind appends through the retry machinery. Invariants: every
    worker lands, the final state equals the sequential outcome, and
    the (now incremental) per-version checksum chain stays EXACT at
    the head — the crc fallback must pin its version even when
    update() has advanced past it."""
    import json as _json

    from delta_spark.table import DeltaTable as DT

    from delta_spark.datasets import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(3000).cache()
    li.count()
    write_delta(li, tmp_table, partition_by=["l_returnflag"])
    log = DeltaLog.for_table(tmp_table)
    base_count = 3000
    add_counts = [50, 60, 70, 80]
    errs = []

    def appender(i):
        try:
            write_delta(li.limit(add_counts[i]), tmp_table, mode="append")
        except Exception as e:  # pragma: no cover
            errs.append(("append", i, e))

    def deleter(flag):
        try:
            DT.forPath(spark, tmp_table).delete(
                f"l_returnflag = '{flag}' AND l_quantity > 200")
        except Exception as e:  # pragma: no cover
            errs.append(("delete", flag, e))

    workers = ([threading.Thread(target=appender, args=(i,))
                for i in range(4)]
               + [threading.Thread(target=deleter, args=(f,))
                  for f in ("A", "N", "R")])
    for t in workers:
        t.start()
    for t in workers:
        t.join()
    assert not errs, errs
    DeltaLog.clear_cache()
    log = DeltaLog.for_table(tmp_table)
    snap = log.update()
    # deletes hit quantity > 200 which never occurs → pure appends land
    assert DT.forPath(spark, tmp_table).toDF().count() == \
        base_count + sum(add_counts)
    assert snap.version == 7  # v0 (initial write) + 7 worker commits
    with open(os.path.join(log.log_path,
                           "%020d.crc" % snap.version)) as fh:
        crc = _json.load(fh)
    assert crc["numFiles"] == snap.num_files
    assert crc["tableSizeBytes"] == snap.size_in_bytes


def test_row_ids_survive_optimize(spark, tmp_table, sf_dir):
    """Stable row ids are MATERIALIZED through dataChange=false
    rewrites (PROTOCOL.md:1684): after OPTIMIZE compaction and ZORDER,
    every row keeps the id it had before, via the
    delta.rowTracking.materializedRowIdColumnName column."""
    from delta_spark.datasets import load_table
    from delta_spark.reader import read_with_row_ids

    li = (load_table(spark, sf_dir, "lineitem").limit(800)
          .withColumn("uid", F.monotonically_increasing_id()))
    write_delta(li.limit(500), tmp_table,
                configuration={"delta.enableRowTracking": "true"})
    write_delta(li.subtract(li.limit(500)), tmp_table, mode="append")
    log = DeltaLog.for_table(tmp_table)
    snap = log.update()
    mat = snap.configuration.get(
        "delta.rowTracking.materializedRowIdColumnName")
    assert mat and mat.startswith("_row-id-col-")
    before = {r["uid"]: r["_row_id"] for r in
              read_with_row_ids(spark, snap).select("uid", "_row_id").collect()}
    assert len(set(before.values())) == len(before)  # unique ids

    DeltaTable.forPath(spark, tmp_table).optimize() \
        .executeCompaction(min_file_size=1 << 30)
    snap2 = DeltaLog.for_table(tmp_table).update()
    assert {f.path for f in snap2.all_files} != {f.path for f in snap.all_files}
    after = {r["uid"]: r["_row_id"] for r in
             read_with_row_ids(spark, snap2).select("uid", "_row_id").collect()}
    assert after == before  # ids preserved through the rewrite

    DeltaTable.forPath(spark, tmp_table).optimize() \
        .executeZOrderBy("l_orderkey", "l_partkey")
    snap3 = DeltaLog.for_table(tmp_table).update()
    zafter = {r["uid"]: r["_row_id"] for r in
              read_with_row_ids(spark, snap3).select("uid", "_row_id").collect()}
    assert zafter == before

    # the materialized column stays invisible to normal scans
    assert mat not in DeltaTable.forPath(spark, tmp_table).toDF().columns


def test_row_lineage_through_dml(spark, tmp_table, sf_dir):
    """Row lineage (PROTOCOL.md:1712-1730): stable row ids survive
    UPDATE/MERGE/DELETE rewrites; the stable row COMMIT VERSION bumps
    only for rows the commit actually modified."""
    from delta_spark.datasets import load_table
    from delta_spark.reader import read_with_row_ids

    li = (load_table(spark, sf_dir, "lineitem").limit(400)
          .withColumn("uid", F.monotonically_increasing_id())
          .localCheckpoint())
    write_delta(li, tmp_table,
                configuration={"delta.enableRowTracking": "true"})
    log = DeltaLog.for_table(tmp_table)

    def lineage():
        return {r["uid"]: (r["_row_id"], r["_row_commit_version"])
                for r in read_with_row_ids(spark, log.update())
                .select("uid", "_row_id", "_row_commit_version").collect()}

    v0 = lineage()
    assert {cv for _, cv in v0.values()} == {0}

    dt = DeltaTable.forPath(spark, tmp_table)
    dt.update({"l_tax": "l_tax + CAST(1.0 AS DOUBLE)"}, "l_quantity < 10")
    v1 = lineage()
    assert set(v1) == set(v0)
    assert all(v1[u][0] == v0[u][0] for u in v0)  # ids stable
    changed = {r["uid"] for r in dt.toDF("l_quantity < 10")
               .select("uid").collect()}
    for u, (rid, cv) in v1.items():
        assert cv == (1 if u in changed else 0), (u, cv)

    # MERGE: update some rows, insert new ones
    src = (li.limit(60).selectExpr("uid", "l_orderkey", "l_linenumber")
           .localCheckpoint())
    (dt.merge(src.selectExpr("uid AS s_uid"), "target.uid = source.s_uid")
       .whenMatchedUpdate({"l_tax": "target.l_tax + CAST(1.0 AS DOUBLE)"})
       .execute())
    v2 = lineage()
    assert all(v2[u][0] == v0[u][0] for u in v0)  # ids still stable
    merged = {r["uid"] for r in src.select("uid").collect()}
    for u, (rid, cv) in v2.items():
        if u in merged:
            assert cv == 2
        else:
            assert cv == v1[u][1]

    # DELETE rewrite: survivors keep id AND commit version
    dt.delete("l_quantity > 45")
    v3 = lineage()
    assert set(v3) <= set(v2)
    for u, (rid, cv) in v3.items():
        assert (rid, cv) == v2[u]


def test_row_tracking_backfill_on_enable(spark, tmp_table, sf_dir):
    """Enabling row tracking on an EXISTING populated table backfills
    baseRowId ranges (RowTrackingBackfillCommand role) — ids are unique
    immediately, survive OPTIMIZE, and the checksum stays exact."""
    import json as _json

    from delta_spark.datasets import load_table
    from delta_spark.reader import read_with_row_ids

    li = (load_table(spark, sf_dir, "lineitem").limit(600)
          .withColumn("uid", F.monotonically_increasing_id())
          .localCheckpoint())
    write_delta(li.limit(400), tmp_table)
    write_delta(li.subtract(li.limit(400)), tmp_table, mode="append")
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.setProperties({"delta.enableRowTracking": "true"})
    log = DeltaLog.for_table(tmp_table)
    snap = log.update()
    assert all(f.baseRowId is not None for f in snap.all_files)
    ids = {r["uid"]: r["_row_id"] for r in read_with_row_ids(spark, snap)
           .select("uid", "_row_id").collect()}
    assert len(set(ids.values())) == 600  # no collisions
    dt.optimize().executeCompaction(min_file_size=1 << 30)
    snap2 = log.update()
    after = {r["uid"]: r["_row_id"] for r in read_with_row_ids(spark, snap2)
             .select("uid", "_row_id").collect()}
    assert after == ids
    with open(os.path.join(log.log_path, "%020d.crc" % snap2.version)) as fh:
        crc = _json.load(fh)
    assert crc["numFiles"] == snap2.num_files
    assert crc["tableSizeBytes"] == snap2.size_in_bytes


def test_concurrent_row_tracked_appends_no_id_collision(spark, tmp_table,
                                                        sf_dir):
    """Retrying writers recompute the row-id watermark from the
    ABSORBED snapshot, so concurrent appends claim disjoint contiguous
    baseRowId ranges."""
    from delta_spark.datasets import load_table
    from delta_spark.reader import read_with_row_ids

    li = load_table(spark, sf_dir, "lineitem").limit(300).cache()
    li.count()
    write_delta(li, tmp_table,
                configuration={"delta.enableRowTracking": "true"})
    errs = []

    def w(n):
        try:
            write_delta(li.limit(n), tmp_table, mode="append")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=w, args=(40 + i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(tmp_table).update()
    ids = read_with_row_ids(spark, snap).select("_row_id")
    n = 300 + sum(40 + i for i in range(6))
    assert ids.count() == n
    assert ids.distinct().count() == n
    ranges = sorted((f.baseRowId, f.baseRowId + (f.num_records or 1))
                    for f in snap.all_files)
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert e1 <= s2  # disjoint ranges


def test_conflict_matrix(spark, sf_dir, tmp_path):
    """The reference's OptimisticTransactionSuite conflict matrix in one
    table: (winner commit, loser read set, isolation) → outcome. Covers
    the cells the targeted tests above don't: blind-append admissibility
    per isolation level, rewrite-vs-reader, delete-read, SetTransaction /
    DomainMetadata collisions, protocol bumps, SnapshotIsolation."""
    from delta_spark.actions import DomainMetadata, Protocol, SetTransaction
    from delta_spark.exceptions import (
        ConcurrentAppendException, ConcurrentDeleteReadException,
        ConcurrentTransactionException, DeltaConcurrentException,
        ProtocolChangedException)
    from delta_spark.writer import write_files

    orders = _orders(spark, sf_dir)

    def blind_adds(log):
        return list(write_files(orders.limit(3), log.table_path, []))

    def rewrite(log, txn):
        # dataChange add+remove — NOT a blind append
        f = txn.snapshot.all_files[0]
        return blind_adds(log) + [f.remove()]

    # (name, loser_read, winner_actions(log, winner_txn), loser_actions(log, loser_txn),
    #  loser_isolation, expected exception or None)
    cases = [
        ("blind_append_vs_whole_read_ws",
         "whole", lambda l, t: blind_adds(l), lambda l, t: blind_adds(l),
         "WriteSerializable", None),
        ("blind_append_vs_whole_read_serializable",
         "whole", lambda l, t: blind_adds(l), lambda l, t: blind_adds(l),
         "Serializable", ConcurrentAppendException),
        ("blind_append_vs_matching_predicate_ws",
         "pred", lambda l, t: blind_adds(l), lambda l, t: [],
         "WriteSerializable", None),
        ("rewrite_vs_whole_read",
         "whole", rewrite, lambda l, t: [],
         "WriteSerializable", ConcurrentAppendException),
        # non-blind appends (winner read before writing) conflict with
        # readers under WriteSerializable but not SnapshotIsolation;
        # delete-read conflicts below hold at EVERY isolation level
        ("nonblind_append_vs_snapshot_isolation_reader",
         "whole", lambda l, t: (t.read_whole_table() or blind_adds(l)),
         lambda l, t: [], "SnapshotIsolation", None),
        ("nonblind_append_vs_whole_read_ws",
         "whole", lambda l, t: (t.read_whole_table() or blind_adds(l)),
         lambda l, t: [], "WriteSerializable", ConcurrentAppendException),
        ("delete_of_read_file",
         "whole", lambda l, t: [t.snapshot.all_files[0].remove()],
         lambda l, t: [], "WriteSerializable", ConcurrentDeleteReadException),
        ("set_transaction_same_app",
         None, lambda l, t: [SetTransaction("app1", 7, None)],
         lambda l, t: [SetTransaction("app1", 8, None)],
         "WriteSerializable", ConcurrentTransactionException),
        ("domain_metadata_same_domain",
         None, lambda l, t: [DomainMetadata("d.x", "{}", False)],
         lambda l, t: [DomainMetadata("d.x", '{"a":1}', False)],
         "WriteSerializable", DeltaConcurrentException),
        ("protocol_change_vs_any",
         None, lambda l, t: [Protocol(1, 2)], lambda l, t: blind_adds(l),
         "WriteSerializable", ProtocolChangedException),
    ]

    for name, read, win_fn, lose_fn, iso, expect in cases:
        path = str(tmp_path / name)
        write_delta(orders.limit(50), path)
        DeltaLog.clear_cache()
        log = DeltaLog.for_table(path)
        loser = OptimisticTransaction(log)
        if read == "whole":
            loser.read_whole_table()
        elif read == "pred":
            loser.files_for_scan("o_orderkey IS NOT NULL")
        winner = OptimisticTransaction(log)
        winner.commit(win_fn(log, winner), "WINNER")
        if expect is None:
            v = loser.commit(lose_fn(log, loser), "LOSER", isolation_level=iso)
            assert v == 2, name
        else:
            with pytest.raises(expect):
                loser.commit(lose_fn(log, loser), "LOSER", isolation_level=iso)


def test_identity_generator_builder_api(spark, tmp_table):
    """DeltaTableBuilder.addColumn accepts IdentityGenerator for
    GENERATED ALWAYS AS IDENTITY / GENERATED BY DEFAULT AS IDENTITY
    (python/delta/tables.py:1278,1398-1460)."""
    from delta_spark import IdentityGenerator

    (DeltaTable.create(spark).location(tmp_table)
        .addColumn("k", "BIGINT")
        .addColumn("uid", "BIGINT",
                   generatedAlwaysAs=IdentityGenerator(start=100, step=10))
        .execute())
    write_delta(spark.sql("SELECT CAST(10 AS BIGINT) AS k"),
                tmp_table, mode="append")
    dt = DeltaTable.forPath(spark, tmp_table)
    assert [r["uid"] for r in dt.toDF().collect()] == [100]
    # ALWAYS AS rejects explicit values
    with pytest.raises(Exception, match="GENERATED ALWAYS"):
        write_delta(
            spark.sql("SELECT CAST(1 AS BIGINT) AS k, CAST(5 AS BIGINT) AS uid"),
            tmp_table, mode="append")
    with pytest.raises(ValueError, match="step"):
        IdentityGenerator(step=0)
    with pytest.raises(ValueError, match="both"):
        DeltaTable.create(spark).addColumn(
            "x", "BIGINT", generatedAlwaysAs=IdentityGenerator(),
            generatedByDefaultAs=IdentityGenerator())


def test_identity_by_default_builder_allows_explicit(spark, tmp_table):
    from delta_spark import IdentityGenerator

    (DeltaTable.create(spark).location(tmp_table)
        .addColumn("k", "BIGINT")
        .addColumn("uid", "BIGINT", generatedByDefaultAs=IdentityGenerator())
        .execute())
    write_delta(
        spark.sql("SELECT CAST(1 AS BIGINT) AS k, CAST(77 AS BIGINT) AS uid"),
        tmp_table, mode="append")
    write_delta(spark.sql("SELECT CAST(2 AS BIGINT) AS k"),
                tmp_table, mode="append")
    dt = DeltaTable.forPath(spark, tmp_table)
    assert sorted((r["k"], r["uid"]) for r in dt.toDF().collect()) == \
        [(1, 77), (2, 1)]


def test_clustering_domain_travels_with_clone_and_restore(spark, tmp_table, tmp_path):
    """The delta.clustering metadata domain is COPIED by CLONE
    (DomainMetadataUtils.METADATA_DOMAIN_TO_COPY_FOR_CLONE_TABLE) and
    RECREATED from the restored snapshot by RESTORE
    (handleDomainMetadataForRestoreTable) — without this, a cloned or
    restored clustered table silently stops clustering on OPTIMIZE."""
    import json as _json

    write_delta(spark.range(50).withColumnRenamed("id", "a")
                .withColumn("b", F.col("a") % 5), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.alterClusterBy(["b"])

    def cols_of(path):
        dm = DeltaLog.for_table(path).update().domain_metadata.get("delta.clustering")
        if dm is None or dm.removed:
            return None
        return _json.loads(dm.configuration)["clusteringColumns"]

    clone_path = str(tmp_path / "clone")
    dt.clone(clone_path, isShallow=True)
    assert cols_of(clone_path) == ["b"]

    v_b = DeltaLog.for_table(tmp_table).update().version
    dt.alterClusterBy(["a"])
    assert cols_of(tmp_table) == ["a"]
    dt.restoreToVersion(v_b)
    assert cols_of(tmp_table) == ["b"]
    # restoring to the pre-clustering version drops the domain
    dt.restoreToVersion(0)
    assert cols_of(tmp_table) is None


def test_datachange_false_backfill_still_conflicts(spark, tmp_table, sf_dir):
    """A winner committing NEW-path AddFiles with dataChange=false and
    no removes (a backfill-like op, not a rearrangement) must conflict
    like any append: the reference's changedDataAddedFiles is NOT
    dataChange-filtered (ConflictChecker.scala:182). Only the OPTIMIZE
    shape — dataChange=false adds paired with removes — is exempt."""
    from dataclasses import replace as _replace

    from delta_spark.writer import write_files

    orders = _orders(spark, sf_dir)
    write_delta(orders.limit(100), tmp_table)
    log = DeltaLog.for_table(tmp_table)

    t1 = OptimisticTransaction(log)
    t1.read_whole_table()

    # winner: brand-new files, dataChange=false, NO removes
    w = OptimisticTransaction(log)
    adds = [_replace(a, dataChange=False)
            for a in write_files(orders.limit(5), log.table_path, [])]
    w.commit(adds, "BACKFILL")

    with pytest.raises(ConcurrentAppendException):
        t1.commit([], "DELETE", isolation_level="Serializable")

    # control: the OPTIMIZE shape (adds paired with removes of files we
    # did not read) stays exempt from the APPEND check — it surfaces
    # through the remove checks only when we read the removed files
    t2 = OptimisticTransaction(log)
    t2.files_for_scan("o_orderkey < 0")  # reads nothing
    snap = log.update()
    victim = snap.all_files[:1]
    from delta_spark.reader import read_files_df
    from delta_spark.writer import write_table_files
    df = read_files_df(spark, snap, victim)
    new = write_table_files(df.repartition(1), snap, data_change=False)
    w2 = OptimisticTransaction(log)
    w2.commit(list(new) + [f.remove(data_change=False) for f in victim],
              "OPTIMIZE")
    v = t2.commit([], "DELETE", isolation_level="Serializable")
    assert v >= 2
