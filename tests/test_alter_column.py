"""ALTER COLUMN surface (reference alterDeltaTableCommands.scala:
AlterTableChangeColumnDeltaCommand, AlterTableAddColumnsDeltaCommand):
SET/DROP NOT NULL (SET verifies existing data by scan), SET/DROP
DEFAULT (auto-adds allowColumnDefaults), COMMENT, and ADD COLUMN
FIRST/AFTER positioning."""

import pytest
from pyspark.sql import functions as F

from delta_spark import DeltaLog, DeltaTable, delta_sql
from delta_spark.io import write_delta


def _make(spark, tmp_table, sql="SELECT 1 AS id, CAST(NULL AS STRING) AS s"):
    write_delta(spark.sql(sql), tmp_table)
    return DeltaTable.forPath(spark, tmp_table)


def test_set_not_null_verifies_scan(spark, tmp_table):
    dt = _make(spark, tmp_table)
    with pytest.raises(ValueError, match="NULL"):
        dt.setColumnNullability("s", False)
    dt.setColumnNullability("id", False)
    snap = DeltaLog.for_table(tmp_table).update()
    assert not snap.schema["id"].nullable
    # DROP NOT NULL is always allowed
    dt.setColumnNullability("id", True)
    assert DeltaLog.for_table(tmp_table).update().schema["id"].nullable


def test_set_default_applies_on_insert(spark, tmp_table):
    dt = _make(spark, tmp_table, "SELECT 1 AS id, 'x' AS s")
    dt.setColumnDefault("s", "'dflt'")
    p = DeltaLog.for_table(tmp_table).update().protocol
    assert "allowColumnDefaults" in (p.writerFeatures or [])
    write_delta(spark.sql("SELECT 2 AS id"), tmp_table, mode="append")
    rows = {r["id"]: r["s"] for r in dt.toDF().collect()}
    assert rows == {1: "x", 2: "dflt"}
    dt.dropColumnDefault("s")
    # without the default, the omitted non-null column is a schema
    # mismatch again (no silent NULL backfill)
    from delta_spark.writer import SchemaMismatchError

    with pytest.raises(SchemaMismatchError):
        write_delta(spark.sql("SELECT 3 AS id"), tmp_table, mode="append")
    with pytest.raises(Exception):
        dt.setColumnDefault("s", "not_a_function(")


def test_column_comment(spark, tmp_table):
    dt = _make(spark, tmp_table)
    dt.setColumnComment("id", "the key")
    snap = DeltaLog.for_table(tmp_table).update()
    assert snap.schema["id"].metadata["comment"] == "the key"


def test_add_columns_first_after(spark, tmp_table):
    dt = _make(spark, tmp_table, "SELECT 1 AS a, 2 AS c")
    delta_sql(spark,
              f"ALTER TABLE delta.`{tmp_table}` "
              "ADD COLUMNS (b INT AFTER a, z STRING FIRST)")
    snap = DeltaLog.for_table(tmp_table).update()
    assert [f.name for f in snap.schema.fields] == ["z", "a", "b", "c"]
    r = dt.toDF().collect()[0]
    assert (r["z"], r["a"], r["b"], r["c"]) == (None, 1, None, 2)
    with pytest.raises(ValueError, match="does not exist"):
        dt.addColumns([__import__("pyspark").sql.types.StructField(
            "q", __import__("pyspark").sql.types.IntegerType())],
            [("after", "nope")])


def test_sql_alter_column_verbs(spark, tmp_table):
    dt = _make(spark, tmp_table, "SELECT 1 AS id, 'x' AS s")
    p = f"delta.`{tmp_table}`"
    delta_sql(spark, f"ALTER TABLE {p} ALTER COLUMN id SET NOT NULL")
    delta_sql(spark, f"ALTER TABLE {p} ALTER COLUMN s SET DEFAULT 'd'")
    delta_sql(spark, f"ALTER TABLE {p} ALTER COLUMN s COMMENT 'doc'")
    snap = DeltaLog.for_table(tmp_table).update()
    assert not snap.schema["id"].nullable
    assert snap.schema["s"].metadata["CURRENT_DEFAULT"] == "'d'"
    assert snap.schema["s"].metadata["comment"] == "doc"
    delta_sql(spark, f"ALTER TABLE {p} ALTER COLUMN s DROP DEFAULT")
    delta_sql(spark, f"ALTER TABLE {p} ALTER COLUMN id DROP NOT NULL")
    snap = DeltaLog.for_table(tmp_table).update()
    assert "CURRENT_DEFAULT" not in snap.schema["s"].metadata
    assert snap.schema["id"].nullable


def test_drop_rename_blocked_by_dependent_expressions(spark, tmp_table):
    """SchemaUtils findDependentConstraints / generated-column deps:
    DROP/RENAME refuse while stored SQL text references the column."""
    from delta_spark.io import write_delta as wd

    wd(spark.sql("SELECT 1 AS a, 2 AS b"), tmp_table,
       configuration={"delta.columnMapping.mode": "name"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.addCheckConstraint("ab", "a < b")
    with pytest.raises(ValueError, match="CHECK constraint ab"):
        dt.dropColumn("b")
    with pytest.raises(ValueError, match="CHECK constraint ab"):
        dt.renameColumn("b", "b2")
    dt.dropCheckConstraint("ab")
    dt.renameColumn("b", "b2")  # now fine
    assert [f.name for f in dt.toDF().schema.fields] == ["a", "b2"]


def test_drop_generation_source_blocked(spark, tmp_table):
    from delta_spark.table import DeltaTable as DT

    (DT.create(spark).location(tmp_table)
       .property("delta.columnMapping.mode", "name")
       .addColumn("id", "INT")
       .addColumn("g", "INT", generatedAlwaysAs="id * 2").execute())
    dt = DeltaTable.forPath(spark, tmp_table)
    with pytest.raises(ValueError, match="generation expression"):
        dt.dropColumn("id")
    dt.dropColumn("g")  # dropping the generated column itself is fine


def test_rename_partition_column_updates_metadata(spark, tmp_table):
    from delta_spark.io import write_delta as wd

    wd(spark.sql("SELECT 1 AS a, 'p1' AS p UNION ALL SELECT 2, 'p2'"),
       tmp_table, partition_by=["p"],
       configuration={"delta.columnMapping.mode": "name"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.renameColumn("p", "region")
    snap = DeltaLog.for_table(tmp_table).update()
    assert snap.partition_columns == ["region"]
    # partition pruning engages under the NEW logical name
    assert len(snap.files_for_scan("region = 'p1'")) == 1
    assert {r["region"] for r in dt.toDF().collect()} == {"p1", "p2"}
    # and writes keep landing in the same physical partitions
    wd(spark.sql("SELECT 3 AS a, 'p1' AS region"), tmp_table, mode="append")
    assert dt.toDF("region = 'p1'").count() == 2


def test_move_column_first_after(spark, tmp_table):
    from delta_spark.io import write_delta as wd

    wd(spark.sql("SELECT 1 AS a, 2 AS b, 3 AS c"), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` ALTER COLUMN c FIRST")
    assert [f.name for f in dt.toDF().schema.fields] == ["c", "a", "b"]
    delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` ALTER COLUMN a AFTER b")
    assert [f.name for f in dt.toDF().schema.fields] == ["c", "b", "a"]
    r = dt.toDF().collect()[0]
    assert (r["a"], r["b"], r["c"]) == (1, 2, 3)  # values follow names
    with pytest.raises(ValueError, match="does not exist"):
        dt.moveColumn("a", ("after", "zz"))


def test_replace_columns(spark, tmp_table):
    from delta_spark.io import write_delta as wd

    wd(spark.sql("SELECT CAST(1 AS INT) AS a, 'x' AS b"), tmp_table,
       configuration={"delta.enableTypeWidening": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    p = f"delta.`{tmp_table}`"
    # reorder + add a column + comment + widen a type, one commit
    delta_sql(spark, f"ALTER TABLE {p} REPLACE COLUMNS ("
                     "b STRING COMMENT 'bee', a BIGINT, c DOUBLE)")
    snap = DeltaLog.for_table(tmp_table).update()
    names = [f.name for f in snap.schema.fields]
    assert names == ["b", "a", "c"]
    assert snap.schema["b"].metadata["comment"] == "bee"
    assert snap.schema["a"].dataType.simpleString() == "bigint"
    r = dt.toDF().collect()[0]
    assert (r["a"], r["b"], r["c"]) == (1, "x", None)
    # dropping via REPLACE is refused
    with pytest.raises(ValueError, match="cannot drop"):
        delta_sql(spark, f"ALTER TABLE {p} REPLACE COLUMNS (a BIGINT, c DOUBLE)")
    # incompatible type change refused
    with pytest.raises(ValueError, match="cannot change the type"):
        delta_sql(spark, f"ALTER TABLE {p} REPLACE COLUMNS ("
                         "b INT, a BIGINT, c DOUBLE)")


def test_readd_after_drop_does_not_resurrect(spark, tmp_table):
    """A column re-added after DROP COLUMN must read as NULL from old
    files: post-upgrade columns get engine-generated physical names
    (DeltaColumnMapping assignColumnIdAndPhysicalName), never the
    logical name still present in pre-drop parquet files."""
    from pyspark.sql import types as T

    from delta_spark.schema import COLUMN_MAPPING_MAX_ID_KEY, physical_name

    dt = _make(spark, tmp_table, "SELECT 1 AS a, 'secret' AS b")
    dt.dropColumn("b")
    dt.addColumns([T.StructField("b", T.StringType())])
    snap = DeltaLog.for_table(tmp_table).update()
    phys = physical_name(snap.schema["b"])
    assert phys != "b" and phys.startswith("col-")
    assert int(snap.configuration[COLUMN_MAPPING_MAX_ID_KEY]) >= 3
    assert [r["b"] for r in dt.toDF().collect()] == [None]
    # REPLACE COLUMNS re-adding a dropped name is covered by the same
    # seam — fresh physical identity, old data stays invisible
    dt.dropColumn("b")
    dt.replaceColumns([T.StructField("a", T.IntegerType()),
                       T.StructField("b", T.StringType())])
    snap = DeltaLog.for_table(tmp_table).update()
    assert physical_name(snap.schema["b"]).startswith("col-")
    assert [r["b"] for r in dt.toDF().collect()] == [None]


def test_replace_columns_rejects_duplicates(spark, tmp_table):
    from pyspark.sql import types as T

    dt = _make(spark, tmp_table, "SELECT 1 AS a")
    with pytest.raises(ValueError, match="duplicate"):
        dt.replaceColumns([T.StructField("a", T.IntegerType()),
                           T.StructField("A", T.IntegerType())])


def test_rename_rejects_case_insensitive_collision(spark, tmp_table):
    dt = _make(spark, tmp_table, "SELECT 1 AS a, 2 AS b")
    with pytest.raises(ValueError, match="already exists"):
        dt.renameColumn("a", "B")


def test_replace_columns_sql_not_null_and_malformed(spark, tmp_table):
    dt = _make(spark, tmp_table, "SELECT 1 AS id, 'x' AS s")
    dt.setColumnNullability("id", False)
    delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` "
                     "REPLACE COLUMNS (s STRING, id INT NOT NULL)")
    snap = DeltaLog.for_table(tmp_table).update()
    assert [f.name for f in snap.schema.fields] == ["s", "id"]
    assert not snap.schema["id"].nullable
    with pytest.raises(ValueError, match="column spec"):
        delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` "
                         "REPLACE COLUMNS (id)")


def test_set_tblproperties_mapping_upgrade(spark, tmp_table):
    """SET TBLPROPERTIES ('delta.columnMapping.mode'='name') must run
    the full upgrade (ids + physical names + protocol bump), not a bare
    config merge — otherwise the next schema change hands every
    pre-existing column a fresh physical name and orphans old data
    (DeltaColumnMapping.verifyAndUpdateMetadataChange)."""
    from delta_spark.schema import physical_name

    dt = _make(spark, tmp_table, "SELECT 1 AS a, 'x' AS b")
    delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` "
                     "SET TBLPROPERTIES ('delta.columnMapping.mode'='name')")
    snap = DeltaLog.for_table(tmp_table).update()
    assert snap.configuration["delta.columnMapping.mode"] == "name"
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "2"
    assert physical_name(snap.schema["a"]) == "a"  # upgrade reuses logical
    assert snap.protocol.minWriterVersion >= 5
    # old data stays readable through a subsequent schema change
    dt.renameColumn("b", "c")
    assert [r["c"] for r in dt.toDF().collect()] == ["x"]
    # name→none now routes through RemoveColumnMappingCommand (its own
    # test below); name→id remains illegal
    with pytest.raises(ValueError, match="not supported"):
        dt.setProperties({"delta.columnMapping.mode": "id"})
    # same-mode set is a no-op pass-through, other keys still land
    dt.setProperties({"delta.columnMapping.mode": "name", "k": "v"})
    assert DeltaLog.for_table(tmp_table).update().configuration["k"] == "v"


def test_add_columns_not_null_rejected(spark, tmp_table):
    """alterDeltaTableCommands.scala:620 — NOT NULL on ADD COLUMNS /
    new REPLACE COLUMNS columns must error, never silently degrade."""
    import pyspark.sql.types as T

    from delta_spark.sql import delta_sql

    write_delta(spark.range(3).withColumnRenamed("id", "a"), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    with pytest.raises(ValueError, match="NOT NULL"):
        dt.addColumns([T.StructField("x", T.IntegerType(), False)])
    with pytest.raises(ValueError, match="NOT NULL"):
        delta_sql(spark,
                  f"ALTER TABLE delta.`{tmp_table}` ADD COLUMNS (x INT NOT NULL)")
    with pytest.raises(ValueError, match="NOT NULL"):
        dt.replaceColumns([T.StructField("a", T.LongType(), True),
                           T.StructField("x", T.IntegerType(), False)])
    snap = DeltaLog.for_table(tmp_table).update()
    assert [f.name for f in snap.schema.fields] == ["a"]


def test_failed_rename_drop_do_not_upgrade_protocol(spark, tmp_table):
    """A rejected RENAME/DROP must not leave the irreversible
    column-mapping upgrade (protocol 2/5 + physical names) behind."""
    write_delta(spark.range(3).withColumnRenamed("id", "a")
                .withColumn("p", F.lit(1)), tmp_table, partition_by=["p"])
    dt = DeltaTable.forPath(spark, tmp_table)
    for attempt in (lambda: dt.renameColumn("typo", "x"),
                    lambda: dt.dropColumn("typo"),
                    lambda: dt.dropColumn("p"),          # partition col
                    lambda: dt.renameColumn("a", "P")):  # collision
        with pytest.raises(ValueError):
            attempt()
    snap = DeltaLog.for_table(tmp_table).update()
    assert snap.configuration.get("delta.columnMapping.mode", "none") == "none"
    assert snap.protocol.minWriterVersion < 5
    assert snap.version == 0  # zero side-effect commits


def test_replace_columns_cannot_widen_partition_column(spark, tmp_table):
    import pyspark.sql.types as T

    write_delta(spark.range(3).withColumnRenamed("id", "a")
                .withColumn("p", F.lit(1).cast("int")), tmp_table,
                partition_by=["p"],
                configuration={"delta.enableTypeWidening": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    with pytest.raises(ValueError, match="partition column"):
        dt.replaceColumns([T.StructField("a", T.LongType(), True),
                           T.StructField("p", T.LongType(), True)])


def test_rename_ok_when_column_only_in_string_literal(spark, tmp_table):
    """A CHECK constraint containing the column NAME inside a string
    literal is not a dependency (expressions_referencing literal-skip)."""
    write_delta(spark.range(3).withColumnRenamed("id", "b")
                .withColumn("status", F.lit("b")), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.addCheckConstraint("lit_only", "status IN ('b', 'ok')")
    dt.renameColumn("b", "b2")  # must not be refused
    assert "b2" in [f.name for f in DeltaLog.for_table(tmp_table).update().schema.fields]
    # a REAL reference still refuses
    with pytest.raises(ValueError, match="referenced by"):
        dt.renameColumn("status", "s2")


def test_set_properties_mode_upgrade_is_one_commit(spark, tmp_table):
    """SET TBLPROPERTIES with mode + other keys is ONE atomic commit."""
    write_delta(spark.range(3).withColumnRenamed("id", "a"), tmp_table)
    v0 = DeltaLog.for_table(tmp_table).update().version
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.setProperties({"delta.columnMapping.mode": "name",
                      "delta.appendOnly": "false", "team": "x"})
    snap = DeltaLog.for_table(tmp_table).update()
    assert snap.version == v0 + 1
    assert snap.configuration["delta.columnMapping.mode"] == "name"
    assert snap.configuration["team"] == "x"
    assert snap.protocol.minWriterVersion >= 5


def test_checkpoint_interval_must_be_positive(spark, tmp_table):
    """DeltaConfigs.CHECKPOINT_INTERVAL: 'needs to be a positive
    integer' — rejected at SET/CREATE, not silently ignored."""
    write_delta(spark.range(3), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    for bad in ("0", "-3", "two"):
        with pytest.raises(ValueError, match="positive integer"):
            dt.setProperties({"delta.checkpointInterval": bad})
    with pytest.raises(ValueError, match="positive integer"):
        write_delta(spark.range(1), tmp_table + "_b",
                    configuration={"delta.checkpointInterval": "0"})
    dt.setProperties({"delta.checkpointInterval": "7"})  # valid passes


def test_remove_column_mapping(spark, tmp_table):
    """delta.columnMapping.mode name→none (RemoveColumnMappingCommand):
    every file is rewritten with LOGICAL names (dataChange=false),
    per-field mapping metadata and the mapping properties are dropped,
    and time travel into the mapped era still works."""
    import json as _json

    write_delta(spark.range(10).withColumnRenamed("id", "a"), tmp_table,
                configuration={"delta.columnMapping.mode": "name"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.renameColumn("a", "z")
    write_delta(spark.range(10, 20).withColumnRenamed("id", "z"), tmp_table,
                mode="append")
    dt.setProperties({"delta.columnMapping.mode": "none"})
    snap = DeltaLog.for_table(tmp_table).update()
    assert snap.configuration.get("delta.columnMapping.mode", "none") == "none"
    assert "delta.columnMapping.maxColumnId" not in snap.configuration
    assert dict(snap.schema["z"].metadata or {}) == {}
    # stats + files carry logical names now; pruning engages
    st = _json.loads(snap.all_files[0].stats)
    assert list(st["minValues"]) == ["z"]
    assert len(snap.files_for_scan("z >= 15")) < snap.num_files
    assert sorted(r["z"] for r in dt.toDF().collect()) == list(range(20))
    # rearrangement only: every file action is dataChange=false
    import os
    last = os.path.join(tmp_table, "_delta_log", "%020d.json" % snap.version)
    for line in open(last):
        d = _json.loads(line)
        for k in ("add", "remove"):
            if k in d:
                assert d[k]["dataChange"] is False
    # the mapped era stays time-travelable
    assert dt.asOfVersion(1).count() == 10
    # a parquet-hostile logical name blocks removal
    t2 = tmp_table + "_hostile"
    write_delta(spark.range(3).withColumnRenamed("id", "a b"), t2,
                configuration={"delta.columnMapping.mode": "name"})
    with pytest.raises(ValueError, match="column names not allowed"):
        DeltaTable.forPath(spark, t2).removeColumnMapping()


def test_nested_rename_and_drop_metadata_only(spark, tmp_table):
    """Nested RENAME/DROP COLUMN (reference supports dotted paths,
    metadata-only under column mapping): the nested field keeps its
    physicalName/id so no file is rewritten and the data reads back
    under the new logical name."""
    df = spark.sql("""
        SELECT 1 AS id,
               named_struct('aa', 'x', 'ac', named_struct('aca', 7)) AS s
        UNION ALL
        SELECT 2, named_struct('aa', 'y', 'ac', named_struct('aca', 8))
    """)
    write_delta(df, tmp_table,
                configuration={"delta.columnMapping.mode": "name"})
    dt = DeltaTable.forPath(spark, tmp_table)
    files_before = {f.path for f in DeltaLog.for_table(tmp_table).update().all_files}

    dt.renameColumn("s.aa", "a2")
    snap = DeltaLog.for_table(tmp_table).update()
    assert [f.name for f in snap.schema["s"].dataType.fields] == ["a2", "ac"]
    # metadata-only: same files
    assert {f.path for f in snap.all_files} == files_before
    rows = sorted((r["id"], r["s"]["a2"], r["s"]["ac"]["aca"])
                  for r in dt.toDF().selectExpr("id", "s").collect())
    assert rows == [(1, "x", 7), (2, "y", 8)]

    # deep path renames too
    dt.renameColumn("s.ac.aca", "z")
    got = dt.toDF().selectExpr("s.ac.z").collect()
    assert sorted(r["z"] for r in got) == [7, 8]

    # sibling collision rejected
    with pytest.raises(ValueError, match="already exists"):
        dt.renameColumn("s.a2", "ac")
    # absent path rejected
    with pytest.raises(ValueError, match="no such column"):
        dt.renameColumn("s.nope", "x")
    # non-struct traversal rejected
    with pytest.raises(ValueError, match="not a struct"):
        dt.renameColumn("id.x", "y")

    # nested drop: metadata-only, data unreadable under dropped name
    dt.dropColumn("s.a2")
    snap = DeltaLog.for_table(tmp_table).update()
    assert [f.name for f in snap.schema["s"].dataType.fields] == ["ac"]
    assert {f.path for f in snap.all_files} == files_before
    assert sorted(r["aca"] for r in
                  dt.toDF().selectExpr("s.ac.z AS aca").collect()) == [7, 8]
    # can't drop the struct's last field
    with pytest.raises(ValueError, match="last"):
        dt.dropColumn("s.ac")


def test_nested_rename_via_sql(spark, tmp_table):
    write_delta(
        spark.sql("SELECT 1 AS id, named_struct('aa', 5, 'ab', 6) AS s"),
        tmp_table, configuration={"delta.columnMapping.mode": "name"})
    delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` RENAME COLUMN s.aa TO bb")
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF().selectExpr("s.bb").collect()[0]["bb"] == 5
    delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` DROP COLUMN s.bb")
    snap = DeltaLog.for_table(tmp_table).update()
    assert [f.name for f in snap.schema["s"].dataType.fields] == ["ab"]


def test_dml_on_mapped_nested_fields(spark, tmp_table):
    """UPDATE / MERGE touching nested struct fields of a column-mapped
    table: rewritten files must keep PHYSICAL nested names on disk
    (the nested-mapping write contract) while DML expressions resolve
    logical names."""
    write_delta(
        spark.sql("""SELECT * FROM VALUES
            (1, named_struct('aa', 'x', 'n', 10)),
            (2, named_struct('aa', 'y', 'n', 20)) AS t(id, s)"""),
        tmp_table, configuration={"delta.columnMapping.mode": "id"})
    dt = DeltaTable.forPath(spark, tmp_table)
    delta_sql(spark,
              f"UPDATE delta.`{tmp_table}` SET s = named_struct('aa', s.aa, "
              f"'n', s.n + 5) WHERE id = 1")
    rows = sorted((r["id"], r["s"]["aa"], r["s"]["n"])
                  for r in dt.toDF().collect())
    assert rows == [(1, "x", 15), (2, "y", 20)]
    # the rewritten file stores physical nested names + field ids
    import os as _os
    import pyarrow.parquet as pq
    from delta_spark.schema import physical_name
    snap = DeltaLog.for_table(tmp_table).update()
    s_phys = physical_name(snap.schema["s"])
    for f in snap.all_files:
        sch = pq.read_schema(_os.path.join(tmp_table, f.path))
        inner = sch.field(s_phys).type
        assert all(inner.field(i).name.startswith("col-")
                   for i in range(inner.num_fields))


def test_nested_add_columns(spark, tmp_table):
    """Nested ADD COLUMNS (dotted path adds a field INSIDE a struct,
    metadata-only; old files read it as null) — reference
    alterDeltaTableCommands nested ADD support. Under mapping the new
    nested field gets a fresh id past the tree-wide max."""
    write_delta(
        spark.sql("SELECT 1 AS id, named_struct('aa', 5) AS s"),
        tmp_table, configuration={"delta.columnMapping.mode": "name"})
    dt = DeltaTable.forPath(spark, tmp_table)
    delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` "
                     "ADD COLUMNS (s.bb STRING AFTER aa, s.cc INT FIRST)")
    snap = DeltaLog.for_table(tmp_table).update()
    inner = [f.name for f in snap.schema["s"].dataType.fields]
    assert inner == ["cc", "aa", "bb"]
    from delta_spark.schema import field_id, max_field_id
    ids = [field_id(f) for f in snap.schema["s"].dataType.fields]
    assert None not in ids and len(set(ids)) == 3
    assert max_field_id(snap.schema) == max(
        x for x in ids + [field_id(snap.schema["id"]),
                          field_id(snap.schema["s"])])
    r = dt.toDF().selectExpr("s.aa", "s.bb", "s.cc").collect()[0]
    assert (r["aa"], r["bb"], r["cc"]) == (5, None, None)
    # collision + non-struct guards
    with pytest.raises(ValueError, match="already exists"):
        dt.addColumns([__import__("pyspark").sql.types.StructField(
            "s.aa", __import__("pyspark").sql.types.IntegerType())])
    with pytest.raises(ValueError, match="not a struct"):
        dt.addColumns([__import__("pyspark").sql.types.StructField(
            "id.x", __import__("pyspark").sql.types.IntegerType())])
    # appended rows round-trip with the evolved nested schema
    write_delta(
        spark.sql("SELECT 2 AS id, named_struct('cc', 9, 'aa', 6, 'bb', 'z') AS s"),
        tmp_table, mode="append")
    rows = sorted((r["id"], tuple(r["s"])) for r in dt.toDF().collect())
    assert rows == [(1, (None, 5, None)), (2, (9, 6, "z"))]


def test_cdf_range_spanning_nested_rename_blocked(spark, tmp_table):
    """A CDF range crossing a NESTED rename must fail with the clear
    'narrow the range' error (reference column-mapping CDF gate), not
    an obscure union mismatch; ranges on one side still work."""
    write_delta(
        spark.sql("SELECT 1 AS id, named_struct('aa', 5) AS s"),
        tmp_table,
        configuration={"delta.columnMapping.mode": "name",
                       "delta.enableChangeDataFeed": "true"})
    write_delta(spark.sql("SELECT 2 AS id, named_struct('aa', 6) AS s"),
                tmp_table, mode="append")
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.renameColumn("s.aa", "bb")                      # version 2
    write_delta(spark.sql("SELECT 3 AS id, named_struct('bb', 7) AS s"),
                tmp_table, mode="append")              # version 3
    from delta_spark.cdf import table_changes
    with pytest.raises(ValueError, match="rename of nested field"):
        table_changes(spark, DeltaLog.for_table(tmp_table), 0, 3).collect()
    # batch CDF serves the LATEST schema, so even a pre-rename range is
    # incompatible (same as the reference's column-mapping CDF gate)
    with pytest.raises(ValueError, match="rename of nested field"):
        table_changes(spark, DeltaLog.for_table(tmp_table), 0, 1).collect()
    # post-rename ranges are fine
    post = table_changes(spark, DeltaLog.for_table(tmp_table), 3, 3)
    assert post.count() == 1
    assert post.selectExpr("s.bb").collect()[0]["bb"] == 7


def test_cdf_range_spanning_nested_add_null_fills(spark, tmp_table):
    """A CDF range crossing a purely ADDITIVE nested ADD COLUMN is
    read-compatible (reference CDCReader via SchemaUtils.isReadCompatible:
    the end schema may be a SUPERSET of any version's schema — new
    nested fields null-fill). Only renames/drops/retypes block."""
    write_delta(
        spark.sql("SELECT 1 AS id, named_struct('aa', 5) AS s"),
        tmp_table,
        configuration={"delta.columnMapping.mode": "name",
                       "delta.enableChangeDataFeed": "true"})
    # a DELETE writes real CDC files under the v0 (pre-add) schema
    dt = DeltaTable.forPath(spark, tmp_table)
    write_delta(spark.sql("SELECT 2 AS id, named_struct('aa', 6) AS s"),
                tmp_table, mode="append")               # v1
    dt.delete("id = 2")                                 # v2 (cdc files)
    delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` "
                     "ADD COLUMNS (s.bb STRING)")       # v3
    write_delta(
        spark.sql("SELECT 3 AS id, named_struct('aa', 7, 'bb', 'x') AS s"),
        tmp_table, mode="append")                       # v4
    from delta_spark.cdf import table_changes
    rows = {(r["id"], r["_change_type"], tuple(r["s"]))
            for r in table_changes(
                spark, DeltaLog.for_table(tmp_table), 0, 4).collect()}
    assert rows == {
        (1, "insert", (5, None)),
        (2, "insert", (6, None)),
        (2, "delete", (6, None)),
        (3, "insert", (7, "x")),
    }


def test_cdf_nested_add_inside_array_null_fills(spark, tmp_table):
    """Additive evolution INSIDE array<struct<...>> also null-fills
    across a CDF range (isReadCompatible recurses through array
    element types) — no column mapping needed."""
    from pyspark.sql import types as T

    write_delta(
        spark.sql("SELECT 1 AS id, array(named_struct('aa', 5)) AS xs"),
        tmp_table,
        configuration={"delta.enableChangeDataFeed": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    new = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("xs", T.ArrayType(T.StructType([
            T.StructField("aa", T.IntegerType()),
            T.StructField("bb", T.StringType())])))])
    write_delta(
        spark.createDataFrame([(2, [(6, "y")])], new),
        tmp_table, mode="append", merge_schema=True)    # v1 (nested add)
    from delta_spark.cdf import table_changes
    rows = {(r["id"], tuple(tuple(x) for x in r["xs"]))
            for r in table_changes(
                spark, DeltaLog.for_table(tmp_table), 0, 1).collect()}
    assert rows == {(1, ((5, None),)), (2, ((6, "y"),))}


def test_sql_backticked_dotted_name_is_single_column(spark, tmp_table):
    """`a.b` in backticks is ONE column literally named 'a.b' (Spark
    identifier semantics: dots inside backticks are part of the name;
    nested paths are `a`.`b` or unquoted a.b)."""
    write_delta(spark.sql("SELECT 1 AS id, named_struct('aa', 5) AS s"),
                tmp_table)
    delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` "
                     "ADD COLUMNS (`a.b` INT)")
    snap = DeltaLog.for_table(tmp_table).update()
    names = [f.name for f in snap.schema.fields]
    assert "a.b" in names                      # one top-level column
    assert [f.name for f in snap.schema["s"].dataType.fields] == ["aa"]
    # unquoted a.b (and quoted-path `s`.`bb`) still mean NESTED paths
    delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` "
                     "ADD COLUMNS (`s`.`bb` STRING)")
    snap = DeltaLog.for_table(tmp_table).update()
    assert [f.name for f in snap.schema["s"].dataType.fields] == ["aa", "bb"]
    # rename / drop round-trip the quoted literal name
    dt = DeltaTable.forPath(spark, tmp_table)
    delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` "
                     "RENAME COLUMN `a.b` TO `c.d`")
    snap = DeltaLog.for_table(tmp_table).update()
    assert "c.d" in [f.name for f in snap.schema.fields]
    delta_sql(spark, f"ALTER TABLE delta.`{tmp_table}` DROP COLUMN `c.d`")
    snap = DeltaLog.for_table(tmp_table).update()
    assert "c.d" not in [f.name for f in snap.schema.fields]
    assert "s" in [f.name for f in snap.schema.fields]


def test_cdf_nested_add_inside_map_value_null_fills(spark, tmp_table):
    """Additive evolution inside a MAP's struct value, on a
    column-mapped table: the CDF range alignment must rebuild map
    values to the end schema (transform over map entries), null-fill
    the new field, and keep physical-name matching at every level."""
    from pyspark.sql import types as T

    v0 = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("m", T.MapType(T.StringType(), T.StructType([
            T.StructField("aa", T.IntegerType())])))])
    write_delta(
        spark.createDataFrame([(1, {"k1": (5,)})], v0),
        tmp_table,
        configuration={"delta.columnMapping.mode": "name",
                       "delta.enableChangeDataFeed": "true"})
    v1 = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("m", T.MapType(T.StringType(), T.StructType([
            T.StructField("aa", T.IntegerType()),
            T.StructField("bb", T.StringType())])))])
    write_delta(
        spark.createDataFrame([(2, {"k2": (6, "y")})], v1),
        tmp_table, mode="append", merge_schema=True)
    from delta_spark.cdf import table_changes
    rows = {}
    for r in table_changes(spark, DeltaLog.for_table(tmp_table),
                           0, 1).collect():
        rows[r["id"]] = {k: tuple(v) for k, v in r["m"].items()}
    assert rows == {1: {"k1": (5, None)}, 2: {"k2": (6, "y")}}


def test_cdf_of_restore_that_reverts_schema(spark, tmp_table):
    """A RESTORE that reverts a schema evolution removes files AND
    narrows the schema in ONE commit: its delete rows must read under
    the commit's own (post-commit) snapshot — CDCReader builds each
    version's rows with that version's schema — not the pre-commit
    schema, which would wrongly block the single-version range as a
    DROP. Ranges spanning the evolved version itself stay blocked."""
    write_delta(spark.sql("SELECT 1 AS id, 'a' AS val"), tmp_table,
                configuration={"delta.columnMapping.mode": "name",
                               "delta.enableChangeDataFeed": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    src = spark.sql("SELECT 2 AS id, 'b' AS val, 9 AS extra")
    (dt.merge(src, "target.id = source.id")
       .whenMatchedUpdateAll().whenNotMatchedInsertAll()
       .withSchemaEvolution().execute())                   # v1 evolves
    dt.restoreToVersion(0)                                 # v2 reverts
    from delta_spark.cdf import table_changes
    rows = {(r["id"], r["val"], r["_change_type"])
            for r in table_changes(spark, DeltaLog.for_table(tmp_table),
                                   2, 2).collect()}
    assert rows == {(2, "b", "delete")}
    with pytest.raises(ValueError, match="DROP of column 'extra'"):
        table_changes(spark, DeltaLog.for_table(tmp_table), 0, 2).collect()
