"""Generated columns through DML (reference
UpdateExpressionsSupport.scala:478: a generated column with no
user-provided update expression is RECOMPUTED from its generation
expression over the post-update row; explicit assignments are
validated). Covers UPDATE (rewrite + DV paths), MERGE update/insert,
the insert-only fast path, and CDF post-images."""

import pytest
from pyspark.sql import functions as F

from delta_spark import DeltaLog, DeltaTable
from delta_spark.io import write_delta
from delta_spark.table import DeltaTable as DT


def _gen_table(spark, path, extra_cfg=None):
    b = (DT.create(spark).location(path)
         .addColumn("id", "INT")
         .addColumn("g", "INT", generatedAlwaysAs="id * 2"))
    if extra_cfg:
        for k, v in extra_cfg.items():
            b = b.property(k, v)
    b.execute()
    write_delta(spark.sql("SELECT 1 AS id UNION ALL SELECT 2"), path,
                mode="append")
    return DeltaTable.forPath(spark, path)


def _rows(dt):
    return {r["id"]: r["g"] for r in dt.toDF().collect()}


def test_update_recomputes_generated(spark, tmp_table):
    dt = _gen_table(spark, tmp_table)
    dt.update(set={"id": "10"}, condition="id = 1")
    assert _rows(dt) == {10: 20, 2: 4}
    # explicit consistent assignment passes; inconsistent fails
    dt.update(set={"id": "5", "g": "10"}, condition="id = 2")
    assert _rows(dt) == {10: 20, 5: 10}
    with pytest.raises(Exception, match="generat"):
        dt.update(set={"id": "7", "g": "999"}, condition="id = 5")


def test_update_recomputes_generated_dv_path(spark, tmp_table):
    dt = _gen_table(spark, tmp_table,
                    {"delta.enableDeletionVectors": "true"})
    dt.update(set={"id": "10"}, condition="id = 1")
    assert _rows(dt) == {10: 20, 2: 4}


def test_merge_update_recomputes_generated(spark, tmp_table):
    dt = _gen_table(spark, tmp_table)
    src = spark.sql("SELECT 1 AS id, 100 AS nid UNION ALL SELECT 99, 99")
    (dt.merge(src, "t.id = s.id", target_alias="t", source_alias="s")
       .whenMatchedUpdate(set={"id": "s.nid"})
       .whenNotMatchedInsert(values={"id": "s.id"})
       .execute())
    assert _rows(dt) == {100: 200, 2: 4, 99: 198}


def test_merge_insert_only_recomputes_generated(spark, tmp_table):
    dt = _gen_table(spark, tmp_table)
    src = spark.sql("SELECT 50 AS id")
    (dt.merge(src, "t.id = s.id", target_alias="t", source_alias="s")
       .whenNotMatchedInsert(values={"id": "s.id"}).execute())
    assert _rows(dt)[50] == 100


def test_merge_cdf_postimage_regenerated(spark, tmp_table):
    dt = _gen_table(spark, tmp_table,
                    {"delta.enableChangeDataFeed": "true"})
    v = DeltaLog.for_table(tmp_table).latest_version()
    src = spark.sql("SELECT 1 AS id, 30 AS nid")
    (dt.merge(src, "t.id = s.id", target_alias="t", source_alias="s")
       .whenMatchedUpdate(set={"id": "s.nid"}).execute())
    from delta_spark.cdf import table_changes
    ch = table_changes(spark, DeltaLog.for_table(tmp_table),
                       starting_version=v + 1)
    post = {(r["id"], r["g"]) for r in
            ch.filter(F.col("_change_type") == "update_postimage").collect()}
    assert post == {(30, 60)}


def test_check_constraints_enforced_in_dml(spark, tmp_table):
    """DeltaInvariantCheckerExec role: constraints bind to DML rewrites,
    not just batch appends."""
    write_delta(spark.sql("SELECT 1 AS id, 5 AS v"), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.addCheckConstraint("v_pos", "v > 0")
    with pytest.raises(Exception, match="v_pos"):
        dt.update(set={"v": "-3"})
    src = spark.sql("SELECT 2 AS id, -9 AS v")
    with pytest.raises(Exception, match="v_pos"):
        (dt.merge(src, "t.id = s.id", target_alias="t", source_alias="s")
           .whenNotMatchedInsertAll().execute())
    with pytest.raises(Exception, match="v_pos"):
        (dt.merge(spark.sql("SELECT 1 AS id, -1 AS v"),
                  "t.id = s.id", target_alias="t", source_alias="s")
           .whenMatchedUpdateAll().execute())
    # valid DML still passes and the table is intact
    dt.update(set={"v": "7"})
    assert {r["v"] for r in dt.toDF().collect()} == {7}


def test_check_constraints_enforced_in_dv_dml(spark, tmp_table):
    write_delta(spark.sql("SELECT 1 AS id, 5 AS v"), tmp_table,
                configuration={"delta.enableDeletionVectors": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.addCheckConstraint("v_pos", "v > 0")
    with pytest.raises(Exception, match="v_pos"):
        dt.update(set={"v": "-3"})
    assert {r["v"] for r in dt.toDF().collect()} == {5}
