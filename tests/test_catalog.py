"""Named-table catalog: forName / saveAsTable / named SQL routing
(reference python/delta/tables.py:404, AbstractDeltaCatalog.scala:81)."""

import os

import pytest
from pyspark.sql import functions as F

from delta_spark import catalog as C
from delta_spark.datasets import load_table
from delta_spark.io import write_delta
from delta_spark.sql import delta_sql
from delta_spark.table import DeltaTable


@pytest.fixture()
def warehouse(tmp_path, monkeypatch):
    w = str(tmp_path / "wh")
    monkeypatch.setenv("DELTA_SPARK_WAREHOUSE", w)
    yield w


def test_create_named_table_and_forname(spark, warehouse, sf_dir):
    (DeltaTable.create(spark).tableName("people")
     .addColumn("id", "long").addColumn("name", "string")
     .execute())
    # managed location derives from the warehouse
    assert C.resolve(spark, "people") == os.path.join(warehouse, "people")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    C.save_as_table(df, "people", mode="append")
    dt = DeltaTable.forName(spark, "people")
    assert dt.toDF().count() == 2
    # names are case-insensitive, default-db-qualified spelling works
    assert DeltaTable.forName(spark, "PEOPLE").toDF().count() == 2
    assert DeltaTable.forName(spark, "default.people").toDF().count() == 2
    with pytest.raises(ValueError, match="not registered"):
        DeltaTable.forName(spark, "nope")


def test_save_as_table_db_qualified(spark, warehouse, sf_dir):
    orders = load_table(spark, sf_dir, "orders").limit(100)
    C.save_as_table(orders, "sales.orders")
    assert C.resolve(spark, "sales.orders") == os.path.join(warehouse, "sales.db", "orders")
    assert DeltaTable.forName(spark, "sales.orders").toDF().count() == 100


def test_named_sql_roundtrip(spark, warehouse, sf_dir):
    """Every delta_sql verb works on a registered name via rewrite."""
    li = load_table(spark, sf_dir, "lineitem").limit(500)
    C.save_as_table(li, "li")
    n0 = li.count()
    ndel = li.filter("l_quantity > 40").count()
    delta_sql(spark, "DELETE FROM li WHERE l_quantity > 40")
    assert DeltaTable.forName(spark, "li").toDF().count() == n0 - ndel
    delta_sql(spark, "UPDATE li SET l_tax = 9.9 WHERE l_quantity < 5")
    got = delta_sql(spark, "SELECT count(*) AS c FROM li WHERE l_tax = 9.9").collect()[0]["c"]
    assert got == DeltaTable.forName(spark, "li").toDF().filter("l_quantity < 5").count()
    hist = delta_sql(spark, "DESCRIBE HISTORY li")
    assert hist.count() >= 3
    delta_sql(spark, "OPTIMIZE li")


def test_named_merge_sql(spark, warehouse, sf_dir):
    orders = load_table(spark, sf_dir, "orders").limit(200)
    C.save_as_table(orders, "ord")
    src = orders.limit(50).withColumn("o_totalprice", F.col("o_totalprice") * 2)
    src.createOrReplaceTempView("src_v")
    delta_sql(spark, """
        MERGE INTO ord AS t USING src_v AS s ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
        WHEN NOT MATCHED THEN INSERT *""")
    dt = DeltaTable.forName(spark, "ord")
    assert dt.toDF().count() == 200


def test_ctas_and_drop(spark, warehouse, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").limit(50)
    li.createOrReplaceTempView("li_src")
    delta_sql(spark, "CREATE TABLE flagged AS SELECT * FROM li_src WHERE l_quantity > 10")
    path = C.resolve(spark, "flagged")
    assert path and os.path.isdir(os.path.join(path, "_delta_log"))
    n = DeltaTable.forName(spark, "flagged").toDF().count()
    assert n == li.filter("l_quantity > 10").count()
    # managed drop removes data
    delta_sql(spark, "DROP TABLE flagged")
    assert C.resolve(spark, "flagged") is None
    assert not os.path.isdir(path)


def test_external_table_drop_keeps_data(spark, warehouse, sf_dir, tmp_path):
    p = str(tmp_path / "ext")
    write_delta(load_table(spark, sf_dir, "region"), p)
    C.register_table(spark, "reg", p)
    assert DeltaTable.forName(spark, "reg").toDF().count() > 0
    delta_sql(spark, "DROP TABLE reg")
    assert C.resolve(spark, "reg") is None
    assert os.path.isdir(os.path.join(p, "_delta_log"))  # external: data kept


def test_show_tables(spark, warehouse, sf_dir):
    C.save_as_table(load_table(spark, sf_dir, "region"), "r1")
    C.save_as_table(load_table(spark, sf_dir, "nation"), "geo.n1")
    rows = {(r["database"], r["tableName"]) for r in
            delta_sql(spark, "SHOW TABLES").collect()}
    assert ("default", "r1") in rows and ("geo", "n1") in rows
    only = delta_sql(spark, "SHOW TABLES IN geo").collect()
    assert [(r["database"], r["tableName"]) for r in only] == [("geo", "n1")]


def test_set_location(spark, warehouse, sf_dir, tmp_path):
    a, b = str(tmp_path / "locA"), str(tmp_path / "locB")
    write_delta(load_table(spark, sf_dir, "region"), a)
    write_delta(load_table(spark, sf_dir, "nation"), b)
    C.register_table(spark, "geo2.t", a)
    n_a = DeltaTable.forName(spark, "geo2.t").toDF().count()
    delta_sql(spark, f"ALTER TABLE geo2.t SET LOCATION '{b}'")
    n_b = DeltaTable.forName(spark, "geo2.t").toDF().count()
    assert n_a != n_b
    assert n_b == load_table(spark, sf_dir, "nation").count()


def test_insert_partition_spec_and_show_columns(spark, warehouse, sf_dir, tmp_path):
    p = str(tmp_path / "ptbl")
    li = load_table(spark, sf_dir, "lineitem").limit(100) \
        .select("l_orderkey", "l_quantity", "l_returnflag")
    write_delta(li, p, partition_by=["l_returnflag"])
    n0 = DeltaTable.forPath(spark, p).toDF().count()
    li.select("l_orderkey", "l_quantity").limit(7).createOrReplaceTempView("ins_src")
    # static partition spec: literal attached, appended
    delta_sql(spark, f"INSERT INTO delta.`{p}` PARTITION (l_returnflag='Z') "
                     f"SELECT l_orderkey, l_quantity FROM ins_src")
    dt = DeltaTable.forPath(spark, p)
    assert dt.toDF().filter("l_returnflag = 'Z'").count() == 7
    assert dt.toDF().count() == n0 + 7
    # OVERWRITE scoped to the partition replaces only that partition
    delta_sql(spark, f"INSERT OVERWRITE delta.`{p}` PARTITION (l_returnflag='Z') "
                     f"SELECT l_orderkey, l_quantity FROM ins_src LIMIT 3")
    assert dt.toDF().filter("l_returnflag = 'Z'").count() == 3
    assert dt.toDF().filter("l_returnflag <> 'Z'").count() == n0
    cols = [r["col_name"] for r in
            delta_sql(spark, f"SHOW COLUMNS IN delta.`{p}`").collect()]
    assert cols == ["l_orderkey", "l_quantity", "l_returnflag"]


def test_unknown_names_fall_through(spark, warehouse, sf_dir):
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("plain_view")
    # not in the delta catalog → spark.sql resolves the temp view
    assert delta_sql(spark, "SELECT count(*) AS c FROM plain_view").collect()[0]["c"] > 0


def test_concurrent_registration_loses_nothing(spark, warehouse, sf_dir):
    """register_table read-modify-write is mutexed: concurrent
    registrations from many threads all survive."""
    import threading

    df = load_table(spark, sf_dir, "region")
    p = C.default_location(spark, "seed")
    write_delta(df, p)

    def reg(i):
        C.register_table(spark, f"many.t{i}", p)

    threads = [threading.Thread(target=reg, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    names = set(C.catalog_map(spark))
    assert {f"many.t{i}" for i in range(16)} <= names


def test_table_changes_tvf_by_name(spark, warehouse, sf_dir):
    df = load_table(spark, sf_dir, "region")
    C.save_as_table(df, "chg", configuration={"delta.enableChangeDataFeed": "true"})
    delta_sql(spark, "DELETE FROM chg WHERE r_regionkey = 0")
    out = delta_sql(spark, "SELECT _change_type, count(*) AS n "
                           "FROM table_changes('chg', 1) GROUP BY 1").collect()
    assert {r["_change_type"] for r in out} == {"delete"}


def test_substitution_never_rewrites_inside_paths(spark, warehouse, sf_dir):
    """A registered bare name that is also a path segment of another
    registered table's location must not be rewritten inside the
    already-substituted delta.`path` reference."""
    import delta_spark.catalog as C

    li = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    # 'current' is a segment of the other table's path AND a table name
    loc = os.path.join(warehouse, "current")
    write_delta(li, loc)
    C.register_table(spark, "current", loc)
    nested = os.path.join(warehouse, "current", "..", "current")
    out = C.substitute_names(spark, "SELECT * FROM current")
    assert out == f"SELECT * FROM delta.`{loc}`"
    # a second pass over the produced text must be a no-op
    assert C.substitute_names(spark, out) == out


def test_show_tables_falls_through_to_spark(spark, warehouse, sf_dir):
    """SHOW TABLES with an empty delta catalog returns Spark's own
    catalog listing (temp views) instead of shadowing it."""
    from delta_spark.sql import delta_sql

    spark.range(3).createOrReplaceTempView("plain_spark_view")
    df = delta_sql(spark, "SHOW TABLES")
    names = {r["tableName"] for r in df.collect()}
    assert "plain_spark_view" in names


def test_show_tblproperties(spark, warehouse, sf_dir, tmp_path):
    p = str(tmp_path / "props_tbl")
    write_delta(load_table(spark, sf_dir, "region"),
                p, configuration={"delta.appendOnly": "false",
                                  "team": "data-eng"})
    rows = {r["key"]: r["value"] for r in
            delta_sql(spark, f"SHOW TBLPROPERTIES delta.`{p}`").collect()}
    assert rows["team"] == "data-eng"
    assert rows["delta.appendOnly"] == "false"
    one = delta_sql(spark, f"SHOW TBLPROPERTIES delta.`{p}` ('team')").collect()
    assert [(r["key"], r["value"]) for r in one] == [("team", "data-eng")]
    none = delta_sql(spark, f"SHOW TBLPROPERTIES delta.`{p}` ('missing')").collect()
    assert none == []


def _register_worker(args):
    """Module-level so multiprocessing can pickle it: registers one
    name->path entry against a shared warehouse WITHOUT a Spark session
    (register_table only touches the catalog file)."""
    wh, i = args
    os.environ["DELTA_SPARK_WAREHOUSE"] = wh
    C.register_table(None, f"db.t{i}", f"/data/t{i}")
    return i


def test_concurrent_registration_loses_nothing(warehouse):
    """putIfAbsent-grade metastore semantics: N processes registering
    N distinct tables against the same warehouse concurrently — every
    registration must survive (the flock'd read-modify-write; a bare
    read-modify-write + rename would drop entries under this race)."""
    import multiprocessing as mp

    n = 24
    os.environ["DELTA_SPARK_WAREHOUSE"] = warehouse
    try:
        with mp.get_context("spawn").Pool(8) as pool:
            done = pool.map(_register_worker, [(warehouse, i)
                                               for i in range(n)])
        assert sorted(done) == list(range(n))
        m = C.catalog_map(None)
        for i in range(n):
            assert m.get(f"db.t{i}") == f"/data/t{i}", \
                f"registration of db.t{i} was lost"
    finally:
        os.environ.pop("DELTA_SPARK_WAREHOUSE", None)
