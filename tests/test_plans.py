"""Physical-plan quality gates: these assert the *shape* of execution,
not results — log-level file pruning reaches the scan, predicates push
into Parquet, column pruning applies, small dimensions broadcast.
A correct-but-full-scan plan is a perf regression at 100 TB even when
row-for-row correct."""

import os

import pytest
from pyspark.sql import functions as F

from delta_spark.datasets import load_table
from delta_spark.io import write_delta
from delta_spark.table import DeltaTable


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_reaches_scan(spark, tmp_table, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    write_delta(li, tmp_table, partition_by=["l_returnflag"])
    dt = DeltaTable.forPath(spark, tmp_table)
    files = dt.toDF("l_returnflag = 'A'").inputFiles()
    # only the A partition's files reach the scan
    assert files and all("l_returnflag=A" in f for f in files)


def test_predicate_pushdown_and_column_pruning(spark, tmp_table, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    write_delta(li, tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    df = dt.toDF("l_quantity < 10").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "l_quantity" in plan and ("PushedFilters" in plan or "DataFilters" in plan)
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    # projection-pruned: wide columns never reach the reader
    assert "l_extendedprice" not in scan_line
    assert "l_comment" not in scan_line


def test_stats_skipping_reduces_scan_files(spark, tmp_table, sf_dir):
    from delta_spark.log import DeltaLog

    li = load_table(spark, sf_dir, "lineitem")
    write_delta(li.repartitionByRange(8, "l_orderkey"), tmp_table)
    snap = DeltaLog.for_table(tmp_table).update()
    assert len(snap.files_for_scan("l_orderkey < 100")) <= len(snap.all_files) // 2


def test_small_dim_join_broadcasts(spark, tmp_table, sf_dir):
    write_delta(load_table(spark, sf_dir, "lineitem"), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    supp = load_table(spark, sf_dir, "supplier")
    joined = dt.toDF().join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_limit_pushdown_selects_few_files(spark, tmp_table, sf_dir):
    from delta_spark.log import DeltaLog

    li = load_table(spark, sf_dir, "lineitem")
    write_delta(li.repartition(8), tmp_table)
    snap = DeltaLog.for_table(tmp_table).update()
    files = snap.files_for_scan(limit=10)
    assert len(files) == 1  # first file already covers LIMIT 10
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF(limit=10).count() == 10


def test_metadata_only_aggregates(spark, tmp_table, sf_dir):
    """COUNT/MIN/MAX answered from log stats without a scan
    (OptimizeMetadataOnlyDeltaQuery equivalent)."""
    from delta_spark.log import DeltaLog

    li = load_table(spark, sf_dir, "lineitem")
    write_delta(li, tmp_table)
    snap = DeltaLog.for_table(tmp_table).update()
    aggs = snap.metadata_aggregates(["l_orderkey"])
    assert aggs is not None
    truth = li.agg(F.count(F.lit(1)), F.min("l_orderkey"), F.max("l_orderkey")).collect()[0]
    assert aggs["numRecords"] == truth[0]
    assert aggs["minValues"]["l_orderkey"] == truth[1]
    assert aggs["maxValues"]["l_orderkey"] == truth[2]


def test_generated_partition_filter_derivation(spark, tmp_table, sf_dir):
    """Partition col GENERATED AS year(ts): predicates on the base
    timestamp prune partitions even with no file stats (the derivation
    path, not min/max skipping)."""
    from delta_spark.table import DeltaTable

    (DeltaTable.create(spark).location(tmp_table)
     .addColumn("o_orderkey", "long")
     .addColumn("o_orderdate", "timestamp")
     .addColumn("o_year", "int", generatedAlwaysAs="year(o_orderdate)")
     .partitionedBy("o_year")
     .execute())
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    write_delta(orders, tmp_table, mode="append")
    from delta_spark.log import DeltaLog

    snap = DeltaLog.for_table(tmp_table).update()
    assert len({f.partitionValues.get("o_year") for f in snap.all_files}) > 3
    # strip stats → only the derived partition conjunct can prune
    bare = snap.clone_state()
    for f in list(bare.active.values()):
        f.stats = None
    pred = ("o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND "
            "o_orderdate < TIMESTAMP '1998-01-01 00:00:00'")
    pruned = bare.files_for_scan(pred)
    kept_years = {f.partitionValues.get("o_year") for f in pruned}
    assert kept_years <= {"1997", "1998"}  # 1998 kept: year(U)=1998 non-strict
    assert len(pruned) < len(bare.all_files)
    # results still correct end-to-end
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF(pred).count() == orders.filter(pred).count()
