"""Streaming source + sink (reference DeltaSourceSuite/DeltaSinkSuite
style: real local streams driven to completion)."""

import os

import pytest
from pyspark.sql import functions as F

from delta_spark.datasets import load_table

from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.streaming import delta_sink, read_stream, write_stream
from delta_spark.table import DeltaTable


def test_sink_exactly_once(spark, tmp_table, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    sink = delta_sink(tmp_table, query_id="q1")
    sink(events.limit(100), batch_id=0)
    sink(events.limit(50), batch_id=1)
    # replayed batch must be skipped
    sink(events.limit(50), batch_id=1)
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF().count() == 150


def test_streaming_source_reads_table(spark, tmp_table, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    write_delta(events.limit(200), tmp_table)
    write_delta(events.limit(100), tmp_table, mode="append")

    stream = read_stream(spark, tmp_table, maxFilesPerTrigger="1")
    q = (stream.writeStream.format("memory").queryName("t_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) c FROM t_stream").collect()[0]["c"]
    assert got == 300


def test_streaming_source_tails_new_commits(spark, tmp_table, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out_tbl = str(tmp_path / "sink_tbl")
    write_delta(events.limit(10), tmp_table)
    stream = read_stream(spark, tmp_table)
    q = write_stream(stream, out_tbl, str(tmp_path / "ckpt2"), query_id="tailq")
    q.awaitTermination(120)
    dt = DeltaTable.forPath(spark, out_tbl)
    assert dt.toDF().count() == 10
    # new commit, then a second availableNow pass picks up only the delta
    write_delta(events.limit(5), tmp_table, mode="append")
    stream2 = read_stream(spark, tmp_table)
    q2 = write_stream(stream2, out_tbl, str(tmp_path / "ckpt2"), query_id="tailq")
    q2.awaitTermination(120)
    assert dt.toDF().count() == 15


def test_end_to_end_stream_pipeline(spark, tmp_table, sf_dir, tmp_path):
    """parquet source table → streaming read → windowed agg via
    foreachBatch → delta sink."""
    src_tbl = str(tmp_path / "src")
    out_tbl = str(tmp_path / "out")
    events = load_table(spark, sf_dir, "events")
    write_delta(events, src_tbl)

    stream = read_stream(spark, src_tbl)
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
    q = (agg.writeStream
         .foreachBatch(delta_sink(out_tbl, "agg_q", output_mode="complete"))
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt3"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    dt = DeltaTable.forPath(spark, out_tbl)
    want = events.groupBy("event_type").count().count()
    assert dt.toDF().count() == want


def test_streaming_cdf_source(spark, tmp_table, sf_dir, tmp_path):
    """readChangeFeed streaming: inserts from the initial snapshot plus
    change rows (incl. delete-only commits) from later versions."""
    events = load_table(spark, sf_dir, "events")
    write_delta(events.limit(50), tmp_table,
                configuration={"delta.enableChangeDataFeed": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    sink_tbl = str(tmp_path / "cdf_sink")
    stream = read_stream(spark, tmp_table, readChangeFeed="true")
    q = write_stream(stream, sink_tbl, str(tmp_path / "cdfck"), query_id="cdfq")
    q.awaitTermination(120)
    out = DeltaTable.forPath(spark, sink_tbl)
    assert out.toDF().filter("_change_type = 'insert'").count() == 50

    # delete-only commit → delete change rows on resume
    n_del = dt.toDF().filter("value > 50").count()
    dt.delete("value > 50")
    stream2 = read_stream(spark, tmp_table, readChangeFeed="true")
    q2 = write_stream(stream2, sink_tbl, str(tmp_path / "cdfck"), query_id="cdfq")
    q2.awaitTermination(120)
    dels = out.toDF().filter("_change_type = 'delete'") \
        .agg(F.count(F.lit(1)).alias("c"), F.max("_commit_version").alias("v")).collect()[0]
    assert dels["c"] == n_del and dels["v"] == 1


def test_default_and_cluster_by(spark, tmp_table, sf_dir, tmp_path):
    from delta_spark.table import DeltaTable as DT
    (DT.create(spark).location(tmp_table)
     .addColumn("k", "long")
     .addColumn("status", "string", default="'new'")
     .clusterBy("k")
     .execute())
    df = spark.range(100).selectExpr("id AS k")
    write_delta(df, tmp_table, mode="append")
    dt = DT.forPath(spark, tmp_table)
    assert dt.toDF().filter("status = 'new'").count() == 100
    # OPTIMIZE on a clustered table re-clusters on the clustering cols
    res = dt.optimize().executeCompaction()
    assert dt.toDF().count() == 100
    # CREATE TABLE LIKE copies schema incl. default
    like_path = str(tmp_path / "like")
    dt2 = DT.createLike(spark, tmp_table, like_path)
    write_delta(spark.range(5).selectExpr("id AS k"), like_path, mode="append")
    assert dt2.toDF().filter("status = 'new'").count() == 5


def test_streaming_source_after_rename(spark, tmp_table, sf_dir, tmp_path):
    """Streaming read of a column-mapped table: files store physical
    names; the stream must emit logical ones."""
    events = load_table(spark, sf_dir, "events")
    write_delta(events.limit(40), tmp_table)
    DeltaTable.forPath(spark, tmp_table).renameColumn("value", "amount")
    write_delta(events.limit(10).withColumnRenamed("value", "amount"),
                tmp_table, mode="append")
    stream = read_stream(spark, tmp_table)
    q = (stream.writeStream.format("memory").queryName("m_ren")
         .option("checkpointLocation", str(tmp_path / "ckren"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("SELECT count(*) c, sum(amount) s FROM m_ren").collect()[0]
    want = events.limit(40).union(events.limit(10)).agg(
        F.count(F.lit(1)), F.sum("value")).collect()[0]
    assert out["c"] == want[0]
    assert abs(out["s"] - want[1]) < 1e-6
