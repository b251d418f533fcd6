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
