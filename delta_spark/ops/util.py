"""Shared helpers for the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_width(df: DataFrame) -> DataFrame:
    """Repartition an UNDER-partitioned frame to cluster width before a
    per-row-expensive expansion (banding/probe UDFs, n-gram explodes).
    A corpus read from one small file is one scan split, so the
    expansion ran as a single serial task (measured: 2x 1.6 s 1-task
    stages on the sf0.1 gram expansion while 31 cores idled — guide
    §2.6 stragglers). The shuffle this adds is input-sized, so it only
    fires when the input has fewer splits than the cluster has slots —
    at real scale the scan has thousands of splits and this is a
    no-op. Under Connect (no RDD introspection) the input is left
    as-is."""
    from delta_spark.connect_compat import default_parallelism, is_connect

    if is_connect(df):
        return df
    try:
        nparts = df.rdd.getNumPartitions()
        width = default_parallelism(df.sparkSession)
    except Exception:
        return df
    return df.repartition(width) if nparts < width else df
