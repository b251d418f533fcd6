"""SparkSession helpers tuned for this engine.

Defaults are scale-minded: AQE on (runtime coalesce + skew-join),
shuffle partitions sized to the local core count (on a real cluster
you'd size to ~2-3× total cores or rely on AQE coalesce), Arrow enabled
for the few pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def configure_spark(builder: "SparkSession.Builder", shuffle_partitions: int | None = None) -> "SparkSession.Builder":
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sp = shuffle_partitions or cpus
    # Python workers (pandas UDFs, mapInPandas, DataSource streaming)
    # run in separate processes and must be able to import delta_spark
    # even when the driver only put it on sys.path — export the package
    # root on the executors' PYTHONPATH.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if pkg_root not in py_path.split(os.pathsep):
        py_path = pkg_root + (os.pathsep + py_path if py_path else "")
        # local mode: workers fork from the driver-spawned JVM, which
        # inherits THIS process env — must be set before getOrCreate
        os.environ["PYTHONPATH"] = py_path
    # local-mode note: driver and all executor threads share ONE JVM,
    # and Spark's default driver heap is 1g — a silent GC tax (and OOM
    # risk on wide shuffles) on machines with plenty of RAM. Sized here
    # from the host (≈half of physical RAM, capped at 64g) unless the
    # deployment overrides it. Auto-sizing applies ONLY when the master
    # is local[*] — in client mode on a shared host a 64g default heap
    # would starve co-tenants, so non-local masters keep Spark's own
    # default unless SPARK_GRAFT_DRIVER_MEM says otherwise.
    master = (getattr(builder, "_options", {}) or {}).get(
        "spark.master", os.environ.get("SPARK_GRAFT_MASTER", "local"))
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if not mem and str(master).startswith("local"):
        try:
            import re as _re

            with open("/proc/meminfo") as fh:
                kb = int(_re.search(r"MemTotal:\s+(\d+)", fh.read()).group(1))
            mem = f"{max(2, min(64, kb // (2 * 1024 * 1024)))}g"
        except Exception:
            mem = "4g"
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    return (
        builder
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.executorEnv.PYTHONPATH", py_path)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # testdata events.parquet carries TIMESTAMP(NANOS) which Spark's
        # reader rejects; read as long + convert (see datasets.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # our readers pass explicit file lists; ignore spurious dir junk
        .config("spark.sql.sources.ignoreDataLocality.enabled", "true")
        # our scans pass EXPLICIT path lists resolved from the delta
        # log (no globbing, no directory discovery), so the "parallel
        # partition discovery" Spark job is pure overhead for them: a
        # 1,000-path CDF read spent 2.2 s scheduling the listing job vs
        # 0.24 s listing driver-side with the built-in thread pool
        # (measured; guide §6 file listing). Above this threshold —
        # e.g. a 10⁵-file CDF group on object storage — the
        # distributed listing still engages, which is the regime it is
        # designed for.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
                "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dio.netty.tryReflectionSetAccessible=true")
    )


def get_spark(app_name: str = "delta_spark", master: str | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = SparkSession.builder.appName(app_name).master(master or f"local[{cpus}]")
    builder = configure_spark(builder)
    spark = builder.getOrCreate()
    from delta_spark.connect_compat import is_connect

    if not is_connect(spark):  # Connect sessions have no SparkContext
        spark.sparkContext.setLogLevel("WARN")
    return spark
