"""Reference-compatible configure_spark_with_delta_pip
(python/delta/pip_utils.py:21).

The reference version injects the io.delta:delta-spark JVM artifact via
spark.jars.packages. This engine is pure PySpark — there is no JVM
artifact to fetch — so the builder comes back with delta_spark's
session defaults applied instead (shuffle width, executor PYTHONPATH
for the Python-worker seams) and `extra_packages` still mapped onto
spark.jars.packages for users who combine it with other connectors."""

from __future__ import annotations

from typing import Optional


def configure_spark_with_delta_pip(spark_session_builder,
                                   extra_packages: Optional[list] = None):
    from delta_spark.session import configure_spark

    builder = configure_spark(spark_session_builder)
    if extra_packages:
        # MERGE with whatever the user already configured (the
        # reference comma-joins its artifact list with extra_packages;
        # overwriting would silently drop the user's connectors)
        existing = ""
        opts = getattr(builder, "_options", None)
        if isinstance(opts, dict):
            existing = opts.get("spark.jars.packages", "") or ""
        merged = [p for p in existing.split(",") if p]
        merged += [p for p in extra_packages if p not in merged]
        builder = builder.config("spark.jars.packages", ",".join(merged))
    return builder
