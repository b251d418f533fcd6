"""Spark Connect compatibility seams.

The reference ships a first-class Connect tier (`spark-connect/`,
python/delta/connect/tables.py) whose client sends Delta commands as
protobuf relations to server-side plugins. This engine is pure
DataFrame-API + client-side file IO, so most of its surface composes
the same way under a Connect session — PROVIDED the client process can
see the table storage (the `_delta_log` JSON is read and written by
THIS library, not the server; data files are read/written by the
server). The operating constraint is therefore a shared filesystem or
object store mounted at the same paths on both sides, exactly like the
reference's LogStore requirement.

What structurally cannot work under Connect is the handful of classic
(py4j / SparkContext) seams, each routed through this module so it can
degrade or fail LOUDLY instead of surfacing an AttributeError from
deep inside a command:

- ``SparkContext.defaultParallelism`` sizing hints → fall back to
  ``spark.sql.shuffle.partitions`` (the same knob a cluster tunes).
- ``sparkContext.parallelize`` (VACUUM's distributed listing) → the
  caller falls back to a client-side walk (same rows, sequential).
- analyzed-plan introspection (``df._jdf``) → merge source
  materialization stays fail-safe (always materialize) and DataFrame
  alias detection reads the Connect client plan instead.

Everything else — the Python DataSource streaming source, observe()
merge metrics, localCheckpoint materialization — exists in the
Connect client as of Spark 4 but is UNVERIFIED in this sandbox (no
grpcio); tests/test_connect.py carries the executable suite, which
skips without a Connect client and runs the core surface when one is
present. DEVIATIONS.md documents the support matrix.
"""

from __future__ import annotations

from typing import Any


class DeltaConnectUnsupportedError(RuntimeError):
    """A delta_spark operation that requires a classic (py4j)
    SparkSession was invoked under Spark Connect. The message names
    the feature and the reason; catching it and re-running on a
    classic session is always a valid fallback."""


def is_connect(obj: Any) -> bool:
    """True when `obj` (a SparkSession or DataFrame) is a Spark
    Connect client object. Duck-typed on the module path so this
    never imports pyspark.sql.connect (which hard-fails when grpcio
    is absent)."""
    return type(obj).__module__.startswith("pyspark.sql.connect")


def default_parallelism(spark) -> int:
    """Cluster-width sizing hint that works on both session kinds:
    classic reads SparkContext.defaultParallelism; Connect sessions
    have no SparkContext, so the shuffle width (the knob a cluster
    operator actually tunes) stands in."""
    if not is_connect(spark):
        return spark.sparkContext.defaultParallelism
    try:
        return max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    except Exception:
        return 200


def require_classic(spark, feature: str, reason: str) -> None:
    """Fail loudly (not with an AttributeError from py4j internals)
    when `feature` needs a classic session."""
    if is_connect(spark):
        raise DeltaConnectUnsupportedError(
            f"{feature} requires a classic (non-Connect) SparkSession: "
            f"{reason}. Run this operation from a classic session "
            "against the same table path — the log format is "
            "identical.")


def plan_size_estimate(df) -> int | None:
    """Catalyst's optimized-plan sizeInBytes estimate for a DataFrame
    (one py4j call), or None when unavailable (Connect — the client
    has no ``_jdf`` — analysis failure) or plainly a not-an-estimate
    default (>= 2^60: Spark's 'unknown' stats default is Long.Max-ish
    — treating it as a real size would defeat the cap semantics of
    the caller)."""
    if is_connect(df):
        return None
    try:
        sz = int(df._jdf.queryExecution().optimizedPlan().stats()
                 .sizeInBytes())
        return sz if 0 <= sz < (1 << 60) else None
    except Exception:
        return None


def connect_df_alias(df) -> str | None:
    """Top-level SubqueryAlias name of a Connect DataFrame, from the
    client-side plan (pyspark/sql/connect/plan.py SubqueryAlias keeps
    the name as `_alias`); None when the frame isn't aliased."""
    p = getattr(df, "_plan", None)
    if p is not None and type(p).__name__ == "SubqueryAlias":
        a = getattr(p, "_alias", None)
        if isinstance(a, str):
            return a
    return None
