"""Table redirects (redirect.py; reference redirect/TableRedirect.scala):
state machine gating, query routing on REDIRECT-READY, noRedirectRules
escape hatch, and chain rejection."""

import pytest
from pyspark.sql import functions as F

from delta_spark import redirect as R
from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable


def _mk(spark, path, n, tag):
    df = spark.range(n).select(
        F.col("id"), F.lit(tag).alias("src"))
    write_delta(df, path)
    return DeltaTable.forPath(spark, path)


def test_redirect_lifecycle_routes_queries(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    _mk(spark, src, 10, "old")
    _mk(spark, dest, 25, "new")

    R.enable_redirect(src, dest)
    # in-progress: reads still hit the source, writes are aborted
    DeltaLog.clear_cache()
    assert DeltaTable.forPath(spark, src).toDF().count() == 10
    with pytest.raises(R.RedirectStateError, match="read-only"):
        DeltaTable.forPath(spark, src).delete("id > 5")

    R.complete_redirect(src)
    DeltaLog.clear_cache()
    dt = DeltaTable.forPath(spark, src)
    # READY: the source handle resolves to the destination...
    assert dt.toDF().count() == 25
    assert dt.toDF().select("src").distinct().collect()[0][0] == "new"
    # ...and DML through the handle lands in the destination
    dt.delete("id >= 20")
    assert DeltaTable.forPath(spark, dest).toDF().count() == 20
    # direct commits against the source log stay refused
    with pytest.raises(R.RedirectStateError, match="REDIRECT-READY"):
        write_delta(spark.range(3).select(
            F.col("id"), F.lit("x").alias("src")), src, mode="append")

    R.start_drop_redirect(src)
    DeltaLog.clear_cache()
    # dropping: routing stops (new queries read the source), writes wait
    assert DeltaTable.forPath(spark, src).toDF().count() == 10
    with pytest.raises(R.RedirectStateError, match="read-only"):
        DeltaTable.forPath(spark, src).delete("id > 5")

    R.finish_drop_redirect(src)
    DeltaLog.clear_cache()
    dt = DeltaTable.forPath(spark, src)
    assert dt.toDF().count() == 10
    dt.delete("id > 5")  # writable again
    assert dt.toDF().count() == 6
    # the reader feature stays on the protocol after the drop
    assert "redirectReaderWriter-preview" in (
        dt.log.update().protocol.readerFeatures or [])


def test_no_redirect_rules_allow_listed_operations(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    _mk(spark, src, 10, "old")
    _mk(spark, dest, 10, "new")
    R.enable_redirect(src, dest,
                      rules=[{"allowedOperations": ["DELETE"]}])
    R.complete_redirect(src)
    DeltaLog.clear_cache()
    # the raw source log accepts the allow-listed operation only
    from delta_spark.commands.delete import execute_delete

    log = DeltaLog.for_table(src)
    execute_delete(spark, log, "id >= 8")
    # count via the raw log (forPath would route to dest)
    snap = log.update()
    from delta_spark.reader import read_snapshot

    assert read_snapshot(spark, snap).count() == 8
    with pytest.raises(R.RedirectStateError):
        write_delta(spark.range(2).select(
            F.col("id"), F.lit("x").alias("src")), src, mode="append")


def test_redirect_chain_rejected(spark, tmp_path):
    a, b, c = (str(tmp_path / x) for x in "abc")
    for p, tag in ((a, "a"), (b, "b"), (c, "c")):
        _mk(spark, p, 5, tag)
    R.enable_redirect(a, b)
    R.complete_redirect(a)
    R.enable_redirect(b, c)
    R.complete_redirect(b)
    DeltaLog.clear_cache()
    with pytest.raises(R.RedirectStateError, match="chain"):
        DeltaTable.forPath(spark, a)


def test_invalid_transition_rejected(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    _mk(spark, src, 5, "old")
    _mk(spark, dest, 5, "new")
    with pytest.raises(R.RedirectStateError, match="REDIRECT-READY"):
        R.start_drop_redirect(src)  # NO-REDIRECT -> DROP is illegal
    R.enable_redirect(src, dest)
    with pytest.raises(R.RedirectStateError):
        R.finish_drop_redirect(src)  # ENABLE -> NO via finish_drop: no


def test_time_travel_routes_to_destination(spark, tmp_path):
    """'All types of queries would be redirected' includes time travel:
    a pinned version/timestamp on a REDIRECT-READY source resolves
    against the DESTINATION log (matching the streaming/DataSource
    paths), not the source tombstone."""
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    _mk(spark, src, 10, "old")
    _mk(spark, dest, 25, "new")
    dd = DeltaTable.forPath(spark, dest)
    dd.delete("id >= 20")  # dest v1 has 20 rows, v0 has 25

    R.enable_redirect(src, dest)
    R.complete_redirect(src)
    DeltaLog.clear_cache()

    # @v pins against the destination's version space
    assert DeltaTable.forPath(spark, src + "@v0").toDF().count() == 25
    assert DeltaTable.forPath(spark, src + "@v1").toDF().count() == 20
    assert DeltaTable.forPath(spark, src + "@v1").toDF() \
        .select("src").distinct().collect()[0][0] == "new"

    # timestamp pinning resolves on the destination log too (use the
    # destination's own latest commit timestamp — future ts is a
    # strict error)
    import datetime as _dt
    ts_ms = dict(DeltaLog.for_table(dest)
                 ._monotonic_commit_timestamps())[1]
    ts = _dt.datetime.fromtimestamp(ts_ms / 1000.0, _dt.timezone.utc)
    suffix = ts.strftime("%Y%m%d%H%M%S") + "%03d" % (ts_ms % 1000)
    assert DeltaTable.forPath(spark, src + "@" + suffix) \
        .toDF().count() == 20
