"""Protocol client gating (PROTOCOL.md Reader/Writer Requirements;
actions.scala:232): fail closed on tables demanding versions or table
features this client doesn't implement — reading past an unknown reader
feature risks silently wrong results, writing past an unknown writer
feature corrupts the table. Plus vacuumProtocolCheck acceptance and the
checkpointProtection barrier left behind by DROP FEATURE TRUNCATE
HISTORY."""

import json
import os

import pytest

from delta_spark.actions import Protocol
from delta_spark.datasets import load_table
from delta_spark.exceptions import (InvalidProtocolVersionException,
                                    UnsupportedTableFeatureException)
from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable
from delta_spark.transaction import OptimisticTransaction


def _raise_protocol(path, **kw):
    """Append a raw protocol commit (as a foreign writer would)."""
    log = DeltaLog.for_table(path)
    v = log.latest_version() + 1
    p = {k: v2 for k, v2 in kw.items() if v2 is not None}
    with open(os.path.join(path, "_delta_log", f"{v:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": p}) + "\n")
    DeltaLog.clear_cache()


def test_unknown_reader_feature_fails_read_and_write(spark, tmp_table, sf_dir):
    write_delta(load_table(spark, sf_dir, "region"), tmp_table)
    _raise_protocol(tmp_table, minReaderVersion=3, minWriterVersion=7,
                    readerFeatures=["futureMagic"],
                    writerFeatures=["futureMagic"])
    with pytest.raises(UnsupportedTableFeatureException):
        DeltaLog.for_table(tmp_table).update()
    with pytest.raises(UnsupportedTableFeatureException):
        DeltaTable.forPath(spark, tmp_table).toDF().count()


def test_unknown_writer_feature_reads_but_refuses_writes(spark, tmp_table, sf_dir):
    df = load_table(spark, sf_dir, "region")
    write_delta(df, tmp_table)
    _raise_protocol(tmp_table, minReaderVersion=1, minWriterVersion=7,
                    writerFeatures=["futureWriterMagic"])
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF().count() == df.count()  # reads stay legal
    with pytest.raises(UnsupportedTableFeatureException):
        write_delta(df, tmp_table, mode="append")
    with pytest.raises(UnsupportedTableFeatureException):
        dt.delete("r_regionkey = 0")


def test_future_reader_version_fails(spark, tmp_table, sf_dir):
    write_delta(load_table(spark, sf_dir, "region"), tmp_table)
    _raise_protocol(tmp_table, minReaderVersion=9, minWriterVersion=9)
    with pytest.raises(InvalidProtocolVersionException):
        DeltaLog.for_table(tmp_table).update()


def test_vacuum_protocol_check_supported(spark, tmp_table, sf_dir):
    write_delta(load_table(spark, sf_dir, "region"), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.addFeatureSupport("vacuumProtocolCheck")
    p = DeltaLog.for_table(tmp_table).update().protocol
    assert "vacuumProtocolCheck" in (p.readerFeatures or [])
    assert "vacuumProtocolCheck" in (p.writerFeatures or [])
    # VACUUM runs (protocol understood) and the feature survives it
    dt.vacuum(0)
    p2 = DeltaLog.for_table(tmp_table).update().protocol
    assert "vacuumProtocolCheck" in (p2.writerFeatures or [])


def test_drop_feature_leaves_checkpoint_protection(spark, tmp_table, sf_dir):
    write_delta(load_table(spark, sf_dir, "orders").limit(100), tmp_table,
                configuration={"delta.enableDeletionVectors": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("o_orderkey % 3 = 0")
    dt.dropFeature("deletionVectors", truncate_history=True)
    log = DeltaLog.for_table(tmp_table)
    snap = log.update()
    assert "deletionVectors" not in (snap.protocol.readerFeatures or [])
    assert "checkpointProtection" in (snap.protocol.writerFeatures or [])
    barrier = int(snap.configuration[
        "delta.requireCheckpointProtectionBeforeVersion"])
    assert barrier == snap.version
    # the barrier governs cleanup: with the newest checkpoint behind it,
    # cleanup first writes one at/after the barrier (or refuses)
    from delta_spark.util import current_time_millis
    log.cleanup_expired_logs(
        now_ms=current_time_millis() + log.log_retention_ms() + 60_000)
    ceiling = log.list_checkpoint_versions()[-1]
    assert ceiling >= barrier
    # table still reads fine after the protected cleanup
    DeltaLog.clear_cache()
    want = (load_table(spark, sf_dir, "orders").limit(100)
            .filter("o_orderkey % 3 <> 0").count())
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == want
