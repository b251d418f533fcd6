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


def test_protocol_properties_consumed_not_stored(spark, tmp_table):
    """delta.minReaderVersion / delta.minWriterVersion / delta.feature.*
    are protocol properties (TableFeatureProtocolUtils
    isTableProtocolProperty): they upgrade the Protocol action and never
    land in metadata configuration."""
    write_delta(spark.range(3).withColumnRenamed("id", "a"), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    v0 = DeltaLog.for_table(tmp_table).update().version
    dt.setProperties({"delta.minReaderVersion": "3",
                      "delta.minWriterVersion": "7"})
    s = DeltaLog.for_table(tmp_table).update()
    assert (s.protocol.minReaderVersion, s.protocol.minWriterVersion) == (3, 7)
    # upgrading a (1,2) legacy protocol to v7 denormalizes its implied
    # features (actions.scala Protocol.implicitlySupportedFeatures)
    assert set(s.protocol.writerFeatures) == {"appendOnly", "invariants"}
    assert not any("minReaderVersion" in k or "minWriterVersion" in k
                   for k in s.configuration)

    # one atomic commit for feature + plain property
    dt.setProperties({"delta.feature.deletionVectors": "supported",
                      "team": "x"})
    s2 = DeltaLog.for_table(tmp_table).update()
    assert s2.version == v0 + 2
    assert "deletionVectors" in s2.protocol.readerFeatures
    assert "deletionVectors" in s2.protocol.writerFeatures
    assert s2.configuration.get("team") == "x"
    assert not any(k.startswith("delta.feature.") for k in s2.configuration)

    with pytest.raises(ValueError, match="only accepts"):
        dt.setProperties({"delta.feature.rowTracking": "maybe"})
    with pytest.raises(ValueError, match="unknown table feature"):
        dt.setProperties({"delta.feature.warpDrive": "supported"})


def test_metadata_driven_legacy_protocol_versions(spark, tmp_path):
    """Capabilities carried by metadata need their legacy protocol
    versions (minProtocolComponentsFromMetadata): column mapping (2,5),
    CDF writer 4 — in the weakest (legacy-normalized) form."""
    p1 = str(tmp_path / "cm")
    write_delta(spark.range(3).withColumnRenamed("id", "a"), p1,
                configuration={"delta.columnMapping.mode": "name"})
    pr = DeltaLog.for_table(p1).update().protocol
    assert (pr.minReaderVersion, pr.minWriterVersion) == (2, 5)
    assert pr.writerFeatures is None  # legacy normalized, not v7

    p2 = str(tmp_path / "cdf")
    write_delta(spark.range(3).withColumnRenamed("id", "a"), p2,
                configuration={"delta.enableChangeDataFeed": "true"})
    pr2 = DeltaLog.for_table(p2).update().protocol
    assert pr2.minWriterVersion >= 4

    # feature upgrade on a (2,5) table carries columnMapping in the
    # writer list but keeps the WEAKEST reader form: reader stays at
    # legacy 2 with no readerFeatures list (the reference's
    # denormalizedNormalized keeps (2,7) for columnMapping-only tables)
    dt = DeltaTable.forPath(spark, p1)
    dt.setProperties({"delta.feature.rowTracking": "supported"})
    pr3 = DeltaLog.for_table(p1).update().protocol
    assert "columnMapping" in pr3.writerFeatures
    assert "rowTracking" in pr3.writerFeatures
    assert (pr3.minReaderVersion, pr3.minWriterVersion) == (2, 7)
    assert pr3.readerFeatures is None


def test_protocol_version_requests_validated(spark, tmp_table):
    """Reader 3 requires the feature form (writer 7 + readerFeatures
    list, PROTOCOL.md); versions beyond this client's (3,7) are
    rejected at SET time instead of bricking the table."""
    write_delta(spark.range(3).withColumnRenamed("id", "a"), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    with pytest.raises(ValueError, match="unsupported protocol version"):
        dt.setProperties({"delta.minWriterVersion": "10"})
    with pytest.raises(ValueError, match="unsupported protocol version"):
        dt.upgradeTableProtocol(4, 7)
    # reader-3 request alone converts to the feature form, never the
    # spec-invalid (3, 2, None, None)
    dt.setProperties({"delta.minReaderVersion": "3"})
    pr = DeltaLog.for_table(tmp_table).update().protocol
    assert pr.minWriterVersion == 7
    assert pr.readerFeatures is not None
    assert "invariants" in pr.writerFeatures


def test_redundant_feature_request_no_protocol_action(spark, tmp_table):
    """Requesting an already-satisfied feature must not emit a no-op
    Protocol action (it would fail concurrent writers with
    ProtocolChangedException for nothing)."""
    import json as _json
    import os

    write_delta(spark.range(3).withColumnRenamed("id", "a"), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    # appendOnly is implied by legacy writer 2 — already satisfied
    dt.setProperties({"delta.feature.appendOnly": "supported", "k": "v"})
    snap = DeltaLog.for_table(tmp_table).update()
    last = os.path.join(tmp_table, "_delta_log",
                        "%020d.json" % snap.version)
    kinds = [next(iter(_json.loads(line))) for line in open(last)]
    assert "protocol" not in kinds
    assert snap.configuration.get("k") == "v"


def test_adaptive_metadata_preview_supported_but_gated(spark, tmp_table,
                                                        sf_dir):
    """adaptiveMetadata-preview is implemented (delta_spark/amt.py) —
    the feature is readable/writable, but ENABLEMENT is gated on its
    required features (TableFeature.scala:925): enabling it without
    catalogManaged/rowTracking/domainMetadata/deletionVectors/
    columnMapping(id) must fail by name, not write a broken tree."""
    write_delta(load_table(spark, sf_dir, "region"), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    with pytest.raises(ValueError, match="requires table features"):
        dt.setProperties({
            "delta.feature.adaptiveMetadata-preview": "supported"})


@pytest.mark.parametrize("preview,ga,reader_leg", [
    ("variantType-preview", "variantType", True),
    ("variantShredding-preview", "variantShredding", True),
    ("typeWidening-preview", "typeWidening", True),
    ("geospatial-dev", "geospatial", True),
    ("collations-preview", "collations", False),
    ("coordinatedCommits-preview", "coordinatedCommits", False),
])
def test_preview_feature_names_read_write_without_ga_upgrade(
        spark, tmp_table, sf_dir, preview, ga, reader_leg):
    """Preview/dev spellings gate the SAME semantics as the GA name
    (reference TableFeature.scala:797,843,688 — distinct features,
    identical behavior): a reference-written table declaring only the
    preview name must read AND write through the protocol gate, and the
    write must NOT force-add the GA feature (protocol churn on every
    preview table otherwise)."""
    df = load_table(spark, sf_dir, "region")
    write_delta(df, tmp_table)
    rf = [preview] if reader_leg else None
    _raise_protocol(tmp_table, minReaderVersion=3 if reader_leg else 1,
                    minWriterVersion=7, readerFeatures=rf,
                    writerFeatures=[preview])
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF().count() == df.count()
    write_delta(df, tmp_table, mode="append")
    p = DeltaLog.for_table(tmp_table).update().protocol
    feats = set(p.readerFeatures or []) | set(p.writerFeatures or [])
    assert preview in feats
    assert ga not in feats


def test_iceberg_compat_v1_feature_accepted(spark, tmp_table, sf_dir):
    """icebergCompatV1 (TableFeature.scala:1077 — legacy writer
    feature) passes the write gate: a table written by an old UniForm
    client keeps working."""
    df = load_table(spark, sf_dir, "region")
    write_delta(df, tmp_table)
    _raise_protocol(tmp_table, minReaderVersion=1, minWriterVersion=7,
                    writerFeatures=["icebergCompatV1"])
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF().count() == df.count()
    write_delta(df, tmp_table, mode="append")
    assert dt.toDF().count() == 2 * df.count()


def test_reference_preview_variant_fixture_reads_and_writes(spark, tmp_path):
    """The reference-written variant-stats-no-checkpoint fixture
    declares variantShredding-preview in its protocol: it must read,
    accept an append, and keep its preview protocol un-churned."""
    import shutil

    src = ("/root/reference/spark/src/test/resources/delta/"
           "variant-stats-no-checkpoint")
    if not os.path.isdir(src):
        pytest.skip("reference fixture not present")
    p = str(tmp_path / "variant_preview")
    shutil.copytree(src, p)
    DeltaLog.clear_cache()
    dt = DeltaTable.forPath(spark, p)
    before = dt.toDF().count()
    assert before > 0
    proto0 = DeltaLog.for_table(p).update().protocol
    assert "variantShredding-preview" in (proto0.readerFeatures or [])
    write_delta(dt.toDF().limit(1), p, mode="append")
    assert dt.toDF().count() == before + 1
    proto1 = DeltaLog.for_table(p).update().protocol
    feats = set(proto1.readerFeatures or []) | set(proto1.writerFeatures or [])
    assert "variantShredding-preview" in feats
    assert "variantShredding" not in feats
