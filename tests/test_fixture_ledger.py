"""Reference-fixture consumption: the log-replay / path-oddity golden
tables that carry no (or synthetic) data files are consumed at the
REPLAY level here — active-set cardinality, decoded paths, DV
residency — mirroring the reference's own expectations
(kernel-defaults LogReplaySuite.scala:114-244, DeltaLogSuite), and the
generated ledger in FIXTURES.md is enforced to cover every fixture."""

import os
import sys

import pytest

from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable
from delta_spark.util import decode_log_path

GOLDEN = "/root/reference/connectors/golden-tables/src/main/resources/golden"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN), reason="golden tables absent")


def _snap(name):
    DeltaLog.clear_cache()
    return DeltaLog.for_table(os.path.join(GOLDEN, name)).update()


def test_log_replay_special_characters_family(spark):
    """Percent-encoded special characters in add/remove paths must key
    the SAME file for replay cancellation (LogReplaySuite 'special
    characters in path'): the unsuffixed and -a tables add then remove
    'special p@#h' (active set empty); -b keeps one live file whose
    DECODED name is the literal 'special p@#h'."""
    for name in ("log-replay-special-characters",
                 "log-replay-special-characters-a"):
        assert _snap(name).all_files == [], name
    snap_b = _snap("log-replay-special-characters-b")
    assert len(snap_b.all_files) == 1
    decoded = decode_log_path(snap_b.all_files[0].path)
    assert os.path.basename(decoded) == "special p@#h"


def test_absolute_paths_escaped_chars_fails_closed(spark):
    """data-reader-absolute-paths-escaped-chars carries NO metaData
    action (it was generated for the standalone connector with paths
    rewritten at generation time; the committed log is incomplete) —
    the reference's own Spark engine lists it as unsupported
    (SparkGoldenTableTest.java:614, DELTA_STATE_RECOVER_ERROR). We
    must fail closed the same way, not serve a schema-less table."""
    with pytest.raises(ValueError, match="metadata.*could not be "
                                         "recovered"):
        _snap("data-reader-absolute-paths-escaped-chars")


def test_update_deleted_directory_replay(spark):
    """update-deleted-directory (DeltaLogSuite SC-8078): 10 synthetic
    AddFiles ('1'..'10') + a checkpoint; the data directory never
    existed, but the LOG must still replay — metadata-level operations
    on a table whose data was externally deleted cannot crash."""
    snap = _snap("update-deleted-directory")
    assert len(snap.all_files) == 10
    assert {f.path for f in snap.all_files} == {str(i) for i in
                                                range(1, 11)}


def test_corrupted_last_checkpoint_unsuffixed_variant(spark):
    """corrupted-last-checkpoint (the non-kernel twin): 11 one-add
    commits + a checkpoint at v10; replay lands on v10 with 11 active
    files, and a corrupted _last_checkpoint (truncated copy) is
    ignored in favor of listing."""
    import shutil
    import tempfile

    snap = _snap("corrupted-last-checkpoint")
    assert snap.version == 10
    assert len(snap.all_files) == 11
    # corrupt the pointer in a COPY: snapshot must still resolve
    with tempfile.TemporaryDirectory() as td:
        t = os.path.join(td, "tbl")
        shutil.copytree(os.path.join(GOLDEN, "corrupted-last-checkpoint"), t)
        with open(os.path.join(t, "_delta_log", "_last_checkpoint"),
                  "w") as f:
            f.write('{"version"')
        DeltaLog.clear_cache()
        snap2 = DeltaLog.for_table(t).update()
        assert snap2.version == 10 and len(snap2.all_files) == 11
    DeltaLog.clear_cache()


def test_log_replay_dv_key_cases(spark):
    """log-replay-dv-key-cases (LogReplaySuite:220): three DELETEs each
    re-add the SAME parquet path with a new DV — replay keys on
    (path, dvId), so exactly ONE add survives, carrying the latest DV
    (cardinality 3), and a read serves 50-3=47 rows."""
    snap = _snap("log-replay-dv-key-cases")
    assert len(snap.all_files) == 1
    dv = snap.all_files[0].deletionVector
    assert dv and int(dv.get("cardinality")) == 3
    dt = DeltaTable.forPath(spark, os.path.join(GOLDEN,
                                                "log-replay-dv-key-cases"))
    assert dt.toDF().count() == 47


def test_fixture_ledger_complete():
    """Every fixture table under the two reference corpora is either
    consumed by a test or explicitly skipped with a reason — and the
    generated ledger in FIXTURES.md reflects exactly that set."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import gen_fixture_ledger as gl

    rows, problems = gl.build_ledger()
    assert not problems, f"unconsumed fixtures: {problems}"
    # the committed FIXTURES.md section lists every row
    fixtures_md = open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FIXTURES.md")).read()
    assert gl.BEGIN in fixtures_md, "ledger section missing — run " \
        "python scripts/gen_fixture_ledger.py"
    for _, name, status, _r in rows:
        assert f"`{name}`" in fixtures_md, f"{name} missing from ledger"
        if status == "skipped":
            assert name in gl.SKIPS or os.path.basename(name) in gl.SKIPS
