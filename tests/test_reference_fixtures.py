"""Cross-implementation conformance: open tables WRITTEN BY THE
REFERENCE IMPLEMENTATION (its versioned on-disk test fixtures,
spark/src/test/resources/delta — the EvolvabilitySuite corpus) with
this engine and verify the results.

The expectation for each fixture is computed by an INDEPENDENT
mini-replay in this test module (raw json + pyarrow, no delta_spark
code), so an engine bug can't cancel out of both sides. Covers:
protocol v1 logs from Delta 0.1.0, checkpointed v2 logs from 1.2.1,
name-mapped tables with protocol 'u' deletion vectors (z85 prefix
paths), and special characters in data paths."""

import json
import os

import pytest

from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable

REF = "/root/reference/spark/src/test/resources/delta"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not present")


def _naive_state(table):
    """Independent last-writer-wins replay: checkpoint parquet + json
    commits, no delta_spark involved."""
    import pyarrow.parquet as pq

    logdir = os.path.join(table, "_delta_log")
    names = sorted(n for n in os.listdir(logdir)
                   if n.endswith(".json") and n[:20].isdigit())
    ckpts = sorted(n for n in os.listdir(logdir)
                   if n.endswith(".checkpoint.parquet"))
    active = {}
    start = 0
    if ckpts:
        ck = ckpts[-1]
        start = int(ck.split(".")[0]) + 1
        for row in pq.read_table(os.path.join(logdir, ck)).to_pylist():
            if row.get("add") and row["add"].get("path"):
                a = row["add"]
                active[a["path"]] = a
            if row.get("remove") and row["remove"].get("path"):
                active.pop(row["remove"]["path"], None)
    for n in names:
        if int(n[:20]) < start:
            continue
        with open(os.path.join(logdir, n)) as f:
            for line in f:
                if not line.strip():
                    continue
                d = json.loads(line)
                if "add" in d:
                    active[d["add"]["path"]] = d["add"]
                elif "remove" in d:
                    active.pop(d["remove"]["path"], None)
    return active


def _expected_rows(table):
    """Σ file rows − Σ DV cardinality, file rows from stats when
    present else the parquet footer."""
    import pyarrow.parquet as pq
    from urllib.parse import unquote

    total = 0
    for path, a in _naive_state(table).items():
        stats = a.get("stats")
        nrec = None
        if stats:
            nrec = json.loads(stats).get("numRecords")
        if nrec is None:
            nrec = pq.ParquetFile(
                os.path.join(table, unquote(path))).metadata.num_rows
        dv = a.get("deletionVector")
        total += nrec - ((dv or {}).get("cardinality") or 0)
    return total


@pytest.mark.parametrize("fixture", [
    "delta-0.1.0",            # protocol (1,1), written by Delta 0.1.0
    "delta-1.2.1",            # protocol (1,2), multi-checkpoint log
    "table-with-dv-small",    # name mapping + protocol 'u' DV
    "partitioned-table-with-dv-large",  # partitioned, many 'u' DVs
    "identity_test_written_by_version_5",
    "transaction_log_schema_evolvability",
    # variant columns + shredding feature, URL-ENCODED data paths
    # (test%25file%25prefix-part-...)
    "variant-stats-no-checkpoint",
    "variant-stats-nested-no-checkpoint",
    "variant-stats-with-struct-no-checkpoint",
    "variant-stats-state-reconstruction",  # variant stats via checkpoint
    "dbr_8_0_non_generated_columns",       # DBR 8.0 writer, empty table
    "dbr_8_1_generated_columns",           # generated-column metadata
    "table-with-dv-large",                 # many multi-container 'u' DVs
    "history/delta-0.2.0",                 # pre-protocol-v2 history log
])
def test_reference_written_table_reads(spark, fixture):
    table = os.path.join(REF, fixture)
    DeltaLog.clear_cache()
    dt = DeltaTable.forPath(spark, table)
    assert dt.toDF().count() == _expected_rows(table)


def test_reference_absolute_dv_uri_with_special_chars(spark, tmp_path):
    """table-with-dv-special-char: an absolute 'p' DV descriptor whose
    URI percent-encodes '&', '%', and space in the directory name (the
    fixture is a template; the reference suite substitutes the absolute
    location the same way — writeTableHavingSpecialCharInDVPath with
    pathIsEncoded=true). Expect the 5 odd values of 0..9 to survive."""
    import shutil

    src = os.path.join(REF, "table-with-dv-special-char")
    table = str(tmp_path / "dv_special")
    shutil.copytree(src, table)
    logf = os.path.join(table, "_delta_log", f"{0:020d}.json")
    with open(logf) as f:
        content = f.read()
    encoded = os.path.join(table, "folder&with%25special%20char")
    with open(logf, "w") as f:
        f.write(content.replace("{{FOLDER_WITH_SPECIAL_CHAR}}", encoded))
    DeltaLog.clear_cache()
    dt = DeltaTable.forPath(spark, table)
    vals = sorted(r["id"] for r in dt.toDF().collect())
    assert len(vals) == _expected_rows(table)
    assert vals == [1, 3, 5, 7, 9]


def test_reference_dv_table_values(spark):
    """table-with-dv-small: 10 ints 0..9 with {0, 9} deleted via a 'u'
    deletion vector (per its DELETE commitInfo predicate `value IN
    (0, 9)`) — exact surviving values, through name mapping + the
    portable roaring codec + the z85 prefix path."""
    DeltaLog.clear_cache()
    dt = DeltaTable.forPath(spark, os.path.join(REF, "table-with-dv-small"))
    vals = sorted(r["value"] for r in dt.toDF().collect())
    assert vals == list(range(1, 9))


def test_reference_table_time_travel_and_history(spark):
    """Version 0 of delta-1.2.1 predates its later appends; history
    surfaces every reference-written commit."""
    table = os.path.join(REF, "delta-1.2.1")
    DeltaLog.clear_cache()
    dt = DeltaTable.forPath(spark, table)
    latest = DeltaLog.for_table(table).latest_version()
    assert dt.history().count() == latest + 1
    v0 = dt.asOfVersion(0).count()
    assert 0 < v0 <= dt.toDF().count()


def test_special_char_partition_roundtrip(spark, tmp_path):
    """Partition values with spaces/%/& round-trip through our own
    writer's URL-encoded log paths: write, read back, DELETE one
    partition, VACUUM — every path resolution decodes correctly."""
    from delta_spark.io import write_delta

    table = str(tmp_path / "special")
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(
            ["a b", "50%", "x&y", "plain"] * 5)], "id long, p string")
    write_delta(df, table, partition_by=["p"])
    DeltaLog.clear_cache()
    dt = DeltaTable.forPath(spark, table)
    assert dt.toDF().count() == 20
    got = {r["p"] for r in dt.toDF().select("p").distinct().collect()}
    assert got == {"a b", "50%", "x&y", "plain"}
    dt.delete("p = '50%'")
    assert dt.toDF().count() == 15
    victims = dt.vacuum(0)
    assert all(os.path.exists(v) is False for v in victims)
    assert dt.toDF().count() == 15


def test_resolve_log_path_schemes():
    from delta_spark.util import resolve_log_path

    t = "/data/tbl"
    assert resolve_log_path(t, "p=a%20b/f.parquet") == "/data/tbl/p=a b/f.parquet"
    assert resolve_log_path(t, "/abs/f.parquet") == "/abs/f.parquet"
    # file: URIs decode to local paths; other schemes pass through intact
    assert resolve_log_path(t, "file:/src/p%20x/f.parquet") == "/src/p x/f.parquet"
    assert resolve_log_path(t, "s3a://bucket/k/f.parquet") == "s3a://bucket/k/f.parquet"


def test_plus_in_partition_value_with_dv(spark, tmp_path):
    """'+' is not Hive-escaped on disk and form-decoding turns it into
    a space — the DV file-key join must still match."""
    from delta_spark.io import write_delta

    table = str(tmp_path / "plus")
    df = spark.createDataFrame(
        [(i, "a+b" if i % 2 else "plain") for i in range(20)],
        "id long, p string")
    write_delta(df, table, partition_by=["p"],
                configuration={"delta.enableDeletionVectors": "true"})
    dt = DeltaTable.forPath(spark, table)
    dt.delete("id < 4")  # DV-masks rows in both partitions
    assert dt.toDF().count() == 16
    assert dt.toDF().filter("p = 'a+b'").count() == 8


def test_rearrangement_replace_where_is_fully_non_datachange(spark, tmp_path):
    """data_change=False + replaceWhere flips EVERY file action
    (rearrangeOnly): a tailing stream skips the commit."""
    from delta_spark.io import write_delta
    from delta_spark.log import DeltaLog

    table = str(tmp_path / "rearr")
    df = spark.createDataFrame([(i, i % 2) for i in range(10)], "id long, b long")
    write_delta(df, table, partition_by=["b"])
    # rewrite partition b=1 with identical rows, rearrangement-only
    write_delta(df.filter("b = 1"), table, mode="overwrite",
                replace_where="b = 1", data_change=False)
    log = DeltaLog.for_table(table)
    acts = log.read_commit_actions(log.latest_version())
    file_actions = [(k, a) for k, a in acts if k in ("add", "remove")]
    assert file_actions and all(not a.dataChange for _k, a in file_actions)
    assert not any(k == "cdc" for k, _a in acts)
    assert DeltaTable.forPath(spark, table).toDF().count() == 10


GOLDEN = "/root/reference/connectors/golden-tables/src/main/resources/golden"


@pytest.mark.skipif(not os.path.isdir(GOLDEN), reason="golden tables absent")
def test_golden_canonicalized_paths_replay(spark):
    """Golden tables canonicalized-paths-*: an `add /x` must be
    cancelled by a `remove file:/x` (and vice versa) — replay keys are
    canonical, not raw strings (InMemoryLogReplay)."""
    for fx in ("canonicalized-paths-normal-a", "canonicalized-paths-normal-b",
               "canonicalized-paths-special-a", "canonicalized-paths-special-b"):
        DeltaLog.clear_cache()
        snap = DeltaLog.for_table(os.path.join(GOLDEN, fx)).update()
        assert len(snap.all_files) == 0, fx  # remove cancels the add


@pytest.mark.skipif(not os.path.isdir(GOLDEN), reason="golden tables absent")
def test_golden_invalid_protocol_rejected(spark):
    from delta_spark.exceptions import InvalidProtocolVersionException

    DeltaLog.clear_cache()
    with pytest.raises(InvalidProtocolVersionException):
        DeltaLog.for_table(
            os.path.join(GOLDEN, "deltalog-invalid-protocol-version")).update()


@pytest.mark.skipif(not os.path.isdir(GOLDEN), reason="golden tables absent")
@pytest.mark.parametrize("fixture", [
    "data-reader-primitives", "data-reader-map", "data-reader-nested-struct",
    "data-reader-array-primitives", "data-reader-partition-values",
    "data-reader-escaped-chars", "basic-decimal-table",
    "basic-with-inserts-deletes-checkpoint", "basic-with-inserts-merge",
    "basic-with-inserts-overwrite-restore", "basic-with-inserts-updates",
    "basic-with-vacuum-protocol-check-feature",
    "data-reader-timestamp_ntz-name-mode", "data-skipping-basic-stats-all-types",
    "time-travel-schema-changes-a", "124-decimal-decode-bug",
])
def test_golden_table_reads(spark, fixture):
    """Cross-connector golden corpus (GoldenTables.scala role): our
    engine's row count equals the independent mini-replay's expectation."""
    table = os.path.join(GOLDEN, fixture)
    DeltaLog.clear_cache()
    dt = DeltaTable.forPath(spark, table)
    assert dt.toDF().count() == _expected_rows(table)


@pytest.mark.skipif(not os.path.isdir(GOLDEN), reason="golden tables absent")
def test_golden_checkpoint_log_replay(spark):
    """The 'checkpoint' golden is log-only (synthetic adds, 15 commits):
    our replayed live-file set must match the independent replay."""
    table = os.path.join(GOLDEN, "checkpoint")
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(table).update()
    assert len(snap.all_files) == len(_naive_state(table))


def test_gigantic_dv_log_plans_beyond_2_31_rows(spark):
    """table-with-dv-gigantic: a synthetic 2.15-BILLION-row add with a
    'u' DV over row indexes beyond 2^31 (the reference's 64-bit row
    index test; data/DV blobs are absent from the fixture by design).
    The snapshot must still PLAN from the log alone: parse the
    descriptor, decode the z85 path, keep 64-bit row counts exact, and
    include the file in a pruned scan listing."""
    table = os.path.join(REF, "table-with-dv-gigantic")
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(table).update()
    files = snap.all_files
    assert len(files) == 1
    dv = files[0].deletionVector
    assert dv is not None and dv["cardinality"] == 2147484
    assert files[0].num_records == 2147483658  # > 2^31, no truncation
    assert len(snap.files_for_scan("value >= 0")) == 1
    assert len(snap.files_for_scan("value > 100")) == 0  # max stat = 21
    from delta_spark.dv import absolute_dv_path
    assert absolute_dv_path(table, dv).endswith(".bin")


def test_variant_fixture_values_reconstruct(spark):
    """Value-level conformance for the reference-written SHREDDED
    variant tables (delta.enableVariantShredding=true, DBR writer —
    the parquet carries typed_value subcolumns, so a correct read
    REASSEMBLES the variant rather than just copying bytes). The
    expected JSON follows the fixture generator's arithmetic pattern
    (i = 100+x ↔ v = {id:x, name:str(10-x)}, nv.v shifted by 10), so
    a reconstruction bug can't cancel out of both sides."""
    table = os.path.join(REF, "variant-stats-no-checkpoint")
    DeltaLog.clear_cache()
    rows = (DeltaTable.forPath(spark, table).toDF()
            .selectExpr("i", "to_json(v) AS jv", "to_json(nv.v) AS jnv")
            .orderBy("i").collect())
    assert len(rows) == 10
    for x, r in enumerate(rows):
        assert r["i"] == 100 + x
        assert r["jv"] == '{"id":%d,"name":"%d"}' % (x, 10 - x)
        assert r["jnv"] == '{"id":%d,"name":"%d"}' % (10 + x, 20 - x)

    nested = os.path.join(REF, "variant-stats-nested-no-checkpoint")
    rows = (DeltaTable.forPath(spark, nested).toDF()
            .selectExpr("i", "to_json(s.v) AS jv").orderBy("i").collect())
    for r in rows:
        x = r["i"]
        assert r["jv"] == '{"name":"item_%d","value":%d}' % (x, x)

    ws = os.path.join(REF, "variant-stats-with-struct-no-checkpoint")
    rows = (DeltaTable.forPath(spark, ws).toDF()
            .selectExpr("s.i AS i", "s.j AS j", "to_json(v) AS jv")
            .orderBy("s.i").collect())
    for r in rows:
        assert r["j"] == "str_%d" % r["i"]
        assert r["jv"] == '{"key":%d}' % r["i"]
