"""Catalog-managed tables (PROTOCOL.md "Catalog-Managed Tables",
catalog_managed.py): the catalog ratifies commits, its latest version
is authoritative for readers, publishing is in-order, and maintenance
needs the catalog's permission."""

import glob
import json
import os

import pytest

from delta_spark import DeltaLog, DeltaTable, write_delta
from delta_spark import catalog_managed as CM

FS_CONF = {CM.CATALOG_PROP: "filesystem"}


def _li(spark, sf_dir, n=200):
    from delta_spark.datasets import load_table

    return load_table(spark, sf_dir, "lineitem").limit(n)


def _log_path(tbl):
    return os.path.join(tbl, "_delta_log")


def test_create_enables_feature_and_ict(spark, tmp_table, sf_dir):
    """Enabling the catalog adds the catalogManaged reader+writer
    feature and force-activates in-commit timestamps (writer
    requirements, PROTOCOL.md:1395); commitInfo carries txnId."""
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=FS_CONF)
    dt = DeltaTable.forPath(spark, tmp_table)
    snap = dt.log.update()
    assert "catalogManaged" in (snap.protocol.readerFeatures or [])
    assert "catalogManaged" in (snap.protocol.writerFeatures or [])
    assert "inCommitTimestamp" in (snap.protocol.writerFeatures or [])
    assert snap.configuration.get("delta.enableInCommitTimestamps") == "true"
    assert dt.toDF().count() == df.count()
    # commitInfo.txnId is mandatory on catalog-managed tables
    with open(os.path.join(_log_path(tmp_table), "%020d.json" % 0)) as f:
        ci = json.loads(f.readline())["commitInfo"]
    assert ci.get("txnId")


def test_dml_and_time_travel(spark, tmp_table, sf_dir):
    """Full DML lifecycle through the catalog commit protocol."""
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=FS_CONF)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 40")
    dt.update({"l_discount": "l_discount + CAST(0.01 AS DOUBLE)"},
              "l_quantity < 5")
    want = df.filter("NOT coalesce(l_quantity > 40, false)").count()
    assert dt.toDF().count() == want
    assert dt.asOfVersion(0).count() == df.count()
    assert dt.history().count() == 3
    # every version was ratified by the catalog (records published →
    # removed, but the watermark survives)
    cat = CM.CATALOGS["filesystem"]
    latest, ratified = cat.ratified(_log_path(tmp_table))
    assert latest == 2 and ratified == {}


def test_unpublished_tail_readable_and_publish(spark, tmp_table, sf_dir):
    """autoPublish=false: ratified commits live only as staged files +
    catalog records; readers still see them (catalog tail), and
    publish() backfills the classic files in order."""
    conf = {**FS_CONF, CM.AUTO_PUBLISH_PROP: "false"}
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=conf)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 40")
    lp = _log_path(tmp_table)
    assert glob.glob(os.path.join(lp, "0*.json")) == []  # nothing published
    want = df.filter("NOT coalesce(l_quantity > 40, false)").count()
    assert dt.toDF().count() == want  # served from the catalog tail

    cat = CM.CATALOGS["filesystem"]
    assert CM.publish(dt.log, cat) == 2
    assert len(glob.glob(os.path.join(lp, "0*.json"))) == 2
    # published content == ratified staged content
    s1 = glob.glob(os.path.join(lp, CM.STAGED_DIR, "%020d.*.json" % 1))[0]
    assert open(os.path.join(lp, "%020d.json" % 1)).read() == open(s1).read()
    DeltaLog.clear_cache()
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == want


def test_published_beyond_latest_ratified_ignored(spark, tmp_table, sf_dir):
    """PROTOCOL.md:1271: files with versions greater than the latest
    ratified commit must be ignored — e.g. a non-conformant writer did
    a filesystem put-if-absent behind the catalog's back."""
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=FS_CONF)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 40")  # v1, ratified
    lp = _log_path(tmp_table)
    # rogue v2: a copy of v1's content published without ratification
    rogue = open(os.path.join(lp, "%020d.json" % 1)).read()
    with open(os.path.join(lp, "%020d.json" % 2), "w") as f:
        f.write(rogue)
    DeltaLog.clear_cache()
    dt2 = DeltaTable.forPath(spark, tmp_table)
    assert dt2.log.update().version == 1  # rogue v2 invisible
    assert dt2.history().count() == 2


def test_catalog_copy_authoritative_for_same_version(spark, tmp_table, sf_dir):
    """PROTOCOL.md:1269: when the catalog returns a ratified commit for
    version v, readers must use it even if a published <v>.json exists
    (the published copy here is corrupted/divergent)."""
    conf = {**FS_CONF, CM.AUTO_PUBLISH_PROP: "false"}
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=conf)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 40")  # v1 ratified, unpublished
    lp = _log_path(tmp_table)
    # divergent published v1: replays as a no-op commit
    with open(os.path.join(lp, "%020d.json" % 1), "w") as f:
        f.write(json.dumps({"commitInfo": {"timestamp": 1, "operation":
                                           "ROGUE", "txnId": "x"}}) + "\n")
    DeltaLog.clear_cache()
    dt2 = DeltaTable.forPath(spark, tmp_table)
    want = df.filter("NOT coalesce(l_quantity > 40, false)").count()
    assert dt2.toDF().count() == want  # delete applied ⇒ catalog copy won
    assert dt2.history().filter("operation = 'ROGUE'").count() == 0


def test_inline_commits(spark, tmp_table, sf_dir):
    """Inline commits (PROTOCOL.md:1295 option 2): the content is held
    by the catalog only — no staged file, nothing published — and
    reads still work."""
    conf = {CM.CATALOG_PROP: "in-memory", CM.AUTO_PUBLISH_PROP: "false",
            CM.INLINE_PROP: "true"}
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=conf)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 40")
    lp = _log_path(tmp_table)
    assert glob.glob(os.path.join(lp, "0*.json")) == []
    assert glob.glob(os.path.join(lp, CM.STAGED_DIR, "*.json")) == []
    want = df.filter("NOT coalesce(l_quantity > 40, false)").count()
    assert dt.toDF().count() == want
    # publishing inline commits materializes them as classic files
    assert CM.publish(dt.log, CM.CATALOGS["in-memory"]) == 2
    assert len(glob.glob(os.path.join(lp, "0*.json"))) == 2
    DeltaLog.clear_cache()
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == want


def test_concurrent_writers_linearized(spark, tmp_table, sf_dir):
    """Two writers racing on the same version: the catalog ratifies
    exactly one; the loser re-enters the retry path and lands on the
    next version."""
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=FS_CONF)
    d1 = DeltaTable.forPath(spark, tmp_table)
    snap_before = d1.log.update()  # both observe v0
    d1.delete("l_quantity > 40")   # wins v1
    # a second writer whose snapshot is stale retries through conflicts
    DeltaLog.clear_cache()
    d2 = DeltaTable.forPath(spark, tmp_table)
    d2.delete("l_quantity < 2")    # v2 after an absorbed retry or clean
    assert d2.log.update().version == 2
    want = df.filter("NOT coalesce(l_quantity > 40, false)") \
             .filter("NOT coalesce(l_quantity < 2, false)").count()
    assert d2.toDF().count() == want


def test_maintenance_requires_catalog_grant(spark, tmp_table, sf_dir):
    """PROTOCOL.md:1352: VACUUM / OPTIMIZE / REORG are refused unless
    the managing catalog permits them; checkpoints stay allowed."""
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=FS_CONF)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 40")
    with pytest.raises(PermissionError):
        dt.optimize().executeCompaction()
    with pytest.raises(PermissionError):
        dt.vacuum(retentionHours=0)
    with pytest.raises(PermissionError):
        dt.reorgPurge()
    # the grant lifts the gate
    dt.setProperties({CM.ALLOW_MAINTENANCE_PROP: "true"})
    dt.optimize().executeCompaction()
    dt.vacuum(retentionHours=0)
    want = df.filter("NOT coalesce(l_quantity > 40, false)").count()
    assert dt.toDF().count() == want


def test_fail_closed_without_catalog_state(spark, tmp_table, sf_dir):
    """A catalogManaged table whose managing catalog is unreachable
    (state wiped) must refuse reads — the filesystem alone is not a
    source of truth."""
    import shutil

    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=FS_CONF)
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == df.count()
    shutil.rmtree(os.path.join(_log_path(tmp_table), CM.STATE_DIR))
    DeltaLog.clear_cache()
    with pytest.raises(IOError, match="catalog-managed"):
        DeltaTable.forPath(spark, tmp_table).toDF()


def test_unratified_staged_file_invisible(spark, tmp_table, sf_dir):
    """A staged commit the catalog never ratified (writer crashed
    before ratification, or the catalog rejected it) must not become
    table state (PROTOCOL.md: 'not yet ratified' staged files are
    ignored)."""
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=FS_CONF)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 40")  # v1 ratified
    lp = _log_path(tmp_table)
    # rogue staged v2 (copy of v1's content under a fresh uuid name)
    rogue = open(glob.glob(os.path.join(
        lp, CM.STAGED_DIR, "%020d.*.json" % 1))[0]).read()
    with open(os.path.join(lp, CM.STAGED_DIR,
                           "%020d.deadbeef.json" % 2), "w") as f:
        f.write(rogue)
    DeltaLog.clear_cache()
    dt2 = DeltaTable.forPath(spark, tmp_table)
    assert dt2.log.update().version == 1  # staged-but-unratified ignored
    want = df.filter("NOT coalesce(l_quantity > 40, false)").count()
    assert dt2.toDF().count() == want


def test_streaming_reads_unpublished_tail(spark, tmp_table, sf_dir):
    """The streaming source reads through the log seam, so ratified but
    UNPUBLISHED commits stream too."""
    import tempfile

    from delta_spark.streaming import register

    conf = {**FS_CONF, CM.AUTO_PUBLISH_PROP: "false"}
    df = _li(spark, sf_dir, 100)
    write_delta(df, tmp_table, configuration=conf)
    write_delta(df.limit(40), tmp_table, mode="append")
    assert glob.glob(os.path.join(_log_path(tmp_table), "0*.json")) == []
    register(spark)
    out = tempfile.mkdtemp(prefix="cm_stream_out_")
    ckpt = tempfile.mkdtemp(prefix="cm_stream_ckpt_")
    q = (spark.readStream.format("delta_py").option("path", tmp_table)
         .load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 140


def test_coordinated_commits_mutually_exclusive(spark, tmp_table, sf_dir):
    """Exactly one party may own the commit protocol."""
    from delta_spark import coordinator as C

    df = _li(spark, sf_dir)
    with pytest.raises(ValueError, match="catalog-managed"):
        write_delta(df, tmp_table, configuration={
            **FS_CONF, C.COORDINATOR_PROP: "filesystem"})


REF_FIXTURE = ("/root/reference/kernel/kernel-defaults/src/test/resources/"
               "catalog-owned-preview")


@pytest.mark.skipif(not os.path.isdir(REF_FIXTURE),
                    reason="reference fixture absent")
def test_reference_catalog_owned_fixture_reads(spark):
    """REFERENCE-WRITTEN catalogManaged table (kernel
    CatalogManagedE2EReadSuite fixture): v0 published, v1/v2 ratified
    staged commits known only to the catalog. Registering them with the
    in-memory catalog (the kernel test does the same via withLogData)
    must yield the kernel suite's expectations: version 2, 200 rows of
    (x div 100, x), the catalogManaged+ICT protocol, and the snapshot
    timestamp from the dedicated inCommitTimestamp field
    (1749830881799)."""
    lp = os.path.join(REF_FIXTURE, "_delta_log")
    cat = CM.CATALOGS["in-memory"]
    latest, _ = cat.ratified(lp)
    if latest < 0:  # idempotent across reruns in one process
        cat.ratify(lp, 0, 1749830864000,
                   staged_path=os.path.join(lp, "%020d.json" % 0))
        for v in (1, 2):
            staged = glob.glob(os.path.join(
                lp, CM.STAGED_DIR, "%020d.*.json" % v))[0]
            cat.ratify(lp, v, 1749830871085 if v == 1 else 1749830881799,
                       staged_path=staged)
    DeltaLog.clear_cache()
    dt = DeltaTable.forPath(spark, REF_FIXTURE)
    snap = dt.log.update()
    assert snap.version == 2
    assert snap.timestamp == 1749830881799
    assert "catalogManaged" in (snap.protocol.readerFeatures or [])
    assert "catalogManaged" in (snap.protocol.writerFeatures or [])
    assert "inCommitTimestamp" in (snap.protocol.writerFeatures or [])
    got = {(r["part1"], r["col1"]) for r in dt.toDF().collect()}
    assert got == {(x // 100, x) for x in range(200)}


def test_ict_written_in_dedicated_field(spark, tmp_table, sf_dir):
    """Our ICT commits must carry commitInfo.inCommitTimestamp (the
    protocol's authoritative field) and history must surface it."""
    df = _li(spark, sf_dir, 50)
    write_delta(df, tmp_table, configuration={
        "delta.enableInCommitTimestamps": "true"})
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 40")
    for v in (0, 1):
        with open(os.path.join(_log_path(tmp_table),
                               "%020d.json" % v)) as f:
            ci = json.loads(f.readline())["commitInfo"]
        assert ci.get("inCommitTimestamp"), f"v{v} missing ICT field"
    rows = {r["version"]: r["timestamp"] for r in dt.history().collect()}
    snap = dt.log.update()
    assert int(rows[1].timestamp() * 1000) == snap.timestamp


def test_checkpoint_publishes_tail_first(spark, tmp_table, sf_dir):
    """A checkpoint may only cover published versions: the hook
    publishes the ratified tail before writing it."""
    conf = {**FS_CONF, CM.AUTO_PUBLISH_PROP: "false",
            "delta.checkpointInterval": "4"}
    df = _li(spark, sf_dir, 40)
    write_delta(df, tmp_table, configuration=conf)
    dt = DeltaTable.forPath(spark, tmp_table)
    for i in range(4):
        dt.update({"l_discount": "l_discount"}, f"l_quantity > {40 + i}")
    lp = _log_path(tmp_table)
    assert os.path.exists(os.path.join(lp, "%020d.checkpoint.parquet" % 4))
    # versions 0..4 were published by the hook before checkpointing
    assert len(glob.glob(os.path.join(lp, "0*.json"))) == 5
    DeltaLog.clear_cache()
    assert DeltaTable.forPath(spark, tmp_table).log.update().version == 4


def test_unset_catalog_prop_refused(spark, tmp_table, sf_dir):
    """Commit ownership is decided pre-commit: dropping (or changing)
    the managing-catalog property via plain TBLPROPERTIES commits is
    refused — it would land via filesystem put-if-absent while the
    catalog's ratification ceiling stays behind, forking the log."""
    write_delta(_li(spark, sf_dir), tmp_table, configuration=FS_CONF)
    dt = DeltaTable.forPath(spark, tmp_table)
    with pytest.raises(ValueError, match="managing catalog"):
        dt.unsetProperties([CM.CATALOG_PROP])
    with pytest.raises(ValueError, match="managing catalog"):
        dt.setProperties({CM.CATALOG_PROP: "in-memory"})
    # the table still works through the catalog
    dt.delete("l_quantity > 45")
    assert dt.history().count() == 2


def test_drop_feature_handover(spark, tmp_table, sf_dir):
    """DROP FEATURE catalogManaged = the sanctioned handover: the
    property-removal commit is ratified by the catalog itself, the
    ratified tail is fully published, catalog state is released, and
    the table continues as a plain filesystem table."""
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table, configuration=FS_CONF)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 45")
    dt.dropFeature("catalogManaged", truncate_history=True)
    snap = dt.log.update()
    assert CM.CATALOG_PROP not in snap.configuration
    assert "catalogManaged" not in (snap.protocol.readerFeatures or [])
    # catalog released: no ceiling caps future fs commits
    cat = CM.CATALOGS["filesystem"]
    latest, ratified = cat.ratified(_log_path(tmp_table))
    assert latest < 0 and not ratified
    # plain filesystem DML works and is visible
    dt2 = DeltaTable.forPath(spark, tmp_table)
    dt2.update({"l_discount": "CAST(0 AS DOUBLE)"}, "l_quantity < 5")
    want = df.filter("NOT coalesce(l_quantity > 45, false)").count()
    assert dt2.toDF().count() == want


def test_publish_divergence_detected(spark, tmp_table, sf_dir):
    """publish() must verify an existing <v>.json against the ratified
    content — an orphaned divergent file is a forked log, not a
    benign already-published skip."""
    conf = {**FS_CONF, CM.AUTO_PUBLISH_PROP: "false"}
    write_delta(_li(spark, sf_dir), tmp_table, configuration=conf)
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 45")  # ratified, unpublished
    v1 = os.path.join(_log_path(tmp_table), "%020d.json" % 1)
    assert not os.path.exists(v1)
    with open(v1, "w") as f:
        f.write('{"commitInfo": {"operation": "FORGED"}}\n')
    cat = CM.CATALOGS["filesystem"]
    with pytest.raises(RuntimeError, match="divergence"):
        CM.publish(dt.log, cat)


def test_enable_on_existing_table_adopts(spark, tmp_table, sf_dir):
    """Enabling catalogManaged on an EXISTING filesystem table: the
    upgrade commit is ratified by the catalog, which ADOPTS the table
    at that version (no state → first ratification may land at any
    version); history stays readable and subsequent DML routes through
    the catalog."""
    df = _li(spark, sf_dir)
    write_delta(df, tmp_table)                       # v0, plain fs
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 45")                     # v1, plain fs
    dt.setProperties(FS_CONF)                        # v2, upgrade commit
    snap = dt.log.update()
    assert "catalogManaged" in (snap.protocol.readerFeatures or [])
    cat = CM.CATALOGS["filesystem"]
    latest, _ = cat.ratified(_log_path(tmp_table))
    assert latest == 2
    # post-upgrade DML is catalog-ratified, pre-upgrade history intact
    dt.update({"l_discount": "CAST(0 AS DOUBLE)"}, "l_quantity < 5")
    latest, _ = cat.ratified(_log_path(tmp_table))
    assert latest == 3
    assert dt.asOfVersion(0).count() == df.count()
    want = df.filter("NOT coalesce(l_quantity > 45, false)").count()
    assert dt.toDF().count() == want


def test_publish_skips_cleaned_staged_file_for_published_version(
        spark, tmp_table, sf_dir):
    """A ratified version whose staged payload was cleaned up but whose
    <v>.json is already in _delta_log must not stall publish(): the
    loop treats it as published and keeps advancing (ADVICE r5:
    publish() previously broke at the first unreadable staged file even
    for published versions, pinning mark_published below them). The
    retained-record state arises when a prior mark_published failed
    mid-way and publishing retries."""
    import shutil

    conf = {**FS_CONF, CM.AUTO_PUBLISH_PROP: "false"}
    write_delta(_li(spark, sf_dir), tmp_table, configuration=conf)   # v0
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 45")                                     # v1
    dt.update({"l_discount": "CAST(0 AS DOUBLE)"}, "l_quantity < 5")  # v2
    cat = CM.CATALOGS["filesystem"]
    lp = _log_path(tmp_table)
    _, commits = cat.ratified(lp)
    # hand-publish v0 and v1 (as a crashed publisher would have),
    # then clean up v1's staged payload while the catalog still
    # retains all three ratified records
    for v in (0, 1):
        tgt = os.path.join(lp, "%020d.json" % v)
        if not os.path.exists(tgt):
            shutil.copyfile(commits[v].file_path, tgt)
    os.remove(commits[1].file_path)
    v2 = os.path.join(lp, "%020d.json" % 2)
    assert not os.path.exists(v2)
    # publish must skip past the cleaned v1 and still write v2
    wrote = CM.publish(dt.log, cat)
    assert wrote == 1 and os.path.exists(v2)
    # and an UNPUBLISHED version with an unreadable payload still stops
    dt.delete("l_quantity < 2")                                      # v3
    _, commits = cat.ratified(lp)
    v3 = os.path.join(lp, "%020d.json" % 3)
    if os.path.exists(v3):
        os.remove(v3)
    os.remove(commits[3].file_path)
    assert CM.publish(dt.log, cat) == 0
    assert not os.path.exists(v3)


_MP_CATALOG_WORKER = r"""
import sys
table, wid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
sys.path.insert(0, {repo!r})
from delta_spark.actions import AddFile
from delta_spark.catalog_managed import CatalogCommitConflict
from delta_spark.log import DeltaLog
from delta_spark.transaction import DeltaConcurrentException, OptimisticTransaction
landed = []
for k in range(n):
    while True:
        DeltaLog.clear_cache()
        log = DeltaLog.for_table(table)
        txn = OptimisticTransaction(log)
        try:
            v = txn.commit([AddFile(path=f"w{{wid}}_{{k}}.parquet", size=1,
                                    modificationTime=1)], "WRITE")
            landed.append(v)
            break
        except (DeltaConcurrentException, CatalogCommitConflict):
            continue
print(",".join(map(str, landed)))
"""


def test_multiprocess_writers_race_filesystem_catalog(spark, tmp_path, sf_dir):
    """Four OS processes hammer a catalog-managed (filesystem catalog)
    table: ratification is the only commit authority, every commit
    lands exactly once on a contiguous version range, and READS DURING
    THE RACE never run ahead of the catalog's ratified ceiling — the
    cross-process leg of the in-process linearization test."""
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    table = str(tmp_path / "tbl")
    write_delta(_li(spark, sf_dir, 20), table, configuration=FS_CONF)

    n_workers, n_commits = 4, 5
    script = _MP_CATALOG_WORKER.format(repo=repo)
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, table, str(w), str(n_commits)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for w in range(n_workers)]

    # ratified-ceiling reads DURING the race: the snapshot must never
    # be newer than what the catalog has ratified at probe time
    cat = CM.CATALOGS["filesystem"]
    lp = _log_path(table)
    probes = 0
    while any(p.poll() is None for p in procs):
        DeltaLog.clear_cache()
        snap = DeltaLog.for_table(table).update()
        ceiling = cat.latest(lp)
        assert snap.version <= ceiling, (
            f"read v{snap.version} beyond ratified ceiling {ceiling}")
        # the snapshot's synthetic files all come from ratified commits
        assert len([f for f in snap.all_files
                    if f.path.startswith("w")]) <= snap.version
        probes += 1
        time.sleep(0.05)
    assert probes > 0

    landed: list[int] = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        landed.extend(int(x) for x in out.strip().split(","))
    assert len(landed) == n_workers * n_commits
    assert sorted(landed) == list(range(1, n_workers * n_commits + 1))
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(table).update()
    paths = {f.path for f in snap.all_files}
    for w in range(n_workers):
        for k in range(n_commits):
            assert f"w{w}_{k}.parquet" in paths
    # the catalog's watermark survived the whole race
    assert cat.latest(lp) == n_workers * n_commits


def test_ratify_refuses_gc_resurrected_slot(tmp_path):
    """TOCTOU fork found by the r10 full-suite race: a writer whose
    latest() read predates the winner's ratify can land its
    put-if-absent on the record slot mark_published just reclaimed,
    ratifying a SECOND v with different content. The post-write ghost
    check (published <v>.json with different content) must withdraw
    it; idempotent re-ratification of identical content (crash-window
    adoption) stays allowed."""
    log_path = str(tmp_path / "_delta_log")
    os.makedirs(log_path)
    cat = CM.FileSystemCatalog()

    # winner: ratify v0, publish it, GC the record
    cat.ratify(log_path, 0, 111, inline='{"commitInfo":{"txnId":"win"}}')
    with open(os.path.join(log_path, "%020d.json" % 0), "w") as f:
        f.write('{"commitInfo":{"txnId":"win"}}')
    cat.mark_published(log_path, 0)
    assert cat.ratified(log_path)[1] == {}          # record reclaimed
    assert cat.latest(log_path) == 0                # watermark holds

    # loser with a stale view: force the pre-check past (the race makes
    # latest() read -1 before the winner's record/watermark writes)
    cat.latest = lambda p: -1
    with pytest.raises(CM.CatalogCommitConflict, match="re-ratify"):
        cat.ratify(log_path, 0, 222,
                   inline='{"commitInfo":{"txnId":"lose"}}')
    del cat.latest
    # the ghost record was withdrawn — no fork, v0 content intact
    assert cat.ratified(log_path)[1] == {}
    with open(os.path.join(log_path, "%020d.json" % 0)) as f:
        assert "win" in f.read()

    # identical content re-ratification (adoption) is idempotent-safe
    cat.latest = lambda p: -1
    rc = cat.ratify(log_path, 0, 333,
                    inline='{"commitInfo":{"txnId":"win"}}')
    del cat.latest
    assert rc.version == 0
    assert 0 in cat.ratified(log_path)[1]


def test_publish_transient_ghost_vs_genuine_fork(tmp_path):
    """publish() tolerates the transient window where a ghost record is
    visible before its writer withdraws it (record gone on re-read),
    but still refuses a genuinely forked log (record persists with
    different content)."""
    table = str(tmp_path / "tbl")
    log_path = os.path.join(table, "_delta_log")
    os.makedirs(log_path)
    cat = CM.FileSystemCatalog()
    log = DeltaLog.for_table(table)

    # published v0 with winner content, catalog record diverges.
    # (ratify() itself now refuses to create this fork — its ghost
    # guard — so plant the record directly, as a pre-fix writer or a
    # corrupted catalog would have left it.)
    with open(os.path.join(log_path, "%020d.json" % 0), "w") as f:
        f.write('{"commitInfo":{"txnId":"win"}}')
    os.makedirs(cat._dir(log_path), exist_ok=True)
    with open(os.path.join(cat._dir(log_path), "%020d.json" % 0), "w") as f:
        json.dump({"timestamp": 111,
                   "inline": '{"commitInfo":{"txnId":"fork"}}'}, f)

    with pytest.raises(RuntimeError, match="divergence"):
        CM.publish(log, cat)

    # same state but the record vanishes on re-read (withdrawn ghost):
    # wrap ratified() so the SECOND call (the re-check) sees no record
    calls = {"n": 0}
    real = cat.ratified

    def flaky(lp):
        calls["n"] += 1
        latest, commits = real(lp)
        if calls["n"] > 1:
            commits = {}
        return latest, commits

    cat.ratified = flaky
    assert CM.publish(log, cat) == 0   # tolerated, nothing written
    DeltaLog.clear_cache()
