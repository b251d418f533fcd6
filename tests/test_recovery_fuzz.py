"""Crash-recovery / torn-write fuzzing of the commit + checkpoint path
(reference Checkpoints.scala:267-408 recovery rules +
SnapshotManagementSuite): every injected post-crash state must either
read correctly at the last durable version or fail with a named error —
never a silent wrong answer.

Faults are injected deterministically as the on-disk states a killed
writer leaves behind: orphaned .tmp files, partial multi-part
checkpoint sets, corrupt/stale `_last_checkpoint`, torn checkpoint
parquet bytes, missing `.crc` checksums.
"""

import glob
import json
import os
import random

import pytest
from pyspark.sql import functions as F

from delta_spark import DeltaLog, DeltaTable, write_delta
from delta_spark.datasets import load_table


def _mk(spark, sf_dir, path, commits=4, configuration=None):
    li = load_table(spark, sf_dir, "lineitem").limit(40)
    write_delta(li, path, configuration=configuration)
    for _ in range(commits - 1):
        write_delta(li, path, mode="append")
    return DeltaLog.for_table(path)


def _logdir(path):
    return os.path.join(path, "_delta_log")


def _reread(path):
    """Fresh replay, bypassing the process-wide snapshot cache."""
    DeltaLog.clear_cache()
    return DeltaLog.for_table(path).update()


def test_orphaned_tmp_files_are_ignored(spark, tmp_table, sf_dir):
    """A writer killed between tmp-write and rename leaves .tmp litter;
    listings, replay, the next commit and the next checkpoint must all
    ignore it."""
    log = _mk(spark, sf_dir, tmp_table)
    v = log.update().version
    ld = _logdir(tmp_table)
    for junk in [".tmp_commit_zzz", "%020d.json.tmp" % (v + 1),
                 "%020d.checkpoint.parquet.tmp" % v,
                 "_last_checkpoint.tmp"]:
        with open(os.path.join(ld, junk), "w") as f:
            f.write("torn" * 10)
    snap = _reread(tmp_table)
    assert snap.version == v
    assert snap.num_files == 4
    dt = DeltaTable.forPath(spark, tmp_table)
    assert dt.toDF().count() == 160
    dt.delete("l_quantity > 30")        # next commit lands at v+1
    log2 = DeltaLog.for_table(tmp_table)
    assert log2.update().version == v + 1
    log2.write_checkpoint()             # checkpoint still writes cleanly
    assert _reread(tmp_table).version == v + 1


def test_partial_multipart_checkpoint_is_unusable_not_fatal(
        spark, tmp_table, sf_dir):
    """Kill mid-multi-part-checkpoint: only SOME parts exist. The
    incomplete set must be invisible to checkpoint listing and replay
    must reconstruct the same state from commits alone."""
    log = _mk(spark, sf_dir, tmp_table,
              configuration={"delta.checkpoint.partSize": "2"})
    log.write_checkpoint()
    v = log.update().version
    parts = sorted(glob.glob(os.path.join(
        _logdir(tmp_table), "*.checkpoint.??????????.??????????.parquet")))
    assert len(parts) >= 2, "fixture must produce a multi-part checkpoint"
    os.remove(parts[0])                  # torn: first part missing
    DeltaLog.clear_cache()
    log2 = DeltaLog.for_table(tmp_table)
    assert log2.list_checkpoint_versions() == []
    snap = log2.update()
    assert snap.version == v and snap.num_files == 4
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 160


def test_partial_multipart_with_older_complete_checkpoint(
        spark, tmp_table, sf_dir):
    """A torn multi-part set must fall back to the previous COMPLETE
    checkpoint, not to nothing."""
    log = _mk(spark, sf_dir, tmp_table, commits=2)
    log.write_checkpoint()               # complete single-file ckpt @1
    li = load_table(spark, sf_dir, "lineitem").limit(40)
    write_delta(li, tmp_table, mode="append")   # v2
    log = DeltaLog.for_table(tmp_table)
    snap = log.update()
    # hand-write a torn multi-part set at v2: part 1 of 2 only
    torn = log.checkpoint_part_file(snap.version, 1, 2)
    with open(torn, "wb") as f:
        f.write(b"PAR1 torn not parquet")
    DeltaLog.clear_cache()
    log2 = DeltaLog.for_table(tmp_table)
    assert log2.list_checkpoint_versions() == [1]
    got = log2.update()
    assert got.version == 2 and got.num_files == 3


def test_last_checkpoint_pointing_at_missing_checkpoint(
        spark, tmp_table, sf_dir):
    """`_last_checkpoint` referencing a checkpoint that does not exist
    (crashed before the parts landed, or cleaned by hand) must not
    brick reads: replay recovers from the real listing."""
    log = _mk(spark, sf_dir, tmp_table)
    v = log.update().version
    with open(os.path.join(_logdir(tmp_table), "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": v + 7, "size": 999999}))
    snap = _reread(tmp_table)
    assert snap.version == v and snap.num_files == 4
    # the size hint is still served (it is only a planning estimate)
    assert DeltaLog.for_table(tmp_table).checkpointed_action_count() == 999999


def test_last_checkpoint_corrupt_json(spark, tmp_table, sf_dir):
    """A torn `_last_checkpoint` (truncated JSON) is ignored."""
    log = _mk(spark, sf_dir, tmp_table)
    log.write_checkpoint()
    v = log.update().version
    lc = os.path.join(_logdir(tmp_table), "_last_checkpoint")
    with open(lc, "w") as f:
        f.write('{"version": 3, "si')          # torn mid-write
    assert DeltaLog.for_table(tmp_table).checkpointed_action_count() is None
    snap = _reread(tmp_table)
    assert snap.version == v and snap.num_files == 4
    # the next checkpoint rewrites the pointer atomically
    log2 = DeltaLog.for_table(tmp_table)
    log2.write_checkpoint()
    assert log2.checkpointed_action_count() is not None


def test_corrupt_checkpoint_parquet_falls_back(spark, tmp_table, sf_dir):
    """A checkpoint whose parquet bytes are torn (non-atomic external
    writer) must not poison replay while an older checkpoint or the
    commit chain can rebuild the same state
    (SnapshotManagement equivalent-log-segment recovery)."""
    log = _mk(spark, sf_dir, tmp_table, commits=2)
    log.write_checkpoint()                        # good ckpt @1
    li = load_table(spark, sf_dir, "lineitem").limit(40)
    write_delta(li, tmp_table, mode="append")     # v2
    log = DeltaLog.for_table(tmp_table)
    log.write_checkpoint()                        # ckpt @2 — now corrupt it
    ck2 = log.checkpoint_file(log.update().version)
    with open(ck2, "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")
    got = _reread(tmp_table)
    assert got.version == 2 and got.num_files == 3
    assert DeltaTable.forPath(spark, tmp_table).toDF().count() == 120

    # corrupt the older checkpoint too: pure commit replay still wins
    ck1 = log.checkpoint_file(1)
    with open(ck1, "wb") as f:
        f.write(b"also torn")
    got = _reread(tmp_table)
    assert got.version == 2 and got.num_files == 3


def test_corrupt_checkpoint_with_cleaned_commits_fails_named(
        spark, tmp_table, sf_dir):
    """When the checkpoint is corrupt AND the commits it covered were
    cleaned up, reconstruction is impossible — the failure must be the
    named reconstruction error, not a wrong answer."""
    log = _mk(spark, sf_dir, tmp_table, commits=3)
    log.write_checkpoint()
    v = log.update().version
    # simulate aggressive log cleanup: only the checkpoint covers 0..v
    for j in glob.glob(os.path.join(_logdir(tmp_table), "*.json")):
        os.remove(j)
    ck = log.checkpoint_file(v)
    with open(ck, "wb") as f:
        f.write(b"torn beyond recovery")
    DeltaLog.clear_cache()
    with pytest.raises(ValueError, match="cannot reconstruct|could not be recovered"):
        DeltaLog.for_table(tmp_table).update()


def test_missing_crc_is_recomputed(spark, tmp_table, sf_dir):
    """Commit present, checksum absent (crash between json rename and
    crc write): reads work and the NEXT commit regenerates a correct
    checksum from replayed state instead of chaining off the gap."""
    log = _mk(spark, sf_dir, tmp_table)
    v = log.update().version
    crc = os.path.join(_logdir(tmp_table), "%020d.crc" % v)
    assert os.path.exists(crc)
    os.remove(crc)
    snap = _reread(tmp_table)
    assert snap.version == v
    dt = DeltaTable.forPath(spark, tmp_table)
    dt.delete("l_quantity > 30")
    new_crc = os.path.join(_logdir(tmp_table), "%020d.crc" % (v + 1))
    with open(new_crc) as f:
        got = json.load(f)
    live = DeltaLog.for_table(tmp_table).update()
    assert got["numFiles"] == live.num_files
    assert got["tableSizeBytes"] == live.size_in_bytes


def test_randomized_fault_schedules(spark, tmp_table, sf_dir):
    """Fuzz: random sequences of benign faults (tmp litter, stale or
    torn _last_checkpoint, deleted crc, torn newest checkpoint with
    commits intact, partial multi-part sets) — after EVERY schedule the
    table reads back its exact pre-fault row count and version."""
    rng = random.Random(1234)
    li = load_table(spark, sf_dir, "lineitem").limit(25)

    def fault_tmp(log, ld, v):
        with open(os.path.join(ld, ".tmp_commit_%d" % rng.randrange(10**6)), "w") as f:
            f.write("x")

    def fault_stale_lc(log, ld, v):
        with open(os.path.join(ld, "_last_checkpoint"), "w") as f:
            f.write(json.dumps({"version": v + rng.randrange(1, 5), "size": 1}))

    def fault_torn_lc(log, ld, v):
        with open(os.path.join(ld, "_last_checkpoint"), "w") as f:
            f.write('{"ver')

    def fault_del_crc(log, ld, v):
        for c in glob.glob(os.path.join(ld, "*.crc")):
            if rng.random() < 0.5:
                os.remove(c)

    def fault_torn_ckpt(log, ld, v):
        log.write_checkpoint()
        with open(log.checkpoint_file(v), "wb") as f:
            f.write(b"torn" * rng.randrange(1, 9))

    def fault_partial_multipart(log, ld, v):
        with open(log.checkpoint_part_file(v, 1, 3), "wb") as f:
            f.write(b"part torn")

    faults = [fault_tmp, fault_stale_lc, fault_torn_lc, fault_del_crc,
              fault_torn_ckpt, fault_partial_multipart]

    for trial in range(6):
        path = tmp_table + "_fz%d" % trial
        write_delta(li, path)
        n_commits = rng.randrange(2, 5)
        for _ in range(n_commits - 1):
            write_delta(li, path, mode="append")
        DeltaLog.clear_cache()
        log = DeltaLog.for_table(path)
        v = log.update().version
        want = 25 * n_commits
        for f_ in rng.sample(faults, rng.randrange(1, len(faults) + 1)):
            f_(log, _logdir(path), v)
        DeltaLog.clear_cache()
        got = DeltaLog.for_table(path).update()
        assert got.version == v, f"trial {trial}: version {got.version} != {v}"
        cnt = DeltaTable.forPath(spark, path).toDF().count()
        assert cnt == want, f"trial {trial}: rows {cnt} != {want}"
        # and the table stays WRITABLE after recovery
        write_delta(li.limit(5), path, mode="append")
        assert DeltaTable.forPath(spark, path).toDF().count() == want + 5


# ---------------------------------------------------------------------------
# coordinated-commit / catalog-managed crash-window fuzz (VERDICT r9 #4)
# ---------------------------------------------------------------------------
# A writer can die at any point of the stage -> register -> backfill
# pipeline (coordinator.py) or the stage -> ratify -> publish pipeline
# (catalog_managed.py). Every window must recover to a state
# EQUIVALENT TO SERIAL REPLAY of the successfully-registered commits:
#   - death BEFORE the linearization point (register/ratify): the
#     commit never happened; the version is reusable by the next writer
#   - death AFTER it: the commit is durable table state, visible to a
#     fresh reader immediately and backfilled/published by whoever
#     comes next — NEVER dropped when the watermark advances.
# The third window (after backfill write, before the watermark call)
# must converge identically. This fuzz found a real r10 bug: the
# bs=1 path advanced the backfill watermark with register_backfill
# (dropping a dead predecessor's marker-only commit); fixed by routing
# through backfill_to, which never advances past a hole.

class _KilledWriter(Exception):
    """Simulated process death inside a commit pipeline."""


def _install_crash(window, victim_version, coordinator):
    """Arm ONE crash for `victim_version` at the given window; returns
    an undo closure. Death is injected at the exact seams the real
    pipeline calls, so everything before the window runs the
    production code path."""
    from delta_spark.log import LocalLogStore

    undo = []

    def _arm(obj, name):
        orig = getattr(obj, name)
        undo.append(lambda: setattr(obj, name, orig))
        return orig

    if window == "before_register":
        orig = _arm(type(coordinator), "commit")

        def die(self, *a, **k):
            raise _KilledWriter("died between stage and register")
        setattr(type(coordinator), "commit", die)
    elif window == "before_backfill":
        orig = _arm(LocalLogStore, "write_atomic")

        def die(self, p, payload):
            if (os.path.basename(p) == "%020d.json" % victim_version
                    and os.path.basename(os.path.dirname(p)) == "_delta_log"):
                raise _KilledWriter("died between register and backfill")
            return orig(self, p, payload)
        LocalLogStore.write_atomic = die
    elif window == "before_watermark":
        orig = _arm(type(coordinator), "register_backfill")

        def die(self, *a, **k):
            raise _KilledWriter("died between backfill and watermark")
        setattr(type(coordinator), "register_backfill", die)
    else:
        raise AssertionError(window)

    def _undo():
        for u in undo:
            u()
    return _undo


@pytest.mark.parametrize("coord_name", ["in-memory", "filesystem", "external"])
def test_coordinated_commit_crash_windows(spark, tmp_table, tmp_path,
                                          coord_name, sf_dir):
    from delta_spark import coordinator as C

    rng = random.Random(777)
    df = load_table(spark, sf_dir, "lineitem").limit(25)
    windows = ["before_register", "before_backfill", "before_watermark"]
    for trial, window in enumerate(windows):
        path = f"{tmp_table}_{coord_name.replace('-', '')}_{window}"
        conf = {C.COORDINATOR_PROP: coord_name}
        if coord_name == "external":
            ext = str(tmp_path / f"ext_{trial}")
            conf[C.COORDINATOR_CONF_PROP] = json.dumps({"externalRoot": ext})
        write_delta(df, path, configuration=conf)            # v0
        pre_commits = rng.randrange(1, 3)
        for _ in range(pre_commits):
            write_delta(df, path, mode="append")
        DeltaLog.clear_cache()
        log = DeltaLog.for_table(path)
        victim = log.update().version + 1
        coordinator = C.coordinator_for(
            {**conf, **log.update().configuration})
        assert coordinator is not None

        undo = _install_crash(window, victim, coordinator)
        try:
            with pytest.raises(_KilledWriter):
                write_delta(df, path, mode="append")         # dies mid-commit
        finally:
            undo()

        # --- recovery read: a FRESH process replays to serial state --
        committed = window != "before_register"   # registered => durable
        want_version = victim if committed else victim - 1
        want_rows = 25 * (1 + pre_commits + (1 if committed else 0))
        DeltaLog.clear_cache()
        got = DeltaLog.for_table(path).update()
        assert got.version == want_version, (coord_name, window)
        assert DeltaTable.forPath(spark, path).toDF().count() == want_rows

        # --- a new writer commits; nothing is lost, holes are filled -
        write_delta(df, path, mode="append")
        DeltaLog.clear_cache()
        log2 = DeltaLog.for_table(path)
        got2 = log2.update()
        assert got2.version == want_version + 1
        assert DeltaTable.forPath(spark, path).toDF().count() == want_rows + 25
        # convergence: the full chain is now backfilled classic files
        ld = _logdir(path)
        classic = sorted(int(n.split(".")[0]) for n in os.listdir(ld)
                         if n.endswith(".json") and n[0].isdigit())
        assert classic == list(range(want_version + 2)), (coord_name, window)
        # and checkpointing (which requires a backfilled prefix) works
        log2.write_checkpoint()
        DeltaLog.clear_cache()
        assert DeltaLog.for_table(path).update().version == want_version + 1


@pytest.mark.parametrize("window", ["before_ratify", "before_publish"])
def test_catalog_managed_crash_windows(spark, tmp_table, window, sf_dir):
    from delta_spark import catalog_managed as CM

    df = load_table(spark, sf_dir, "lineitem").limit(25)
    path = f"{tmp_table}_cat_{window}"
    conf = {CM.CATALOG_PROP: "filesystem"}
    write_delta(df, path, configuration=conf)                # v0
    write_delta(df, path, mode="append")                     # v1
    DeltaLog.clear_cache()
    catalog = CM.CATALOGS["filesystem"]

    saved = None
    if window == "before_ratify":
        saved = type(catalog).ratify

        def die(self, *a, **k):
            raise _KilledWriter("died between stage and ratify")
        type(catalog).ratify = die
    else:
        saved = CM.publish
        import delta_spark.catalog_managed as _cm_mod

        def die(*a, **k):
            raise _KilledWriter("died between ratify and publish")
        _cm_mod.publish = die
    try:
        with pytest.raises(_KilledWriter):
            write_delta(df, path, mode="append")             # v2 dies
    finally:
        if window == "before_ratify":
            type(catalog).ratify = saved
        else:
            import delta_spark.catalog_managed as _cm_mod
            _cm_mod.publish = saved

    committed = window == "before_publish"   # ratified => durable
    want_version = 2 if committed else 1
    want_rows = 25 * (want_version + 1)
    DeltaLog.clear_cache()
    assert DeltaLog.for_table(path).update().version == want_version
    assert DeltaTable.forPath(spark, path).toDF().count() == want_rows

    write_delta(df, path, mode="append")
    DeltaLog.clear_cache()
    assert DeltaLog.for_table(path).update().version == want_version + 1
    assert DeltaTable.forPath(spark, path).toDF().count() == want_rows + 25
    # publish converged: the full chain exists as published files
    ld = _logdir(path)
    classic = sorted(int(n.split(".")[0]) for n in os.listdir(ld)
                     if n.endswith(".json") and n[0].isdigit())
    assert classic == list(range(want_version + 2))


def test_batch_backfill_crash_mid_batch(spark, tmp_table, sf_dir):
    """batchSize > 1: commits accumulate with the coordinator and every
    batchSize-th commit backfills the whole tail. A writer dying MID
    batch-backfill (some classic files written, some not) must leave
    the watermark BEHIND the hole — the next reader sees every commit
    (tail merge) and the next backfill completes the chain."""
    from delta_spark import coordinator as C
    from delta_spark.log import LocalLogStore

    df = load_table(spark, sf_dir, "lineitem").limit(25)
    path = tmp_table + "_batch"
    conf = {C.COORDINATOR_PROP: "filesystem",
            C.BATCH_SIZE_PROP: "3"}
    write_delta(df, path, configuration=conf)            # v0 (backfilled)
    write_delta(df, path, mode="append")                 # v1 -> tail
    write_delta(df, path, mode="append")                 # v2 -> tail

    # v3 triggers the batch backfill (3 % 3 == 0); die while writing
    # v2's classic file — v1 gets backfilled, v2/v3 do not
    real_write = LocalLogStore.write_atomic

    def dying(self, p, payload):
        if (os.path.basename(p) == "%020d.json" % 2
                and os.path.basename(os.path.dirname(p)) == "_delta_log"):
            raise _KilledWriter("died mid batch backfill")
        return real_write(self, p, payload)

    LocalLogStore.write_atomic = dying
    try:
        with pytest.raises(_KilledWriter):
            write_delta(df, path, mode="append")         # v3
    finally:
        LocalLogStore.write_atomic = real_write

    # the commit REGISTRATION of v3 happened before its batch backfill
    # died, so all 4 commits are table state
    DeltaLog.clear_cache()
    got = DeltaLog.for_table(path).update()
    assert got.version == 3
    assert DeltaTable.forPath(spark, path).toDF().count() == 100
    # markers for the unbackfilled suffix must still exist (watermark
    # did not advance past the hole at v2)
    markers = sorted(int(n.split(".")[0]) for n in os.listdir(
        os.path.join(_logdir(path), "_commits")) if n.endswith(".json"))
    assert 2 in markers and 3 in markers

    # recovery: more commits, then the next batch trigger (v6) fills
    # every hole and drains the markers
    write_delta(df, path, mode="append")                 # v4
    write_delta(df, path, mode="append")                 # v5
    write_delta(df, path, mode="append")                 # v6 -> backfill
    DeltaLog.clear_cache()
    assert DeltaLog.for_table(path).update().version == 6
    assert DeltaTable.forPath(spark, path).toDF().count() == 175
    classic = sorted(int(n.split(".")[0]) for n in os.listdir(_logdir(path))
                     if n.endswith(".json") and n[0].isdigit())
    assert classic == list(range(7))
    assert os.listdir(os.path.join(_logdir(path), "_commits")) == []


def test_inline_catalog_crash_between_ratify_and_publish(
        spark, tmp_table, sf_dir):
    """Inline catalog commits (content held BY the catalog, no staged
    file): a ratified-but-unpublished inline commit must be readable
    from the catalog's copy and publishable by a later writer."""
    from delta_spark import catalog_managed as CM

    df = load_table(spark, sf_dir, "lineitem").limit(25)
    path = tmp_table + "_inline"
    conf = {CM.CATALOG_PROP: "in-memory", CM.INLINE_PROP: "true"}
    write_delta(df, path, configuration=conf)            # v0
    import delta_spark.catalog_managed as _cm_mod
    saved = _cm_mod.publish

    def die(*a, **k):
        raise _KilledWriter("died between ratify and publish")
    _cm_mod.publish = die
    try:
        with pytest.raises(_KilledWriter):
            write_delta(df, path, mode="append")         # v1 inline
    finally:
        _cm_mod.publish = saved

    DeltaLog.clear_cache()
    got = DeltaLog.for_table(path).update()
    assert got.version == 1                              # catalog copy wins
    assert DeltaTable.forPath(spark, path).toDF().count() == 50
    write_delta(df, path, mode="append")                 # v2 publishes tail
    DeltaLog.clear_cache()
    assert DeltaLog.for_table(path).update().version == 2
    assert DeltaTable.forPath(spark, path).toDF().count() == 75
