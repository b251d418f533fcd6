"""Model-based randomized DML: a seeded random sequence of
append / DELETE / UPDATE / MERGE ops runs against both the engine and
a pure-Python reference model; after every commit the model snapshot
is recorded, and at the end the live table AND sampled time-travel
versions must match the model exactly. Run across plain, partitioned,
and deletion-vector table configurations — the three physically
different DML paths (rewrite, partition-drop, DV mask)."""

import random

import pytest
from pyspark.sql import Row

from delta_spark.io import write_delta
from delta_spark.table import DeltaTable

CATS = ["a", "b", "c"]


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v, cat=c) for k, v, c in rows],
        "k int, v int, cat string")


def _run_scenario(spark, path, seed, partitioned, dv):
    rng = random.Random(seed)
    conf = {"delta.enableDeletionVectors": "true"} if dv else {}
    next_key = 0

    def fresh_keys(n):
        nonlocal next_key
        ks = list(range(next_key, next_key + n))
        next_key += n
        return ks

    # version 0: initial append
    model = {}  # k -> (v, cat)
    rows = [(k, rng.randrange(100), rng.choice(CATS))
            for k in fresh_keys(8)]
    model.update({k: (v, c) for k, v, c in rows})
    write_delta(_df(spark, rows), path,
                partition_by=["cat"] if partitioned else None,
                configuration=conf)
    dt = DeltaTable.forPath(spark, path)
    history = [dict(model)]

    for _ in range(8):
        op = rng.choice(["append", "delete", "update", "merge"])
        if op == "append":
            rows = [(k, rng.randrange(100), rng.choice(CATS))
                    for k in fresh_keys(rng.randrange(1, 5))]
            model.update({k: (v, c) for k, v, c in rows})
            write_delta(_df(spark, rows), path, mode="append")
        elif op == "delete":
            m, r = rng.randrange(2, 5), rng.randrange(0, 2)
            dt.delete(f"v % {m} = {r}")
            model = {k: (v, c) for k, (v, c) in model.items()
                     if not (v % m == r)}
        elif op == "update":
            cat = rng.choice(CATS)
            add = rng.randrange(1, 20)
            dt.update({"v": f"v + {add}"}, f"cat = '{cat}'")
            model = {k: (v + add if c == cat else v, c)
                     for k, (v, c) in model.items()}
        else:  # merge: update half the existing keys, insert new ones
            existing = sorted(model)
            upd = rng.sample(existing, min(3, len(existing)))
            ins = fresh_keys(rng.randrange(1, 3))
            src_rows = ([(k, rng.randrange(100, 200), rng.choice(CATS))
                         for k in upd]
                        + [(k, rng.randrange(200, 300), rng.choice(CATS))
                           for k in ins])
            (dt.merge(_df(spark, src_rows).alias("s"), "t.k = s.k",
                      target_alias="t")
             .whenMatchedUpdate(set={"v": "s.v", "cat": "s.cat"})
             .whenNotMatchedInsertAll()
             .execute())
            model.update({k: (v, c) for k, v, c in src_rows})
        history.append(dict(model))

    def table_state(df):
        return {r["k"]: (r["v"], r["cat"]) for r in df.collect()}

    assert table_state(dt.toDF()) == model, f"seed={seed} final state"
    # time travel: every recorded version must reproduce its model
    for ver in rng.sample(range(len(history)), 3):
        assert table_state(dt.asOfVersion(ver)) == history[ver], \
            f"seed={seed} version={ver}"
    assert dt.history().count() == len(history)


@pytest.mark.parametrize("seed,partitioned,dv", [
    (11, False, False),
    (23, True, False),
    (37, False, True),
    (41, True, True),
])
def test_randomized_dml_matches_model(spark, tmp_table, seed,
                                      partitioned, dv):
    _run_scenario(spark, tmp_table, seed, partitioned, dv)


@pytest.mark.parametrize("seed,dv", [(53, False), (67, True)])
def test_randomized_dml_cdf_matches_model_diffs(spark, tmp_table, seed, dv):
    """With CDF enabled, the change feed of every version must equal
    the model diff between consecutive snapshots: inserts for new keys,
    delete rows for dropped keys, and update pre/post image pairs for
    value changes."""
    import random

    from delta_spark.io import write_delta
    from delta_spark.table import DeltaTable

    rng = random.Random(seed)
    conf = {"delta.enableChangeDataFeed": "true"}
    if dv:
        conf["delta.enableDeletionVectors"] = "true"
    next_key = 0

    def fresh_keys(n):
        nonlocal next_key
        ks = list(range(next_key, next_key + n))
        next_key += n
        return ks

    rows = [(k, rng.randrange(100), rng.choice(CATS))
            for k in fresh_keys(10)]
    model = {k: (v, c) for k, v, c in rows}
    write_delta(_df(spark, rows), tmp_table, configuration=conf)
    dt = DeltaTable.forPath(spark, tmp_table)
    history = [dict(model)]
    for _ in range(6):
        op = rng.choice(["append", "delete", "update"])
        if op == "append":
            rows = [(k, rng.randrange(100), rng.choice(CATS))
                    for k in fresh_keys(rng.randrange(1, 4))]
            model.update({k: (v, c) for k, v, c in rows})
            write_delta(_df(spark, rows), tmp_table, mode="append")
        elif op == "delete":
            m, r = rng.randrange(2, 5), rng.randrange(0, 2)
            dt.delete(f"v % {m} = {r}")
            model = {k: (v, c) for k, (v, c) in model.items()
                     if not (v % m == r)}
        else:
            cat = rng.choice(CATS)
            add = rng.randrange(1, 20)
            dt.update({"v": f"v + {add}"}, f"cat = '{cat}'")
            model = {k: (v + add if c == cat else v, c)
                     for k, (v, c) in model.items()}
        history.append(dict(model))

    for ver in range(1, len(history)):
        prev, cur = history[ver - 1], history[ver]
        changes = dt.table_changes(ver, ver).collect()
        got = {}
        for r in changes:
            got.setdefault(r["_change_type"], set()).add(
                (r["k"], r["v"], r["cat"]))
        ins = {(k, *cur[k]) for k in cur.keys() - prev.keys()}
        dels = {(k, *prev[k]) for k in prev.keys() - cur.keys()}
        pre = {(k, *prev[k]) for k in cur.keys() & prev.keys()
               if prev[k] != cur[k]}
        post = {(k, *cur[k]) for k in cur.keys() & prev.keys()
                if prev[k] != cur[k]}
        assert got.get("insert", set()) == ins, f"v{ver} inserts"
        assert got.get("delete", set()) == dels, f"v{ver} deletes"
        assert got.get("update_preimage", set()) == pre, f"v{ver} pre"
        assert got.get("update_postimage", set()) == post, f"v{ver} post"


# ---------------------------------------------------------------------------
# AMT interplay: the randomized DML schedule over an AMT-enabled table
# (adaptiveMetadata-preview), with OPTIMIZE and RESTORE mixed in, and
# bootstrap-vs-linear-replay equality checked after EVERY commit
# (reference analogue: the amt/ suite's cadence/restore interactions).
# ---------------------------------------------------------------------------

_AMT_CONF = {
    "delta_spark.catalogManaged.catalog": "filesystem",
    "delta.enableRowTracking": "true",
    "delta.enableDeletionVectors": "true",
    "delta.columnMapping.mode": "id",
    "delta.feature.domainMetadata": "supported",
    "delta.feature.adaptiveMetadata-preview": "supported",
    "delta.checkpointInterval": "2",      # a tree every 2 commits
    "delta_spark.amt.entriesPerLeaf": "3",  # leaves + MDVs early
    # the fuzz schedule runs OPTIMIZE; grant maintenance on this
    # catalog-managed table (PROTOCOL.md maintenance rules)
    "delta_spark.catalogManaged.allowMaintenanceOps": "true",
}


def _bootstrap_equals_replay(path, seed, step):
    """The AMT tree bootstrap must reconstruct exactly the state the
    pure linear commit replay produces — file set (with DV identity),
    metadata, protocol, domains, txns."""
    from delta_spark import DeltaLog
    from delta_spark.snapshot import Snapshot
    from delta_spark.util import canonical_log_path as _ckey

    DeltaLog.clear_cache()
    log = DeltaLog.for_table(path)
    v = log.latest_version()
    boot = log.update()          # prefers the AMT tree when present

    replay = Snapshot(log.table_path, v)
    log._apply_commit_range(replay, 0, v)

    def fp(snap):
        return {
            _ckey(f.path): ((f.deletionVector or {}).get("pathOrInlineDv"),
                            f.size)
            for f in snap.active.values()}

    ctx = f"seed={seed} step={step} v={v}"
    assert fp(boot) == fp(replay), f"{ctx}: file set diverged"
    assert boot.metadata.schemaString == replay.metadata.schemaString, ctx
    assert (sorted(boot.protocol.writerFeatures or [])
            == sorted(replay.protocol.writerFeatures or [])), ctx
    assert set(boot.domain_metadata) == set(replay.domain_metadata), ctx
    assert set(boot.set_transactions) == set(replay.set_transactions), ctx


def _run_amt_scenario(spark, path, seed):
    rng = random.Random(seed)
    next_key = 0

    def fresh_keys(n):
        nonlocal next_key
        ks = list(range(next_key, next_key + n))
        next_key += n
        return ks

    rows = [(k, rng.randrange(100), rng.choice(CATS))
            for k in fresh_keys(8)]
    model = {k: (v, c) for k, v, c in rows}
    write_delta(_df(spark, rows), path, configuration=_AMT_CONF)
    dt = DeltaTable.forPath(spark, path)
    history = [dict(model)]
    _bootstrap_equals_replay(path, seed, "init")

    for step in range(10):
        op = rng.choice(["append", "delete", "update", "merge",
                         "optimize", "restore"])
        if op == "append":
            rows = [(k, rng.randrange(100), rng.choice(CATS))
                    for k in fresh_keys(rng.randrange(1, 5))]
            model.update({k: (v, c) for k, v, c in rows})
            write_delta(_df(spark, rows), path, mode="append")
        elif op == "delete":
            m, r = rng.randrange(2, 5), rng.randrange(0, 2)
            dt.delete(f"v % {m} = {r}")
            model = {k: (v, c) for k, (v, c) in model.items()
                     if not (v % m == r)}
        elif op == "update":
            cat = rng.choice(CATS)
            add = rng.randrange(1, 20)
            dt.update({"v": f"v + {add}"}, f"cat = '{cat}'")
            model = {k: (v + add if c == cat else v, c)
                     for k, (v, c) in model.items()}
        elif op == "merge":
            existing = sorted(model)
            upd = rng.sample(existing, min(3, len(existing)))
            ins = fresh_keys(rng.randrange(1, 3))
            src_rows = ([(k, rng.randrange(100, 200), rng.choice(CATS))
                         for k in upd]
                        + [(k, rng.randrange(200, 300), rng.choice(CATS))
                           for k in ins])
            (dt.merge(_df(spark, src_rows).alias("s"), "t.k = s.k",
                      target_alias="t")
             .whenMatchedUpdate(set={"v": "s.v", "cat": "s.cat"})
             .whenNotMatchedInsertAll()
             .execute())
            model.update({k: (v, c) for k, v, c in src_rows})
        elif op == "optimize":
            dt.optimize().executeCompaction()
        else:  # restore to a random earlier version
            ver = rng.randrange(len(history))
            dt.restoreToVersion(ver)
            model = dict(history[ver])
        history.append(dict(model))
        _bootstrap_equals_replay(path, seed, step)
        assert {r["k"]: (r["v"], r["cat"])
                for r in dt.toDF().collect()} == model, \
            f"seed={seed} step={step} op={op}"

    # time travel below the tree still reproduces the model
    for ver in rng.sample(range(len(history)), 3):
        got = {r["k"]: (r["v"], r["cat"])
               for r in dt.asOfVersion(ver).collect()}
        assert got == history[ver], f"seed={seed} version={ver}"


@pytest.mark.parametrize("seed", [71, 83])
def test_randomized_dml_over_amt_table(spark, tmp_table, seed):
    _run_amt_scenario(spark, tmp_table, seed)


@pytest.mark.parametrize("seed", [91])
def test_cdf_diffs_below_the_tree(spark, tmp_table, seed):
    """CDF reads of versions BELOW the latest AMT tree must still equal
    the model diffs (the tree keeps root tombstones for CDF parity;
    commits also carry their actions inline)."""
    rng = random.Random(seed)
    conf = dict(_AMT_CONF)
    conf["delta.enableChangeDataFeed"] = "true"
    next_key = 0

    def fresh_keys(n):
        nonlocal next_key
        ks = list(range(next_key, next_key + n))
        next_key += n
        return ks

    rows = [(k, rng.randrange(100), rng.choice(CATS))
            for k in fresh_keys(10)]
    model = {k: (v, c) for k, v, c in rows}
    write_delta(_df(spark, rows), tmp_table, configuration=conf)
    dt = DeltaTable.forPath(spark, tmp_table)
    history = [dict(model)]
    for _ in range(6):
        op = rng.choice(["append", "delete", "update"])
        if op == "append":
            rows = [(k, rng.randrange(100), rng.choice(CATS))
                    for k in fresh_keys(rng.randrange(1, 4))]
            model.update({k: (v, c) for k, v, c in rows})
            write_delta(_df(spark, rows), tmp_table, mode="append")
        elif op == "delete":
            m, r = rng.randrange(2, 5), rng.randrange(0, 2)
            dt.delete(f"v % {m} = {r}")
            model = {k: (v, c) for k, (v, c) in model.items()
                     if not (v % m == r)}
        else:
            cat = rng.choice(CATS)
            add = rng.randrange(1, 20)
            dt.update({"v": f"v + {add}"}, f"cat = '{cat}'")
            model = {k: (v + add if c == cat else v, c)
                     for k, (v, c) in model.items()}
        history.append(dict(model))
    # every version's change feed, all read through a fresh log whose
    # snapshot bootstraps from the tree
    from delta_spark import DeltaLog
    DeltaLog.clear_cache()
    dt = DeltaTable.forPath(spark, tmp_table)
    for ver in range(1, len(history)):
        prev, cur = history[ver - 1], history[ver]
        got = {}
        for r in dt.table_changes(ver, ver).collect():
            got.setdefault(r["_change_type"], set()).add(
                (r["k"], r["v"], r["cat"]))
        ins = {(k, *cur[k]) for k in cur.keys() - prev.keys()}
        dels = {(k, *prev[k]) for k in prev.keys() - cur.keys()}
        pre = {(k, *prev[k]) for k in cur.keys() & prev.keys()
               if prev[k] != cur[k]}
        post = {(k, *cur[k]) for k in cur.keys() & prev.keys()
                if prev[k] != cur[k]}
        assert got.get("insert", set()) == ins, f"v{ver} inserts"
        assert got.get("delete", set()) == dels, f"v{ver} deletes"
        assert got.get("update_preimage", set()) == pre, f"v{ver} pre"
        assert got.get("update_postimage", set()) == post, f"v{ver} post"


def _run_evolving_scenario(spark, path, seed, mapped):
    """Randomized SCHEMA-EVOLVING DML against a pure-Python model: the
    op mix adds merge_schema appends, evolving MERGEs (source carries a
    brand-new column — sometimes aliased from an existing one, the
    metadata-smuggling shape), and nested RENAME on mapped tables.
    After every op the mapping invariants must hold (unique physical
    names, unique ids, maxColumnId watermark) and at the end the table,
    sampled time-travel versions, and (when no rename happened) the
    full CDF range must reproduce the model."""
    import random as _random

    from pyspark.sql import types as T

    from delta_spark.log import DeltaLog
    from delta_spark.schema import field_id, physical_name

    rng = _random.Random(seed)
    conf = {"delta.enableChangeDataFeed": "true"}
    if mapped:
        conf["delta.columnMapping.mode"] = "name"

    cols = ["k", "v"]                   # current logical columns
    model = {}                          # k -> {col: val}
    hist = []                           # per version: (cols, model)

    def df_for(rows, cs):
        schema = T.StructType([T.StructField(c, T.IntegerType())
                               for c in cs])
        return spark.createDataFrame(
            [tuple(r.get(c) for c in cs) for r in rows], schema)

    def record():
        hist.append((list(cols), {k: dict(v) for k, v in model.items()}))

    def check_invariants():
        snap = DeltaLog.for_table(path).update()
        names = [f.name for f in snap.schema.fields]
        assert sorted(names) == sorted(cols), (names, cols)
        if mapped:
            phys = [physical_name(f) for f in snap.schema.fields]
            ids = [field_id(f) for f in snap.schema.fields]
            assert len(set(phys)) == len(phys), phys
            assert None not in ids and len(set(ids)) == len(ids), ids
            assert int(snap.configuration.get(
                "delta.columnMapping.maxColumnId", 0)) >= max(ids)

    rows = [{"k": k, "v": rng.randrange(100)} for k in range(6)]
    model.update({r["k"]: {c: r.get(c) for c in cols if c != "k"}
                  for r in rows})
    write_delta(df_for(rows, cols), path, configuration=conf)
    dt = DeltaTable.forPath(spark, path)
    record()

    next_key, next_col, renamed = 6, 1, False
    for _ in range(10):
        op = rng.choice(["append", "evolve_append", "evolve_merge",
                         "delete", "update"] + (["rename"] if mapped
                                                else []))
        if op == "append":
            rows = [{"k": next_key + i, "v": rng.randrange(100)}
                    for i in range(rng.randrange(1, 4))]
            next_key += len(rows)
            for r in rows:
                model[r["k"]] = {c: r.get(c) for c in cols if c != "k"}
            write_delta(df_for(rows, cols), path, mode="append")
        elif op == "evolve_append":
            nc = f"c{next_col}"
            next_col += 1
            rows = [{"k": next_key, "v": rng.randrange(100),
                     nc: rng.randrange(1000)}]
            next_key += 1
            write_delta(df_for(rows, cols + [nc]), path, mode="append",
                        merge_schema=True)
            cols.append(nc)
            for kv in model.values():
                kv.setdefault(nc, None)
            model[rows[0]["k"]] = {c: rows[0].get(c) for c in cols
                                   if c != "k"}
        elif op == "evolve_merge":
            nc = f"c{next_col}"
            next_col += 1
            upd = rng.sample(sorted(model), min(2, len(model)))
            src_rows = [{"k": k, "v": rng.randrange(100, 200),
                         **{c: rng.randrange(1000) for c in cols
                            if c not in ("k", "v")},
                         nc: rng.randrange(1000)} for k in upd]
            ins = {"k": next_key, "v": rng.randrange(200, 300),
                   **{c: rng.randrange(1000) for c in cols
                      if c not in ("k", "v")},
                   nc: rng.randrange(1000)}
            next_key += 1
            src = df_for(src_rows + [ins], cols + [nc])
            if rng.random() < 0.5:
                # metadata-smuggling shape: the new column aliased off
                # an existing one (alias propagates StructField
                # metadata incl. any columnMapping identity)
                src = df_for(src_rows + [ins], cols) \
                    .selectExpr("*", f"v AS {nc}")
                for r in src_rows + [ins]:
                    r[nc] = r["v"]
            (dt.merge(src.alias("s"), "t.k = s.k", target_alias="t")
               .whenMatchedUpdateAll().whenNotMatchedInsertAll()
               .withSchemaEvolution().execute())
            cols.append(nc)
            for kv in model.values():
                kv.setdefault(nc, None)
            for r in src_rows + [ins]:
                model[r["k"]] = {c: r.get(c) for c in cols if c != "k"}
        elif op == "delete":
            m, r0 = rng.randrange(2, 5), rng.randrange(0, 2)
            dt.delete(f"v % {m} = {r0}")
            model = {k: kv for k, kv in model.items()
                     if not (kv["v"] % m == r0)}
        elif op == "update":
            add = rng.randrange(1, 20)
            m = rng.randrange(2, 4)
            dt.update({"v": f"v + {add}"}, f"k % {m} = 0")
            for k, kv in model.items():
                if k % m == 0:
                    kv["v"] = kv["v"] + add
        else:  # rename (mapped only) — evolved columns, so the fixed
            # ops (UPDATE v, DELETE by v) keep resolving
            cands = [c for c in cols if c not in ("k", "v")]
            if not cands:
                continue
            old = rng.choice(cands)
            new = f"{old}_r{next_col}"
            next_col += 1
            dt.renameColumn(old, new)
            cols[cols.index(old)] = new
            for kv in model.values():
                kv[new] = kv.pop(old)
            renamed = True
        record()
        check_invariants()

    def table_state(df, cs):
        return {r["k"]: {c: r[c] for c in cs if c != "k"}
                for r in df.collect()}

    assert table_state(dt.toDF(), cols) == model, f"seed={seed}"
    for ver in rng.sample(range(len(hist)), 3):
        vcols, vmodel = hist[ver]
        assert table_state(dt.asOfVersion(ver), vcols) == vmodel, \
            f"seed={seed} version={ver}"
    if not renamed:
        # additive-only history: the whole CDF range must be readable
        # (nested-additive superset rule) and net out to the model
        from delta_spark.cdf import table_changes
        ch = table_changes(spark, DeltaLog.for_table(path), 0, len(hist) - 1)
        net = {}
        for r in sorted(ch.collect(),
                        key=lambda r: (r["_commit_version"],
                                       r["_change_type"])):
            if r["_change_type"] in ("insert", "update_postimage"):
                net[r["k"]] = {c: r[c] for c in cols if c != "k"}
            elif r["_change_type"] == "delete":
                net.pop(r["k"], None)
        assert net == model, f"seed={seed} CDF net state"


@pytest.mark.parametrize("seed,mapped", [
    (101, False), (103, True), (107, True), (109, False), (113, True),
])
def test_randomized_evolving_dml_matches_model(spark, tmp_table, seed,
                                               mapped):
    _run_evolving_scenario(spark, tmp_table, seed, mapped)
