"""Predicate engine correctness: three-valued partition evaluation is
checked against Spark's OWN evaluation of the same expression, and
stats-based skipping is checked for soundness (a skipped file must
provably contain no TRUE rows) over randomized predicates/files."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from delta_spark import predicates as P
from delta_spark.predicates import FileStatsView

COLS = {"a": "int", "b": "double", "s": "string"}

_OPS = ["=", "<", "<=", ">", ">=", "!="]
_A_VALS = [0, 1, 5, 10, None]
_B_VALS = [0.0, 2.5, -1.0, None]
_S_VALS = ["apple", "berry", "cherry", None]


def _gen_predicate(rng: random.Random, depth: int = 2) -> str:
    if depth > 0 and rng.random() < 0.45:
        op = rng.choice(["AND", "OR"])
        l = _gen_predicate(rng, depth - 1)
        r = _gen_predicate(rng, depth - 1)
        node = f"({l}) {op} ({r})"
        return f"NOT ({node})" if rng.random() < 0.2 else node
    kind = rng.random()
    col = rng.choice(list(COLS))
    if kind < 0.5:
        op = rng.choice(_OPS)
        lit = _lit_for(rng, col)
        return f"{col} {op} {lit}"
    if kind < 0.65:
        return f"{col} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
    if kind < 0.8:
        vals = ", ".join(_lit_for(rng, col) for _ in range(rng.randint(1, 3)))
        return f"{col} IN ({vals})"
    if kind < 0.9:
        lo, hi = sorted([_num_for(rng, col), _num_for(rng, col)])
        if col == "s":
            return f"s BETWEEN 'a' AND 'c'"
        return f"{col} BETWEEN {lo} AND {hi}"
    return f"s LIKE '{rng.choice(['a%', 'ber%', '%rry', 'x%'])}'"


def _lit_for(rng, col):
    if col == "a":
        return str(rng.choice([0, 1, 5, 10]))
    if col == "b":
        return str(rng.choice([0.0, 2.5, -1.0]))
    return "'" + rng.choice(["apple", "berry", "cherry"]) + "'"


def _num_for(rng, col):
    return rng.choice([0, 1, 5, 10]) if col == "a" else rng.choice([0.0, 2.5, -1.0])


def test_eval_partition_matches_spark(spark):
    """For 150 random predicates × 10 rows, our three-valued evaluator
    must agree with Spark's expression evaluation exactly."""
    rng = random.Random(42)
    rows = [
        {"a": a, "b": b, "s": s}
        for a in _A_VALS for b in _B_VALS for s in _S_VALS
    ]
    rng.shuffle(rows)
    rows = rows[:10]
    df = spark.createDataFrame(
        [(r["a"], r["b"], r["s"]) for r in rows], "a int, b double, s string")
    checked = 0
    for i in range(80):
        pred = _gen_predicate(rng)
        try:
            ast = P.parse_predicate(pred)
        except P.UnsupportedPredicate:
            continue
        got = [P.eval_partition(ast, r) for r in rows]
        want_rows = df.select(F.expr(pred).alias("v")).collect()
        want = [w["v"] for w in want_rows]
        assert got == want, f"{pred}: ours={got} spark={want}"
        checked += 1
    assert checked > 55  # the generator mostly stays in the subset


def test_might_contain_soundness(spark, tmp_path):
    """Randomized soundness: whenever might_contain says False for a
    file's stats, Spark must find zero TRUE rows in that file."""
    rng = random.Random(7)
    # build 20 synthetic "files" = row batches with real stats
    files = []
    for i in range(20):
        batch = []
        for _ in range(rng.randint(1, 8)):
            batch.append({
                "a": rng.choice(_A_VALS),
                "b": rng.choice(_B_VALS),
                "s": rng.choice(_S_VALS),
            })
        files.append(batch)

    def stats_of(batch):
        def col_stats(c):
            vals = [r[c] for r in batch if r[c] is not None]
            nulls = sum(1 for r in batch if r[c] is None)
            return (min(vals) if vals else None, max(vals) if vals else None, nulls)
        mins, maxs, nulls = {}, {}, {}
        for c in COLS:
            lo, hi, nc = col_stats(c)
            if lo is not None:
                mins[c], maxs[c] = lo, hi
            nulls[c] = nc
        return FileStatsView(len(batch), mins, maxs, nulls)

    # one DataFrame with a file id → ONE Spark job per predicate
    all_rows = [(i, r["a"], r["b"], r["s"]) for i, batch in enumerate(files) for r in batch]
    df = spark.createDataFrame(all_rows, "fid int, a int, b double, s string")
    stats = [stats_of(b) for b in files]
    tested_skips = 0
    for i in range(40):
        pred = _gen_predicate(rng)
        try:
            ast = P.parse_predicate(pred)
        except P.UnsupportedPredicate:
            continue
        skipped = {i for i, st in enumerate(stats) if not P.might_contain(ast, st)}
        if not skipped:
            continue
        matching_fids = {r["fid"] for r in
                         df.filter(F.expr(pred)).select("fid").distinct().collect()}
        overlap = skipped & matching_fids
        assert not overlap, f"unsound skip: {pred} (files {overlap})"
        tested_skips += len(skipped)
    assert tested_skips > 50  # skipping actually fires


def test_parse_rejects_unsupported():
    for bad in ["a + 1 > 2 OR", "rand() > 0.5", "a ~ 'x'", "substr(s,1,2) = 'ab'"]:
        with pytest.raises(P.UnsupportedPredicate):
            P.parse_predicate(bad)


def test_like_and_null_semantics(spark):
    ast = P.parse_predicate("s LIKE 'ber%'")
    st = FileStatsView(5, {"s": "apple"}, {"s": "banana"}, {"s": 0})
    assert P.might_contain(ast, st) is False  # 'ber' > max prefix 'ban'
    st2 = FileStatsView(5, {"s": "apple"}, {"s": "cherry"}, {"s": 0})
    assert P.might_contain(ast2 := ast, st2) is True
    # all-null column can never satisfy equality
    st3 = FileStatsView(4, {}, {}, {"a": 4})
    assert P.might_contain(P.parse_predicate("a = 5"), st3) is False
    assert P.might_contain(P.parse_predicate("a IS NULL"), st3) is True


def test_skipping_condition_sql_matches_might_contain(spark):
    """The compiled-to-SQL skipping condition (files_for_scan_df's
    filter) must agree file-by-file with the python might_contain over
    randomized predicates and file stats — and therefore inherit its
    proven soundness."""
    rng = random.Random(11)
    files = []
    for i in range(25):
        batch = [{"a": rng.choice(_A_VALS), "b": rng.choice(_B_VALS),
                  "s": rng.choice(_S_VALS)} for _ in range(rng.randint(1, 8))]
        files.append(batch)

    def stats_of(batch):
        mins, maxs, nulls = {}, {}, {}
        for c in COLS:
            vals = [r[c] for r in batch if r[c] is not None]
            nulls[c] = sum(1 for r in batch if r[c] is None)
            if vals:
                mins[c], maxs[c] = min(vals), max(vals)
        return FileStatsView(len(batch), mins, maxs, nulls)

    stats = [stats_of(b) for b in files]
    # state_df-shaped stats frame: one row per file with the __s struct
    rows = []
    for i, st in enumerate(stats):
        rows.append((i, st.num_records,
                     st.min_values.get("a"), st.max_values.get("a"), st.null_count.get("a"),
                     st.min_values.get("b"), st.max_values.get("b"), st.null_count.get("b"),
                     st.min_values.get("s"), st.max_values.get("s"), st.null_count.get("s")))
    raw = spark.createDataFrame(
        rows, "fid int, n long, mina int, maxa int, nca long, "
              "minb double, maxb double, ncb long, mins string, maxs string, ncs long")
    sdf = raw.select(
        "fid",
        F.struct(
            F.col("n").alias("numRecords"),
            F.struct(F.col("mina").alias("a"), F.col("minb").alias("b"),
                     F.col("mins").alias("s")).alias("minValues"),
            F.struct(F.col("maxa").alias("a"), F.col("maxb").alias("b"),
                     F.col("maxs").alias("s")).alias("maxValues"),
            F.struct(F.col("nca").alias("a"), F.col("ncb").alias("b"),
                     F.col("ncs").alias("s")).alias("nullCount"),
        ).alias("__s"),
        F.lit(None).cast("map<string,string>").alias("partitionValues"))
    sdf = sdf.cache()
    checked = 0
    for _ in range(60):
        pred = _gen_predicate(rng)
        try:
            ast = P.parse_predicate(pred)
        except P.UnsupportedPredicate:
            continue
        want = {i for i, st in enumerate(stats) if P.might_contain(ast, st)}
        cond = P.skipping_condition_sql(
            ast, dict(COLS), set(), stat_cols=set(COLS))
        got = {r["fid"] for r in sdf.filter(F.expr(cond)).select("fid").collect()}
        assert got == want, f"SQL/python skipping divergence for {pred!r}: " \
                            f"sql-only={got - want} py-only={want - got}"
        checked += 1
    assert checked >= 30


def test_reject_subquery_unit():
    """DML conditions must not contain subqueries (DeltaErrors
    subqueryNotSupportedException via PreprocessTableDelete/Update/Merge)."""
    P.reject_subquery(None, "DELETE")                      # no condition ok
    P.reject_subquery("a > (1 + 2)", "DELETE")             # parens ok
    P.reject_subquery("s = 'select x'", "DELETE")          # inside a string
    P.reject_subquery("note = 'see (select appendix)'", "DELETE")
    P.reject_subquery("body LIKE '%(with%' AND s = '(SELECT'", "DELETE")
    with pytest.raises(ValueError, match="DELETE"):
        P.reject_subquery("a IN (SELECT a FROM t)", "DELETE")
    with pytest.raises(ValueError, match="UPDATE"):
        P.reject_subquery("a > (select max(a) from t)", "UPDATE")
    with pytest.raises(ValueError, match="MERGE"):
        P.reject_subquery("exists ( WITH q AS (SELECT 1) SELECT * FROM q )",
                          "MERGE")


def test_dml_rejects_subquery(spark, tmp_path):
    from delta_spark.io import write_delta
    from delta_spark.table import DeltaTable

    p = str(tmp_path / "t")
    write_delta(spark.range(5).withColumnRenamed("id", "a"), p)
    dt = DeltaTable.forPath(spark, p)
    with pytest.raises(ValueError, match="Subqueries are not supported"):
        dt.delete("a IN (SELECT a FROM other)")
    with pytest.raises(ValueError, match="Subqueries are not supported"):
        dt.update(condition="a = (SELECT 1)", set={"a": "a + 1"})
    src = spark.range(2).withColumnRenamed("id", "a")
    with pytest.raises(ValueError, match="Subqueries are not supported"):
        (dt.merge(src, "target.a = source.a AND target.a IN (SELECT 1)")
           .whenMatchedDelete().execute())
    with pytest.raises(ValueError, match="Subqueries are not supported"):
        (dt.merge(src, "target.a = source.a")
           .whenMatchedDelete("target.a > (SELECT max(a) FROM x)").execute())
    # table unchanged by the failed attempts
    assert dt.toDF().count() == 5


def test_reject_subquery_double_quoted_literal():
    """Spark's default (non-ANSI) mode treats double quotes as string
    literals — they must be masked too."""
    P.reject_subquery('note = "(select appendix)"', "DELETE")
    P.reject_subquery('a = "(WITH x)" AND b = \'(select\'', "DELETE")
    with pytest.raises(ValueError):
        P.reject_subquery('a IN (SELECT 1) AND s = "x"', "DELETE")
