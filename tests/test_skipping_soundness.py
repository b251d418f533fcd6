"""Hypothesis fuzz of data-skipping SOUNDNESS: for random tiny "files"
(row sets) and random predicates, `might_contain` over the file's
exact stats must NEVER return False when DuckDB finds a row where the
predicate is TRUE — a false prune silently drops query results, the
worst bug class a lakehouse can have. (Completeness — pruning as often
as possible — is a perf property and not asserted here.)"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from delta_spark import predicates as P
from delta_spark.predicates import FileStatsView

COLS = ("a", "b", "s")

_int = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
_str = st.one_of(st.none(), st.sampled_from(["", "a", "b", "ab", "z"]))
_row = st.tuples(_int, _int, _str)
_rows = st.lists(_row, min_size=1, max_size=6)

_lit_int = st.integers(min_value=-5, max_value=5)
_lit_str = st.sampled_from(["a", "b", "z", ""])
_cmp = st.sampled_from(["=", "<", "<=", ">", ">=", "<>"])


@st.composite
def _leaf(draw):
    kind = draw(st.sampled_from(
        ["int_cmp", "str_cmp", "null", "not_null", "in", "between"]))
    if kind == "int_cmp":
        c = draw(st.sampled_from(["a", "b"]))
        return f"{c} {draw(_cmp)} {draw(_lit_int)}"
    if kind == "str_cmp":
        return f"s {draw(_cmp)} '{draw(_lit_str)}'"
    if kind == "null":
        return f"{draw(st.sampled_from(COLS))} IS NULL"
    if kind == "not_null":
        return f"{draw(st.sampled_from(COLS))} IS NOT NULL"
    if kind == "in":
        c = draw(st.sampled_from(["a", "b"]))
        vals = draw(st.lists(_lit_int, min_size=1, max_size=3))
        return f"{c} IN ({', '.join(map(str, vals))})"
    lo, hi = draw(_lit_int), draw(_lit_int)
    return f"{draw(st.sampled_from(['a', 'b']))} BETWEEN {lo} AND {hi}"


@st.composite
def _pred(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return draw(_leaf())
    op = draw(st.sampled_from(["AND", "OR"]))
    left = draw(_pred(depth=depth - 1))
    right = draw(_pred(depth=depth - 1))
    node = f"({left}) {op} ({right})"
    if draw(st.booleans()):
        node = f"NOT ({node})"
    return node


def _stats_of(rows):
    """Exact per-column stats, the tightest a writer could record."""
    mins, maxs, nulls = {}, {}, {}
    for i, c in enumerate(COLS):
        vals = [r[i] for r in rows if r[i] is not None]
        nulls[c] = sum(1 for r in rows if r[i] is None)
        if vals:
            mins[c] = min(vals)
            maxs[c] = max(vals)
    return FileStatsView(len(rows), mins, maxs, nulls)


@given(_rows, _pred())
@settings(max_examples=400, deadline=None)
def test_might_contain_is_sound(rows, pred):
    try:
        ast = P.parse_predicate(pred)
    except P.UnsupportedPredicate:
        return  # unparseable predicates keep every file by contract
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (a INTEGER, b INTEGER, s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        n_true = con.execute(
            f"SELECT count(*) FROM t WHERE {pred}").fetchone()[0]
    except duckdb.InternalException:
        # duckdb 1.0.0 itself crashes ("Attempted to dereference
        # unique_ptr that is NULL") optimizing some predicates with
        # duplicated OR branches over all-NULL rows — an oracle-library
        # defect, not an engine property. Without a working oracle this
        # input can't be judged; soundness is still asserted on every
        # input the oracle can evaluate. Assertion failures are NOT
        # caught by this clause.
        return
    finally:
        con.close()
    if n_true == 0:
        return  # pruning a matchless file is always fine
    st_view = _stats_of(rows)
    try:
        keep = P.might_contain(ast, st_view)
    except P.UnsupportedPredicate:
        return
    assert keep, (f"UNSOUND PRUNE: predicate {pred!r} matches "
                  f"{n_true} row(s) of {rows} but might_contain said "
                  f"skip (stats min={st_view.min_values} "
                  f"max={st_view.max_values} nulls={st_view.null_count})")
