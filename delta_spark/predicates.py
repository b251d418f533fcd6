"""Predicate parsing + file-level evaluation (data skipping / partition
pruning).

This is the engine's equivalent of the reference's
stats/DataFiltersBuilder.scala + stats/DataSkippingReader.scala:656
(filesForScan): given a SQL boolean predicate, decide per data file
whether it *might* contain matching rows, using the per-file stats
(numRecords/minValues/maxValues/nullCount) and partition values carried
in the transaction log. Evaluation is sound-by-construction: anything
we cannot parse or reason about degrades to "might match" (keep the
file); the full predicate is always re-applied to the rows by Spark, so
skipping only ever removes *provably* irrelevant files.

The supported surface mirrors the reference's skipping predicates:
comparisons (=, <, <=, >, >=, !=, <=>), AND/OR/NOT, IN, BETWEEN,
IS [NOT] NULL, LIKE 'prefix%', literals (number/string/bool/
DATE/TIMESTAMP). NOT is pushed down De-Morgan-style into negated
comparisons (DataFiltersBuilder's NOT handling).

Evaluation is vectorized nowhere on purpose: the AST evaluators run on
the driver over the AddFile list. At 100 TB a table has O(10^5-10^6)
files; a linear pass over in-memory structs at ~1M evals/sec is
milliseconds — the same order as the reference's driver-side
DataFrame-based skipping job, without a Spark job launch. For logs
beyond that, the same AST can be compiled to a Spark filter over a
stats DataFrame (see snapshot.files_df).
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass
from typing import Any, Optional

from pyspark.sql import types as T


class UnsupportedPredicate(Exception):
    """Raised when the predicate is outside the supported subset.
    Callers must treat this as 'no skipping possible'."""


# ---------------------------------------------------------------- AST ----

@dataclass
class Col:
    name: str


@dataclass
class Lit:
    value: Any


@dataclass
class Cmp:
    op: str  # = < <= > >= != <=>
    left: Any
    right: Any


@dataclass
class IsNull:
    child: Any
    negated: bool = False


@dataclass
class In:
    child: Any
    values: list
    negated: bool = False


@dataclass
class Like:
    child: Any
    pattern: str
    negated: bool = False


@dataclass
class And:
    left: Any
    right: Any


@dataclass
class Or:
    left: Any
    right: Any


@dataclass
class Not:
    child: Any


# ----------------------------------------------------------- tokenizer ----

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
      (?P<string>'(?:[^']|'')*')
    | (?P<qid>`[^`]+`|"[^"]+")
    | (?P<num>-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+(?:[eE][+-]?\d+)?)
    | (?P<op><=>|<>|!=|<=|>=|==|=|<|>)
    | (?P<lparen>\()
    | (?P<rparen>\))
    | (?P<comma>,)
    | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "IN", "IS", "NULL", "TRUE", "FALSE",
             "BETWEEN", "LIKE", "DATE", "TIMESTAMP", "RLIKE"}


def _tokenize(s: str) -> list[tuple[str, str]]:
    toks = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            rest = s[pos:].strip()
            if not rest:
                break
            raise UnsupportedPredicate(f"cannot tokenize at: {rest[:30]!r}")
        pos = m.end()
        kind = m.lastgroup
        toks.append((kind, m.group(kind)))
    toks.append(("eof", ""))
    return toks


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def is_word(self, *words: str) -> bool:
        k, v = self.peek()
        return k == "word" and v.upper() in words

    def eat_word(self, *words: str) -> str:
        k, v = self.next()
        if k != "word" or v.upper() not in words:
            raise UnsupportedPredicate(f"expected {words}, got {v!r}")
        return v.upper()

    # expr := and_expr (OR and_expr)*
    def parse_expr(self):
        node = self.parse_and()
        while self.is_word("OR"):
            self.next()
            node = Or(node, self.parse_and())
        return node

    def parse_and(self):
        node = self.parse_not()
        while self.is_word("AND"):
            self.next()
            node = And(node, self.parse_not())
        return node

    def parse_not(self):
        if self.is_word("NOT"):
            self.next()
            return Not(self.parse_not())
        return self.parse_primary()

    def parse_primary(self):
        k, v = self.peek()
        if k == "lparen":
            save = self.i
            self.next()
            try:
                node = self.parse_expr()
                kk, _ = self.next()
                if kk != "rparen":
                    raise UnsupportedPredicate("expected )")
                # might be a comparison continuing: (a) = 1 — rare; ignore
                return node
            except UnsupportedPredicate:
                self.i = save
                raise
        return self.parse_comparison()

    def parse_operand(self):
        k, v = self.peek()
        if k == "string":
            self.next()
            return Lit(v[1:-1].replace("''", "'"))
        if k == "num":
            self.next()
            if re.fullmatch(r"-?\d+", v):
                return Lit(int(v))
            return Lit(float(v))
        if k == "lparen":
            self.next()
            node = self.parse_operand()
            kk, _ = self.next()
            if kk != "rparen":
                raise UnsupportedPredicate("expected ) after operand")
            return node
        if k == "qid":
            self.next()
            return Col(v[1:-1])
        if k == "word":
            up = v.upper()
            if up == "NULL":
                self.next()
                return Lit(None)
            if up in ("TRUE", "FALSE"):
                self.next()
                return Lit(up == "TRUE")
            if up in ("DATE", "TIMESTAMP"):
                self.next()
                kk, sv = self.next()
                if kk != "string":
                    raise UnsupportedPredicate(f"expected string after {up}")
                raw = sv[1:-1]
                if up == "DATE":
                    return Lit(_dt.date.fromisoformat(raw))
                return Lit(_parse_ts(raw))
            if up in _KEYWORDS:
                raise UnsupportedPredicate(f"unexpected keyword {v}")
            self.next()
            return Col(v)
        raise UnsupportedPredicate(f"unexpected token {v!r}")

    def parse_comparison(self):
        left = self.parse_operand()
        k, v = self.peek()
        negated = False
        if self.is_word("NOT"):
            self.next()
            negated = True
            k, v = self.peek()
        if k == "op":
            if negated:
                raise UnsupportedPredicate("NOT before operator")
            self.next()
            right = self.parse_operand()
            op = {"==": "=", "<>": "!="}.get(v, v)
            return Cmp(op, left, right)
        if k == "word":
            up = v.upper()
            if up == "IS":
                self.next()
                neg = False
                if self.is_word("NOT"):
                    self.next()
                    neg = True
                self.eat_word("NULL")
                return IsNull(left, negated=neg)
            if up == "IN":
                self.next()
                kk, _ = self.next()
                if kk != "lparen":
                    raise UnsupportedPredicate("expected ( after IN")
                vals = []
                while True:
                    item = self.parse_operand()
                    if not isinstance(item, Lit):
                        raise UnsupportedPredicate("IN list must be literals")
                    vals.append(item.value)
                    kk, _ = self.next()
                    if kk == "rparen":
                        break
                    if kk != "comma":
                        raise UnsupportedPredicate("expected , in IN list")
                return In(left, vals, negated=negated)
            if up == "BETWEEN":
                self.next()
                lo = self.parse_operand()
                self.eat_word("AND")
                hi = self.parse_operand()
                node = And(Cmp(">=", left, lo), Cmp("<=", left, hi))
                return Not(node) if negated else node
            if up == "LIKE":
                self.next()
                kk, sv = self.next()
                if kk != "string":
                    raise UnsupportedPredicate("LIKE needs string pattern")
                return Like(left, sv[1:-1].replace("''", "'"), negated=negated)
        # bare boolean column: `flag`
        if isinstance(left, Col) and not negated:
            return Cmp("=", left, Lit(True))
        raise UnsupportedPredicate(f"cannot parse comparison near {v!r}")


def _parse_ts(raw: str) -> _dt.datetime:
    try:
        return _dt.datetime.fromisoformat(raw)
    except ValueError:
        return _dt.datetime.strptime(raw, "%Y-%m-%d %H:%M:%S.%f")


_SUBQUERY_RE = re.compile(r"(?is)\(\s*(?:SELECT|WITH)\b")
# both quote styles: Spark's default (non-ANSI) mode treats "..." as a
# string literal too
_STRING_LIT_RE = re.compile(r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"")


def mask_string_literals(sql: str, repl: str = "''") -> str:
    """Replace string literals with a placeholder so scanners (subquery
    detection, column-reference search, path rewriting) never match
    inside quoted values."""
    return _STRING_LIT_RE.sub(repl, sql)


def reject_subquery(condition: Optional[str], operation: str) -> None:
    """DML conditions may not contain subqueries
    (PreprocessTableDelete.scala:44, PreprocessTableUpdate.scala:44,
    PreprocessTableMerge.scala:67 — DeltaErrors
    subqueryNotSupportedException). Without this gate the condition
    fails later with an unresolved-relation error that hides the
    actual restriction. String literals are masked first so a quoted
    value containing '(select' is not a false positive."""
    if condition and _SUBQUERY_RE.search(mask_string_literals(condition)):
        raise ValueError(
            f"Subqueries are not supported in the {operation} "
            f"(condition = {condition.strip()})")


def parse_predicate(sql: str):
    """Parse a SQL boolean expression into the skipping AST.
    Raises UnsupportedPredicate outside the subset."""
    p = _Parser(_tokenize(sql))
    node = p.parse_expr()
    if p.peek()[0] != "eof":
        raise UnsupportedPredicate(f"trailing tokens: {p.peek()[1]!r}")
    return node


# ------------------------------ generated-column filter derivation ----
# (GeneratedColumn.scala:512-591 / optimizablePartitionExpressions):
# when a partition column g is GENERATED ALWAYS AS f(x) for a monotonic
# non-decreasing f, data predicates on x imply partition predicates on
# g:  x >= L ⇒ g >= f(L);  x <= U ⇒ g <= f(U);  x = v ⇒ g = f(v);
# strict bounds weaken to non-strict (f collapses ranges).

_GEN_FNS = {
    "year": lambda v: v.year,
    "month": lambda v: v.month,
    "day": lambda v: v.day,
    "dayofmonth": lambda v: v.day,
    "hour": lambda v: v.hour if isinstance(v, _dt.datetime) else 0,
    "to_date": lambda v: v.date() if isinstance(v, _dt.datetime) else v,
    "date": lambda v: v.date() if isinstance(v, _dt.datetime) else v,
}


def parse_generation_expr(expr: str):
    """Recognize `fn(col)` / `CAST(col AS DATE)` generation expressions.
    Returns (mapper, base_col) or None."""
    m = re.fullmatch(r"\s*(\w+)\s*\(\s*`?(\w+)`?\s*\)\s*", expr)
    if m and m.group(1).lower() in _GEN_FNS:
        return _GEN_FNS[m.group(1).lower()], m.group(2)
    m = re.fullmatch(r"\s*CAST\s*\(\s*`?(\w+)`?\s+AS\s+DATE\s*\)\s*", expr, re.IGNORECASE)
    if m:
        return _GEN_FNS["date"], m.group(1)
    m = re.fullmatch(r"\s*date_trunc\s*\(\s*'(\w+)'\s*,\s*`?(\w+)`?\s*\)\s*", expr, re.IGNORECASE)
    if m and m.group(1).upper() in ("DAY", "DD"):
        return (lambda v: _dt.datetime(v.year, v.month, v.day)), m.group(2)
    return None


def derive_generated_conjuncts(node, gen_map: dict):
    """gen_map: partition_col → (mapper, base_col). Returns extra AND
    conjuncts on the partition columns implied by top-level comparisons
    on the base columns."""
    by_base = {}
    for g, (fn, base) in gen_map.items():
        by_base.setdefault(base, []).append((g, fn))
    out = []

    def conjuncts(n):
        if isinstance(n, And):
            yield from conjuncts(n.left)
            yield from conjuncts(n.right)
        else:
            yield n

    for c in conjuncts(node):
        if isinstance(c, Cmp) and isinstance(c.left, Col) and isinstance(c.right, Lit):
            base, lit = c.left.name, c.right.value
            if base not in by_base or lit is None:
                continue
            v = _parse_dtish(lit) if isinstance(lit, str) else lit
            if not isinstance(v, (_dt.date, _dt.datetime)):
                continue
            for g, fn in by_base[base]:
                try:
                    mapped = fn(v if isinstance(v, _dt.datetime) else _dt.datetime(v.year, v.month, v.day))
                except Exception:
                    continue
                op = {"<": "<=", ">": ">=", "=": "=", "<=": "<=", ">=": ">="}.get(c.op)
                if op:
                    out.append(Cmp(op, Col(g), Lit(mapped)))
        elif isinstance(c, In) and isinstance(c.child, Col) and not c.negated:
            base = c.child.name
            if base not in by_base:
                continue
            vals = [(_parse_dtish(x) if isinstance(x, str) else x) for x in c.values]
            if not all(isinstance(v, (_dt.date, _dt.datetime)) for v in vals if v is not None):
                continue
            for g, fn in by_base[base]:
                try:
                    mapped = [fn(v if isinstance(v, _dt.datetime)
                                 else _dt.datetime(v.year, v.month, v.day))
                              for v in vals if v is not None]
                except Exception:
                    continue
                out.append(In(Col(g), sorted(set(mapped), key=str)))
    return out


def references(node) -> set[str]:
    """Column names referenced by the AST."""
    if isinstance(node, Col):
        return {node.name}
    if isinstance(node, Lit):
        return set()
    if isinstance(node, Cmp):
        return references(node.left) | references(node.right)
    if isinstance(node, (IsNull, Like)):
        return references(node.child)
    if isinstance(node, In):
        return references(node.child)
    if isinstance(node, (And, Or)):
        return references(node.left) | references(node.right)
    if isinstance(node, Not):
        return references(node.child)
    return set()


# ---------------------------------------------------- value comparisons ----

def _coerce_pair(a: Any, b: Any):
    """Coerce two values into a comparable pair (timestamps vs dates vs
    ISO strings; ints vs floats). Raises TypeError when incomparable."""
    if isinstance(a, str) and isinstance(b, (_dt.datetime, _dt.date)):
        a2 = _parse_dtish(a)
        if a2 is not None:
            a = a2
    if isinstance(b, str) and isinstance(a, (_dt.datetime, _dt.date)):
        b2 = _parse_dtish(b)
        if b2 is not None:
            b = b2
    if isinstance(a, _dt.datetime) and isinstance(b, _dt.date) and not isinstance(b, _dt.datetime):
        b = _dt.datetime(b.year, b.month, b.day)
    if isinstance(b, _dt.datetime) and isinstance(a, _dt.date) and not isinstance(a, _dt.datetime):
        a = _dt.datetime(a.year, a.month, a.day)
    if isinstance(a, _dt.datetime) and isinstance(b, _dt.datetime):
        if a.tzinfo is not None and b.tzinfo is None:
            b = b.replace(tzinfo=a.tzinfo)
        elif b.tzinfo is not None and a.tzinfo is None:
            a = a.replace(tzinfo=b.tzinfo)
    if isinstance(a, bool) != isinstance(b, bool) and (isinstance(a, bool) or isinstance(b, bool)):
        raise TypeError("bool vs non-bool")
    return a, b


def _parse_dtish(s: str):
    try:
        if len(s) == 10:
            return _dt.date.fromisoformat(s)
        return _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None


def cmp_values(a: Any, b: Any) -> Optional[int]:
    """Three-way compare; None when incomparable (treat as unknown)."""
    try:
        a, b = _coerce_pair(a, b)
        if a == b:
            return 0
        return -1 if a < b else 1
    except TypeError:
        return None


# ------------------------------------------------ partition evaluation ----

def eval_partition(node, row: dict[str, Any]) -> Optional[bool]:
    """Three-valued SQL boolean evaluation against one concrete row of
    typed partition values (files/TahoeFileIndex.scala:96 partition
    filtering). Returns True / False / None(=NULL)."""
    if isinstance(node, And):
        l, r = eval_partition(node.left, row), eval_partition(node.right, row)
        if l is False or r is False:
            return False
        if l is None or r is None:
            return None
        return True
    if isinstance(node, Or):
        l, r = eval_partition(node.left, row), eval_partition(node.right, row)
        if l is True or r is True:
            return True
        if l is None or r is None:
            return None
        return False
    if isinstance(node, Not):
        v = eval_partition(node.child, row)
        return None if v is None else (not v)
    if isinstance(node, IsNull):
        v = _operand_value(node.child, row)
        isnull = v is None
        return (not isnull) if node.negated else isnull
    if isinstance(node, Cmp):
        lv = _operand_value(node.left, row)
        rv = _operand_value(node.right, row)
        if node.op == "<=>":
            if lv is None and rv is None:
                return True
            if lv is None or rv is None:
                return False
            c = cmp_values(lv, rv)
            return None if c is None else c == 0
        if lv is None or rv is None:
            return None
        c = cmp_values(lv, rv)
        if c is None:
            return None
        return {"=": c == 0, "!=": c != 0, "<": c < 0, "<=": c <= 0, ">": c > 0, ">=": c >= 0}[node.op]
    if isinstance(node, In):
        v = _operand_value(node.child, row)
        if v is None:
            return None
        any_null = any(x is None for x in node.values)
        hit = any(x is not None and cmp_values(v, x) == 0 for x in node.values)
        if hit:
            return False if node.negated else True
        if any_null:
            return None
        return True if node.negated else False
    if isinstance(node, Like):
        v = _operand_value(node.child, row)
        if v is None:
            return None
        rx = re.escape(node.pattern).replace(r"%", ".*").replace(r"_", ".")
        m = re.fullmatch(rx, str(v)) is not None
        return (not m) if node.negated else m
    if isinstance(node, Lit):
        return node.value if isinstance(node.value, bool) else None
    raise UnsupportedPredicate(f"cannot evaluate {type(node).__name__} on partitions")


def _operand_value(node, row: dict[str, Any]):
    if isinstance(node, Lit):
        return node.value
    if isinstance(node, Col):
        if node.name not in row:
            raise KeyError(node.name)
        return row[node.name]
    raise UnsupportedPredicate("complex operand")


# --------------------------------------------------- stats evaluation ----

class FileStatsView:
    """Per-file stats accessor: min/max/nullCount/numRecords per column,
    already parsed from the AddFile stats JSON blob."""

    __slots__ = ("num_records", "min_values", "max_values", "null_count")

    def __init__(self, num_records, min_values, max_values, null_count):
        self.num_records = num_records
        self.min_values = min_values or {}
        self.max_values = max_values or {}
        self.null_count = null_count or {}


def might_contain(node, st: FileStatsView) -> bool:
    """True when the file *might* contain rows where the predicate is
    TRUE. Sound w.r.t. three-valued logic: rows where the predicate is
    NULL or FALSE don't count (matching filesForScan semantics —
    skipped files provably contribute no TRUE rows)."""
    if isinstance(node, And):
        return might_contain(node.left, st) and might_contain(node.right, st)
    if isinstance(node, Or):
        return might_contain(node.left, st) or might_contain(node.right, st)
    if isinstance(node, Not):
        return might_contain(_negate(node.child), st)
    if isinstance(node, IsNull):
        if isinstance(node.child, Col):
            name = node.child.name
            nc = st.null_count.get(name)
            if nc is None or st.num_records is None:
                return True
            return (st.num_records > nc) if node.negated else (nc > 0)
        return True
    if isinstance(node, In):
        if node.negated:
            return True  # conservatively keep (NOT IN with nulls is thorny)
        eq = lambda v: might_contain(Cmp("=", node.child, Lit(v)), st)  # noqa: E731
        return any(eq(v) for v in node.values if v is not None)
    if isinstance(node, Like):
        if node.negated or not isinstance(node.child, Col):
            return True
        # prefix pattern: 'abc%' (no other wildcards)
        m = re.fullmatch(r"([^%_]*)%", node.pattern)
        if not m:
            return True
        prefix = m.group(1)
        lo = st.min_values.get(node.child.name)
        hi = st.max_values.get(node.child.name)
        if lo is None or hi is None or not isinstance(lo, str) or not isinstance(hi, str):
            return True
        k = len(prefix)
        return lo[:k] <= prefix <= hi[:k]
    if isinstance(node, Cmp):
        return _might_cmp(node, st)
    if isinstance(node, Lit):
        return bool(node.value) if isinstance(node.value, bool) else True
    return True


def skipping_condition_sql(node, column_types: dict, partition_cols: set,
                           l2p: Optional[dict] = None,
                           stat_cols: Optional[set] = None) -> str:
    """Translate a skipping AST into a SQL *keep* condition over the
    `state_df` row shape — the DataSkippingReader.scala:656
    construct-the-filter-over-the-stats-DataFrame move, so pruning
    runs as a Catalyst filter on executors and the file list never
    lands on the driver.

    Row shape expected: `__s` = parsed stats struct (numRecords,
    minValues.*, maxValues.*, nullCount.*, keyed by PHYSICAL column
    names) and `partitionValues` map<string,string>. Semantics match
    `might_contain`: TRUE ⇔ the file might contain predicate-TRUE
    rows; every unknown (missing stats) resolves to keep."""
    l2p = l2p or {}

    def phys(c: str) -> str:
        return l2p.get(c, c)

    def bounds(c: str) -> tuple[str, str, str]:
        """(min_expr, max_expr, nullcount_expr) for a logical column.
        Raises UnsupportedPredicate for columns outside the stats
        struct (nested/binary types) — the caller's node resolves to
        keep."""
        if stat_cols is not None and c not in stat_cols and c not in partition_cols:
            raise UnsupportedPredicate(f"no stats column for {c!r}")
        if c in partition_cols:
            typ = column_types.get(c, "string")
            v = f"CAST(element_at(partitionValues, '{phys(c)}') AS {typ})"
            nc = (f"(CASE WHEN element_at(partitionValues, '{phys(c)}') IS NULL "
                  f"THEN __s.numRecords ELSE 0 END)")
            return v, v, nc
        p = phys(c)
        return (f"__s.minValues.`{p}`", f"__s.maxValues.`{p}`",
                f"__s.nullCount.`{p}`")

    def lit_sql(v) -> str:
        import datetime as _dt
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, _dt.datetime):
            return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
        if isinstance(v, _dt.date):
            return f"DATE '{v.isoformat()}'"
        if isinstance(v, str):
            esc = v.replace("'", "''")
            return f"'{esc}'"
        return repr(v)

    def keep(n) -> str:
        try:
            return _keep(n)
        except UnsupportedPredicate:
            return "TRUE"

    def _keep(n) -> str:
        if isinstance(n, And):
            return f"(({keep(n.left)}) AND ({keep(n.right)}))"
        if isinstance(n, Or):
            return f"(({keep(n.left)}) OR ({keep(n.right)}))"
        if isinstance(n, Not):
            try:
                return keep(_negate(n.child))
            except UnsupportedPredicate:
                return "TRUE"
        if isinstance(n, IsNull):
            if not isinstance(n.child, Col):
                return "TRUE"
            _, _, nc = bounds(n.child.name)
            if n.negated:
                return f"coalesce({nc} < __s.numRecords, TRUE)"
            return f"coalesce({nc} > 0, TRUE)"
        if isinstance(n, In):
            if n.negated or not isinstance(n.child, Col):
                return "TRUE"
            parts = [keep(Cmp("=", n.child, Lit(v)))
                     for v in n.values if v is not None]
            return "(" + " OR ".join(parts) + ")" if parts else "FALSE"
        if isinstance(n, Cmp):
            left, op, right = n.left, n.op, n.right
            if isinstance(left, Lit) and isinstance(right, Col):
                flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
                left, right = right, left
                op = flip.get(op, op)
            if not (isinstance(left, Col) and isinstance(right, Lit)):
                return "TRUE"
            if right.value is None:
                return "FALSE" if op != "<=>" else keep(IsNull(left))
            lo, hi, nc = bounds(left.name)
            v = lit_sql(right.value)
            # a comparison is never TRUE on NULLs: an all-null file is
            # provably skippable for every operator (matching
            # _might_cmp's _all_null guard)
            nn = f"NOT coalesce({nc} >= __s.numRecords, FALSE)"
            if op == "<":
                return f"(coalesce({lo} < {v}, TRUE) AND {nn})"
            if op == "<=":
                return f"(coalesce({lo} <= {v}, TRUE) AND {nn})"
            if op == ">":
                return f"(coalesce({hi} > {v}, TRUE) AND {nn})"
            if op == ">=":
                return f"(coalesce({hi} >= {v}, TRUE) AND {nn})"
            if op in ("=", "<=>"):
                return f"(coalesce({lo} <= {v} AND {hi} >= {v}, TRUE) AND {nn})"
            if op in ("!=", "<>"):
                # prune when every non-null row equals v (null rows
                # fail != anyway), or when the file is all-null
                return f"(NOT coalesce({lo} = {v} AND {hi} = {v}, FALSE) AND {nn})"
            return "TRUE"
        if isinstance(n, Like):
            if n.negated or not isinstance(n.child, Col):
                return "TRUE"
            m = re.fullmatch(r"([^%_]*)%", n.pattern)
            if not m:
                return "TRUE"
            prefix = m.group(1)
            lo, hi, _ = bounds(n.child.name)
            k = len(prefix)
            p = lit_sql(prefix)
            return (f"coalesce(substring({lo}, 1, {k}) <= {p} "
                    f"AND substring({hi}, 1, {k}) >= {p}, TRUE)")
        if isinstance(n, Lit):
            return "TRUE" if (not isinstance(n.value, bool) or n.value) else "FALSE"
        return "TRUE"

    return keep(node)


def _all_null(st: FileStatsView, name: str) -> bool:
    nc = st.null_count.get(name)
    return nc is not None and st.num_records is not None and nc >= st.num_records


def _might_cmp(node: Cmp, st: FileStatsView) -> bool:
    left, op, right = node.left, node.op, node.right
    # normalize to col OP lit
    if isinstance(left, Lit) and isinstance(right, Col):
        flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "!=": "!=", "<=>": "<=>"}
        left, right, op = right, left, flip[op]
    if not (isinstance(left, Col) and isinstance(right, Lit)):
        return True
    name, lit = left.name, right.value
    if op == "<=>" and lit is None:
        nc = st.null_count.get(name)
        return True if nc is None else nc > 0
    if lit is None:
        return False  # col OP NULL is never TRUE (except <=> handled above)
    if _all_null(st, name):
        return False
    lo = st.min_values.get(name)
    hi = st.max_values.get(name)
    if lo is None and hi is None:
        return True
    c_lo = cmp_values(lo, lit) if lo is not None else None
    c_hi = cmp_values(hi, lit) if hi is not None else None
    if op in ("=", "<=>"):
        if c_lo is not None and c_lo > 0:
            return False
        if c_hi is not None and c_hi < 0:
            return False
        return True
    if op == "!=":
        if c_lo is not None and c_hi is not None and c_lo == 0 and c_hi == 0:
            return False  # every row equals lit
        return True
    if op == "<":
        return c_lo is None or c_lo < 0
    if op == "<=":
        return c_lo is None or c_lo <= 0
    if op == ">":
        return c_hi is None or c_hi > 0
    if op == ">=":
        return c_hi is None or c_hi >= 0
    return True


def _negate(node):
    """Push NOT into the tree (De Morgan + comparison inversion).
    Where exact negation is impossible, return a node that evaluates
    conservatively (might_contain → True)."""
    if isinstance(node, Not):
        return node.child
    if isinstance(node, And):
        return Or(_negate(node.left), _negate(node.right))
    if isinstance(node, Or):
        return And(_negate(node.left), _negate(node.right))
    if isinstance(node, Cmp):
        inv = {"=": "!=", "!=": "=", "<": ">=", "<=": ">", ">": "<=", ">=": "<"}
        if node.op in inv:
            return Cmp(inv[node.op], node.left, node.right)
        return Lit(True)  # NOT (a <=> b) — keep
    if isinstance(node, IsNull):
        return IsNull(node.child, negated=not node.negated)
    if isinstance(node, In):
        return In(node.child, node.values, negated=not node.negated)
    if isinstance(node, Like):
        return Like(node.child, node.pattern, negated=not node.negated)
    return Lit(True)
