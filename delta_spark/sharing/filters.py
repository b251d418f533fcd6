"""Delta Sharing json predicate hints — build, parse, and evaluate.

The sharing protocol ships filters server-side as a small JSON op tree
(delta-sharing PROTOCOL.md "JSON predicates"; evaluated by the server
for file skipping). Two dialects share one tree shape:

- V1 hints cover partition columns only; the server evaluates a leaf
  against the file's ``partitionValues``.
- V2 hints may also reference data columns; the server evaluates those
  against the per-file min/max/nullCount stats as an interval check.

Semantics mirror the reference client's conversion
(sharing/.../DeltaSharingJsonPredicates.scala:46) and the sharing
server's evaluator: the hint is ADVISORY. Any unknown op, missing
value, or type-coercion failure makes the subtree evaluate to
"unknown", and unknown keeps the file — skipping is only ever an
optimization, never a correctness dependency, because the client
re-applies every filter after the scan.

Tree shape (all values are strings on the wire):
    {"op":"and","children":[
      {"op":"equal","children":[
        {"op":"column","name":"r_name","valueType":"string"},
        {"op":"literal","value":"EUROPE","valueType":"string"}]}]}

Ops: column, literal (leaves); isNull, not (unary); and, or (n-ary);
equal, lessThan, lessThanOrEqual, greaterThan, greaterThanOrEqual
(binary comparisons over one column leaf and one literal leaf).
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Optional

from pyspark.sql import types as T

from delta_spark import predicates as P

# wire valueType -> python coercion for comparison
_VALUE_TYPES = {
    "bool", "int", "long", "string", "date", "float", "double",
    "timestamp",
}

# guard against hostile / runaway trees, matching the reference client's
# maxTreeDepth conf (delta-sharing client ConfUtils).
MAX_TREE_DEPTH = 100

_SPARK_TO_VALUE_TYPE = {
    "boolean": "bool",
    "byte": "int",
    "short": "int",
    "integer": "int",
    "long": "long",
    "string": "string",
    "date": "date",
    "float": "float",
    "double": "double",
    "timestamp": "timestamp",
}


class PredicateHintError(ValueError):
    """A malformed json predicate hint (bad op, depth, or arity)."""


def _coerce(value: str, value_type: str):
    """Coerce a wire string to a comparable python value, or raise."""
    if value is None:
        raise PredicateHintError("null literal value")
    if value_type == "bool":
        low = value.lower()
        if low in ("true", "1"):
            return True
        if low in ("false", "0"):
            return False
        raise PredicateHintError(f"bad bool literal {value!r}")
    if value_type in ("int", "long"):
        return int(value)
    if value_type in ("float", "double"):
        return float(value)
    if value_type == "string":
        return value
    if value_type == "date":
        return _dt.date.fromisoformat(value)
    if value_type == "timestamp":
        # Accept both ISO ("2022-01-01 00:00:00[.ffffff][+00:00]") and
        # the 'T' separator; normalize zulu suffix.
        raw = value.replace("T", " ").replace("Z", "+00:00")
        ts = _dt.datetime.fromisoformat(raw)
        if ts.tzinfo is not None:
            ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return ts
    raise PredicateHintError(f"unknown valueType {value_type!r}")


# ------------------------------------------------------------ parsing ----


def parse_hints(hints_json: str) -> dict:
    """Parse + structurally validate a json predicate hint string.

    Returns the validated op-tree dict. Raises PredicateHintError on a
    malformed tree — the SERVER catches this and degrades to
    no-skipping (advisory semantics), it never fails the query.
    """
    try:
        tree = json.loads(hints_json)
    except (ValueError, TypeError) as e:
        raise PredicateHintError(f"unparseable hint: {e}") from e
    _validate(tree, depth=0)
    return tree


def _validate(node, depth: int) -> None:
    if depth > MAX_TREE_DEPTH:
        raise PredicateHintError("predicate tree too deep")
    if not isinstance(node, dict) or "op" not in node:
        raise PredicateHintError(f"bad node {node!r}")
    op = node["op"]
    kids = node.get("children", [])
    if op == "column":
        if not node.get("name") or node.get("valueType") not in _VALUE_TYPES:
            raise PredicateHintError(f"bad column leaf {node!r}")
        return
    if op == "literal":
        if "value" not in node or node.get("valueType") not in _VALUE_TYPES:
            raise PredicateHintError(f"bad literal leaf {node!r}")
        return
    if op in ("and", "or"):
        if not kids:
            raise PredicateHintError(f"{op} with no children")
    elif op in ("not", "isNull"):
        if len(kids) != 1:
            raise PredicateHintError(f"{op} expects 1 child")
    elif op in ("equal", "lessThan", "lessThanOrEqual", "greaterThan",
                "greaterThanOrEqual"):
        if len(kids) != 2:
            raise PredicateHintError(f"{op} expects 2 children")
    else:
        raise PredicateHintError(f"unknown op {op!r}")
    for k in kids:
        _validate(k, depth + 1)


# --------------------------------------------------------- evaluation ----


def _split_cmp(node) -> tuple[str, str, object, bool]:
    """Return (column_name, value_type, literal_value, flipped) for a
    comparison node, regardless of (col, lit) vs (lit, col) child order
    (the sharing filter model allows either)."""
    a, b = node["children"]
    if a["op"] == "column" and b["op"] == "literal":
        col, lit, flipped = a, b, False
    elif a["op"] == "literal" and b["op"] == "column":
        col, lit, flipped = b, a, True
    else:
        raise PredicateHintError("comparison needs one column and one literal")
    vt = col["valueType"]
    return col["name"], vt, _coerce(lit["value"], vt), flipped


_FLIP = {"lessThan": "greaterThan", "greaterThan": "lessThan",
         "lessThanOrEqual": "greaterThanOrEqual",
         "greaterThanOrEqual": "lessThanOrEqual"}


def eval_partition(node, part_values: dict) -> Optional[bool]:
    """Three-valued evaluation against a file's partitionValues.

    Returns True / False / None (unknown). The caller keeps the file
    unless the result is exactly False.
    """
    op = node["op"]
    if op == "and":
        res = [eval_partition(k, part_values) for k in node["children"]]
        if any(r is False for r in res):
            return False
        if all(r is True for r in res):
            return True
        return None
    if op == "or":
        res = [eval_partition(k, part_values) for k in node["children"]]
        if any(r is True for r in res):
            return True
        if all(r is False for r in res):
            return False
        return None
    if op == "not":
        r = eval_partition(node["children"][0], part_values)
        return None if r is None else (not r)
    if op == "isNull":
        child = node["children"][0]
        if child["op"] != "column":
            return None
        if child["name"] not in part_values:
            return None  # not a partition column here -> unknown
        return part_values.get(child["name"]) is None
    if op in ("equal", "lessThan", "lessThanOrEqual", "greaterThan",
              "greaterThanOrEqual"):
        try:
            name, vt, lit, flipped = _split_cmp(node)
        except PredicateHintError:
            return None
        if name not in part_values:
            return None
        raw = part_values.get(name)
        if raw is None:
            return None  # SQL null comparison -> unknown
        try:
            val = _coerce(raw, vt)
        except (PredicateHintError, ValueError):
            return None
        cmp_op = _FLIP[op] if (flipped and op in _FLIP) else op
        if cmp_op == "equal":
            return val == lit
        if cmp_op == "lessThan":
            return val < lit
        if cmp_op == "lessThanOrEqual":
            return val <= lit
        if cmp_op == "greaterThan":
            return val > lit
        return val >= lit
    return None


def eval_stats(node, stats: Optional[dict]) -> Optional[bool]:
    """Three-valued MAY-MATCH evaluation against a file's stats blob
    ({"numRecords","minValues","maxValues","nullCount"}).

    True means some row may satisfy the predicate, False means no row
    can (safe to skip), None means unknown (keep). This is interval
    logic over [min, max] — identical in spirit to the engine's own
    stats-based skipping, applied server-side.
    """
    if not stats:
        return None
    op = node["op"]
    if op == "and":
        res = [eval_stats(k, stats) for k in node["children"]]
        if any(r is False for r in res):
            return False
        if all(r is True for r in res):
            return True
        return None
    if op == "or":
        res = [eval_stats(k, stats) for k in node["children"]]
        if any(r is True for r in res):
            return True
        if all(r is False for r in res):
            return False
        return None
    if op == "not":
        # Interval logic is may-match: not(child-may-match) says nothing
        # about whether any row matches the negation, so always unknown.
        return None
    if op == "isNull":
        child = node["children"][0]
        if child["op"] != "column":
            return None
        nc = (stats.get("nullCount") or {}).get(child["name"])
        if nc is None:
            return None
        return None if int(nc) > 0 else False
    if op in ("equal", "lessThan", "lessThanOrEqual", "greaterThan",
              "greaterThanOrEqual"):
        try:
            name, vt, lit, flipped = _split_cmp(node)
        except PredicateHintError:
            return None
        mins = stats.get("minValues") or {}
        maxs = stats.get("maxValues") or {}
        if name not in mins or name not in maxs:
            return None
        try:
            lo = _coerce(_as_wire_str(mins[name]), vt)
            hi = _coerce(_as_wire_str(maxs[name]), vt)
        except (PredicateHintError, ValueError):
            return None
        cmp_op = _FLIP[op] if (flipped and op in _FLIP) else op
        if cmp_op == "equal":
            return False if (lit < lo or lit > hi) else None
        if cmp_op == "lessThan":
            return False if not (lo < lit) else None
        if cmp_op == "lessThanOrEqual":
            return False if not (lo <= lit) else None
        if cmp_op == "greaterThan":
            return False if not (hi > lit) else None
        return False if not (hi >= lit) else None
    return None


def _as_wire_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def file_survives(tree: Optional[dict], part_values: dict,
                  stats: Optional[dict]) -> bool:
    """Server-side skip decision for one file: keep unless the hint
    definitively excludes it via partition values or stats."""
    if tree is None:
        return True
    if eval_partition(tree, part_values) is False:
        return False
    if eval_stats(tree, stats) is False:
        return False
    return True


# -------------------------------------------- client-side conversion ----


def _value_type_for(dt: T.DataType) -> Optional[str]:
    return _SPARK_TO_VALUE_TYPE.get(dt.typeName())


def _lit_wire(value, value_type: str) -> Optional[str]:
    if value is None:
        return None
    if value_type == "bool":
        return "true" if value else "false"
    return str(value)


def hints_from_predicate(condition: str, schema: T.StructType,
                         partition_columns: list[str],
                         include_data_filters: bool = False
                         ) -> Optional[str]:
    """Convert a SQL predicate string into a json predicate hint.

    Mirrors DeltaSharingJsonPredicates.convert
    (sharing/.../DeltaSharingJsonPredicates.scala:60): partition-column
    conjuncts always convert; conjuncts touching data columns convert
    only when ``include_data_filters`` (the V2 gate, default off like
    the reference's jsonPredicateV2Hints.enabled). Any non-convertible
    conjunct is dropped (best-effort — the caller re-filters anyway);
    returns None when nothing converts.
    """
    try:
        ast = P.parse_predicate(condition)
    except Exception:
        return None
    part = {c.lower() for c in partition_columns}
    fields = {f.name.lower(): f for f in schema.fields}
    converted = []
    for conj in _conjuncts(ast):
        refs = {r.lower() for r in _refs(conj)}
        if not refs:
            continue
        is_partition = refs and refs.issubset(part)
        if not is_partition and not include_data_filters:
            continue
        node = _to_hint(conj, fields)
        if node is not None:
            converted.append(node)
    if not converted:
        return None
    tree = converted[0] if len(converted) == 1 else {
        "op": "and", "children": converted}
    return json.dumps(tree)


def _conjuncts(node):
    if isinstance(node, P.And):
        return _conjuncts(node.left) + _conjuncts(node.right)
    return [node]


def _refs(node) -> list[str]:
    if isinstance(node, P.Col):
        return [node.name]
    out = []
    for attr in ("left", "right", "child", "col", "operand"):
        v = getattr(node, attr, None)
        if v is not None and not isinstance(v, (str, int, float, bool, list)):
            out.extend(_refs(v))
    return out


_CMP_OPS = {"=": "equal", "==": "equal", "<": "lessThan",
            "<=": "lessThanOrEqual", ">": "greaterThan",
            ">=": "greaterThanOrEqual"}


def _to_hint(node, fields: dict) -> Optional[dict]:
    if isinstance(node, P.And):
        l, r = _to_hint(node.left, fields), _to_hint(node.right, fields)
        if l is None or r is None:
            return None
        return {"op": "and", "children": [l, r]}
    if isinstance(node, P.Or):
        l, r = _to_hint(node.left, fields), _to_hint(node.right, fields)
        if l is None or r is None:
            return None
        return {"op": "or", "children": [l, r]}
    if isinstance(node, P.Not):
        c = _to_hint(node.child, fields)
        return None if c is None else {"op": "not", "children": [c]}
    if isinstance(node, P.IsNull):
        col = _col_leaf(node.child, fields)
        if col is None:
            return None
        is_null = {"op": "isNull", "children": [col]}
        return {"op": "not", "children": [is_null]} if node.negated else is_null
    if isinstance(node, P.In) and not node.negated:
        # No native "in" op in the hint grammar — expand to or(equal…),
        # same shape OpConverter produces for expr.In.
        col = _col_leaf(node.child, fields)
        if col is None:
            return None
        legs = []
        for v in node.values:
            val = v.value if isinstance(v, P.Lit) else v
            wire = _lit_wire(val, col["valueType"])
            if wire is None:
                return None
            legs.append({"op": "equal", "children": [
                col, {"op": "literal", "value": wire,
                      "valueType": col["valueType"]}]})
        if not legs:
            return None
        return legs[0] if len(legs) == 1 else {"op": "or", "children": legs}
    if isinstance(node, P.Cmp):
        wire_op = _CMP_OPS.get(node.op)
        if wire_op is None:
            return None
        if isinstance(node.left, P.Col) and isinstance(node.right, P.Lit):
            col_n, lit_n = node.left, node.right
        elif isinstance(node.left, P.Lit) and isinstance(node.right, P.Col):
            col_n, lit_n = node.right, node.left
            wire_op = _FLIP.get(wire_op, wire_op)
        else:
            return None
        col = _col_leaf(col_n, fields)
        if col is None:
            return None
        wire = _lit_wire(lit_n.value, col["valueType"])
        if wire is None:
            return None
        return {"op": wire_op, "children": [
            col, {"op": "literal", "value": wire,
                  "valueType": col["valueType"]}]}
    # In / Like / anything else: not representable; drop (advisory).
    return None


def _col_leaf(node, fields: dict) -> Optional[dict]:
    if not isinstance(node, P.Col):
        return None
    f = fields.get(node.name.lower())
    if f is None or "." in node.name:
        return None  # nested columns are not representable in hints
    vt = _value_type_for(f.dataType)
    if vt is None:
        return None
    return {"op": "column", "name": f.name, "valueType": vt}
