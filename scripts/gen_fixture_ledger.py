#!/usr/bin/env python3
"""Generate the reference-fixture consumption ledger into FIXTURES.md.

Enumerates EVERY Delta table under the reference's two fixture corpora
(connectors/golden-tables/src/main/resources/golden and
spark/src/test/resources/delta), marks each as consumed (its name is
referenced by a test under tests/) or skipped (explicit reason in
SKIPS), and rewrites the marked ledger section of FIXTURES.md.
tests/test_fixture_ledger.py enforces that the ledger stays complete:
a new reference fixture or a retired test shows up as a failure, never
as a silent skip.

Run:  python scripts/gen_fixture_ledger.py
"""

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = "/root/reference/connectors/golden-tables/src/main/resources/golden"
SPARK_RES = "/root/reference/spark/src/test/resources/delta"

BEGIN = "<!-- BEGIN GENERATED FIXTURE LEDGER -->"
END = "<!-- END GENERATED FIXTURE LEDGER -->"

# fixtures we deliberately do NOT consume, each with its blocker
SKIPS = {
    "parquet-decimal-dictionaries-v1":
        "log-only in the reference repo: its data file was never "
        "committed, so no engine can read it (the -v2 twin is "
        "value-parity-gated)",
}


def fixture_tables(root):
    """Every Delta table (dir containing _delta_log) directly under
    `root`, one level of nesting deep (tz-named dirs, hive/), plus
    non-table fixtures (e.g. no-delta-log-folder) as themselves."""
    out = []
    for n in sorted(os.listdir(root)):
        p = os.path.join(root, n)
        if not os.path.isdir(p):
            continue
        if os.path.isdir(os.path.join(p, "_delta_log")):
            out.append(n)
            continue
        nested = [f"{n}/{s}" for s in sorted(os.listdir(p))
                  if os.path.isdir(os.path.join(p, s, "_delta_log"))]
        out.extend(nested if nested else [n])
    return out


def consumed_names(tests_text):
    def is_consumed(name):
        base = os.path.basename(name)
        pat = re.compile(r"(?<![\w-])" + re.escape(base) + r"(?![\w-])")
        if pat.search(tests_text):
            return True
        # f-string templates: a test building the name as
        # f"...-missing-{missing}" consumes every fixture sharing the
        # literal prefix up to the hole
        parts = base.split("-")
        for i in range(1, len(parts)):
            prefix = "-".join(parts[:i]) + "-"
            if re.search(re.escape(prefix) + r"\{", tests_text):
                return True
        return False
    return is_consumed


def build_ledger():
    tests_text = "".join(
        open(f).read() for f in glob.glob(os.path.join(REPO, "tests/*.py")))
    is_consumed = consumed_names(tests_text)
    rows = []
    problems = []
    for root, label in ((GOLDEN, "golden"), (SPARK_RES, "spark-test")):
        if not os.path.isdir(root):
            continue
        for name in fixture_tables(root):
            if name in SKIPS or os.path.basename(name) in SKIPS:
                reason = SKIPS.get(name) or SKIPS[os.path.basename(name)]
                rows.append((label, name, "skipped", reason))
            elif is_consumed(name):
                rows.append((label, name, "consumed", ""))
            else:
                rows.append((label, name, "UNCONSUMED", ""))
                problems.append(f"{label}/{name}")
    return rows, problems


def render(rows):
    n_c = sum(1 for r in rows if r[2] == "consumed")
    n_s = sum(1 for r in rows if r[2] == "skipped")
    lines = [
        BEGIN,
        "",
        "## Reference-fixture consumption ledger (generated — run "
        "`python scripts/gen_fixture_ledger.py`)",
        "",
        f"Every Delta table under the reference's `golden/` corpus and "
        f"`spark/src/test/resources/delta`: **{n_c} consumed** by a "
        f"test in `tests/`, **{n_s} skipped** (each with its blocker). "
        "`tests/test_fixture_ledger.py` fails on any fixture that is "
        "neither.",
        "",
        "| corpus | fixture | status | skip reason |",
        "|---|---|---|---|",
    ]
    for label, name, status, reason in rows:
        lines.append(f"| {label} | `{name}` | {status} | {reason} |")
    lines += ["", END]
    return "\n".join(lines)


def main():
    rows, problems = build_ledger()
    if problems:
        raise SystemExit(
            "UNCONSUMED fixtures (consume them or add a SKIPS reason):\n  "
            + "\n  ".join(problems))
    path = os.path.join(REPO, "FIXTURES.md")
    text = open(path).read()
    block = render(rows)
    if BEGIN in text:
        pre = text.split(BEGIN)[0]
        post = text.split(END)[1]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    open(path, "w").write(text)
    print(f"ledger: {len(rows)} fixtures "
          f"({sum(1 for r in rows if r[2] == 'consumed')} consumed, "
          f"{sum(1 for r in rows if r[2] == 'skipped')} skipped)")


if __name__ == "__main__":
    main()
