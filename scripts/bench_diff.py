#!/usr/bin/env python3
"""Per-query bench delta vs the previous round — the source of truth
for any performance claim in a commit message (copy-paste, don't
estimate).

Usage:
    python scripts/bench_diff.py [NEW.json [OLD.json]]

With no arguments, compares the newest BENCH_r*.json in the repo root
against the one before it. Accepts either the driver's wrapper format
({"parsed": {...}}) or the raw one-line bench.py output.
"""

import glob
import json
import os
import re
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # play nice with `| head`


def _load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    benches = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")),
                     key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    args = sys.argv[1:]
    new_path = args[0] if args else (benches[-1] if benches else None)
    old_path = args[1] if len(args) > 1 else \
        (benches[-2] if len(benches) > 1 else None)
    if not new_path:
        sys.exit("no BENCH_r*.json found and no paths given")
    new = _load(new_path)
    old = _load(old_path) if old_path else {"queries": {}}
    nq, oq = new.get("queries", {}), old.get("queries", {})

    print(f"# {os.path.basename(new_path)} vs "
          f"{os.path.basename(old_path) if old_path else '(none)'}")
    width = max(len(k) for k in nq) if nq else 10
    for k, v in nq.items():
        if k in oq and oq[k]:
            pct = 100.0 * (v - oq[k]) / oq[k]
            print(f"{k:<{width}}  {oq[k]:>8.3f} -> {v:>8.3f} s  "
                  f"({pct:+6.1f}%)")
        else:
            print(f"{k:<{width}}  {'new':>8} -> {v:>8.3f} s")
    gone = [k for k in oq if k not in nq]
    if gone:
        print("removed:", ", ".join(gone))
    for key in ("value", "bench_vs_parquet"):
        a, b = old.get(key), new.get(key)
        if b is not None:
            delta = f" ({100.0 * (b - a) / a:+.1f}%)" if a else ""
            print(f"{key}: {a} -> {b}{delta}")


if __name__ == "__main__":
    main()
