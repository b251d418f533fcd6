"""Regenerate BENCH_FLOOR.json under the RATCHET rule (VERDICT r9 #2).

The floor file is what bench.py's self-policing compares against, and
it is produced by the same pipeline it polices — so regeneration must
never be able to WEAKEN the check silently. The rule:

    new_floor[row] = min(fresh_min[row], committed_floor[row])

i.e. floors only ratchet DOWN. A fresh measurement can tighten a floor
(the machine was quieter / the code got faster) but never loosen one —
a contaminated regeneration run can only make the policing stricter,
not blind it. The single exception is a row whose SEMANTICS changed
(the query does different work now): pass it via --semantics-changed
and it resets to the fresh value, and the file records it in a
`semantics_changed` list so the next auditor sees exactly which rows
escaped the ratchet and why.

Input artifacts must be canary-clean (`noisy: false`) with empty
`suspect_rows`; a polluted run is refused outright. Rows present in
the committed file but absent from every input keep their committed
floor (retiring a row means deleting it here, visibly, in the diff).

Usage:
    python scripts/regen_floor.py BENCH_fresh.json [more.json ...] \
        [--semantics-changed row_a,row_b --reason "..."]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR_PATH = os.path.join(REPO, "BENCH_FLOOR.json")


def ratchet(committed: dict[str, float], fresh: dict[str, float],
            semantics_changed: set[str] | None = None) -> dict[str, float]:
    """min(fresh, committed) per row; `semantics_changed` rows reset to
    the fresh value; rows only in one source carry over unchanged."""
    semantics_changed = semantics_changed or set()
    out = dict(committed)
    for row, v in fresh.items():
        if row in semantics_changed or row not in committed:
            out[row] = v
        else:
            out[row] = min(v, committed[row])
    return out


def load_clean_mins(path: str) -> dict[str, float]:
    """queries_min of a bench artifact, refusing polluted runs."""
    with open(path) as fh:
        art = json.load(fh)
    if art.get("noisy"):
        raise SystemExit(f"{path}: stamped noisy — not floor evidence")
    if art.get("suspect_rows"):
        raise SystemExit(f"{path}: suspect_rows={art['suspect_rows']} — "
                         "not floor evidence")
    mins = art.get("queries_min") or {}
    if not mins:
        raise SystemExit(f"{path}: no queries_min")
    return {k: float(v) for k, v in mins.items()}


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("artifacts", nargs="+")
    ap.add_argument("--semantics-changed", default="",
                    help="comma-separated rows allowed to RESET (not "
                         "ratchet) because their query changed meaning")
    ap.add_argument("--reason", default="",
                    help="required with --semantics-changed: why")
    args = ap.parse_args(argv)

    changed = {r for r in args.semantics_changed.split(",") if r}
    if changed and not args.reason:
        raise SystemExit("--semantics-changed requires --reason")

    fresh: dict[str, float] = {}
    for p in args.artifacts:
        for row, v in load_clean_mins(p).items():
            fresh[row] = min(v, fresh.get(row, v))

    # a typo'd row name would silently ratchet the real row (keeping a
    # stale floor that flags it suspect forever) while the ledger
    # claims the reset happened — refuse unknown names outright
    unknown = changed - set(fresh)
    if unknown:
        raise SystemExit(
            f"--semantics-changed rows not present in any input "
            f"artifact: {sorted(unknown)} (known: {sorted(fresh)})")

    committed: dict[str, float] = {}
    sf = None
    try:
        with open(FLOOR_PATH) as fh:
            prev = json.load(fh)
        committed = {k: float(v) for k, v in prev.get("floors", {}).items()}
        sf = prev.get("sf")
    except (OSError, ValueError):
        pass

    floors = ratchet(committed, fresh, changed)
    out = {
        "sf": sf if sf is not None else 0.1,
        "note": ("per-row quiet-machine floors; regenerated ONLY via "
                 "scripts/regen_floor.py, which ratchets floors DOWN "
                 "(min with the committed file) so a contaminated "
                 "regeneration can tighten but never weaken the "
                 "self-policing. Rows in semantics_changed reset to "
                 "fresh evidence instead — each needs a reason."),
        "semantics_changed": (
            {r: args.reason for r in sorted(changed)} if changed else {}),
        "floors": {k: round(v, 3) for k, v in sorted(floors.items())},
    }
    with open(FLOOR_PATH, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    loosened = [r for r in changed
                if r in committed and floors.get(r, 0) > committed[r]]
    print(f"wrote {FLOOR_PATH}: {len(floors)} rows, "
          f"{len(changed)} semantics resets"
          + (f" (loosened: {loosened})" if loosened else ""))


if __name__ == "__main__":
    main(sys.argv[1:])
