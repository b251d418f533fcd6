"""BENCH_FLOOR.json regeneration ratchet (VERDICT r9 #2): floors may
only move DOWN across regenerations — the file polices the bench and
is produced by it, so a loosening regeneration would weaken the check
silently. Pure-python tests (no Spark)."""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "regen_floor", os.path.join(REPO, "scripts", "regen_floor.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_ratchet_only_tightens():
    m = _mod()
    committed = {"a": 1.0, "b": 2.0, "retired": 9.0}
    fresh = {"a": 0.5, "b": 5.0, "new_row": 3.0}
    out = m.ratchet(committed, fresh)
    assert out == {"a": 0.5,         # tightened
                   "b": 2.0,         # fresh slower -> committed wins
                   "retired": 9.0,   # absent from fresh -> carried
                   "new_row": 3.0}   # new rows enter at evidence


def test_ratchet_semantics_reset_is_explicit():
    m = _mod()
    out = m.ratchet({"b": 2.0}, {"b": 5.0}, semantics_changed={"b"})
    assert out == {"b": 5.0}         # reset allowed ONLY when declared


def test_polluted_artifacts_refused(tmp_path):
    m = _mod()
    noisy = tmp_path / "noisy.json"
    noisy.write_text(json.dumps(
        {"noisy": True, "queries_min": {"a": 1}, "suspect_rows": []}))
    with pytest.raises(SystemExit, match="noisy"):
        m.load_clean_mins(str(noisy))
    sus = tmp_path / "sus.json"
    sus.write_text(json.dumps(
        {"noisy": False, "queries_min": {"a": 1}, "suspect_rows": ["a"]}))
    with pytest.raises(SystemExit, match="suspect_rows"):
        m.load_clean_mins(str(sus))


def test_committed_floor_file_declares_ratchet():
    """The committed file must carry the regeneration rule so a future
    round can't 'forget' it: regen_floor.py writes the note and the
    semantics_changed ledger."""
    with open(os.path.join(REPO, "BENCH_FLOOR.json")) as fh:
        fl = json.load(fh)
    assert "ratchet" in fl.get("note", "").lower() or \
        "regen_floor" in fl.get("note", "")
    assert "semantics_changed" in fl
    assert fl["floors"]
