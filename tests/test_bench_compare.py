"""Unit tests for tools/bench_compare.py — the per-query regression gate.

The r10 addition is the re-point mechanism (VERDICT r9 item 2):
``dedup_embedding_cosine``'s plan was deliberately replaced in r5
(brute-force cosine → adaptive LSH, the scale-correct path), so its
operative baseline is the r5 debut row, not the r1 slot the old plan
measured.  bench.py publishes ``REPOINTS`` in its JSON line and
``--use-repoints`` applies them only when the old row PREDATES the
re-point — these tests pin both directions plus the inertness.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "bench_compare", os.path.join(REPO, "tools", "bench_compare.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


BC = _load_tool()

_REPOINT = {
    "dedup_embedding_cosine": {
        "baseline_sec": 3.0,
        "baseline_round": 5,
        "reason": "test",
    }
}


def test_repoint_applies_against_pre_repoint_row():
    """Old row 1.16 (the r1 brute-force plan) vs new 2.4: 2.07x raw, but
    against the 3.0 re-point baseline it is 0.8x — not a regression."""
    old = {"queries": {"dedup_embedding_cosine": 1.16}}
    new = {
        "queries": {"dedup_embedding_cosine": 2.4},
        "repoints": _REPOINT,
    }
    _, reg_raw = BC.compare(old, new, 2.0)
    assert [r[0] for r in reg_raw] == ["dedup_embedding_cosine"]
    _, reg = BC.compare(old, new, 2.0, use_repoints=True)
    assert reg == []


def test_repoint_inert_for_post_repoint_rows():
    """An old row AT/after the re-point (3.2 > 3.0 baseline) is the real
    comparison — a genuine 2x regression from there must still flag."""
    old = {"queries": {"dedup_embedding_cosine": 3.2}}
    new = {
        "queries": {"dedup_embedding_cosine": 7.0},
        "repoints": _REPOINT,
    }
    _, reg = BC.compare(old, new, 2.0, use_repoints=True)
    assert [r[0] for r in reg] == ["dedup_embedding_cosine"]


def test_repoint_never_hides_a_regression_past_its_own_baseline():
    """Even from a pre-re-point old row, a new time above threshold x the
    re-point baseline still flags (the re-point is a baseline, not an
    exemption — unlike --allow)."""
    old = {"queries": {"dedup_embedding_cosine": 1.16}}
    new = {
        "queries": {"dedup_embedding_cosine": 9.5},
        "repoints": _REPOINT,
    }
    _, reg = BC.compare(old, new, 2.0, use_repoints=True)
    assert [r[0] for r in reg] == ["dedup_embedding_cosine"]


def test_bench_py_repoints_match_committed_debut_row():
    """bench.py's published re-point row must equal the committed debut
    artifact (BENCH_r05.json) — a hand-drifted baseline would un-gate the
    query silently."""
    sys.path.insert(0, REPO)
    import bench

    with open(os.path.join(REPO, "BENCH_r05.json")) as f:
        r5 = json.load(f)
    debut = r5["parsed"]["queries"]["dedup_embedding_cosine"]
    rp = bench.REPOINTS["dedup_embedding_cosine"]
    assert rp["baseline_sec"] == debut
    assert rp["baseline_round"] == 5
    # and the r10+ reading is green against it with real artifacts:
    with open(os.path.join(REPO, "BENCH_r09.json")) as f:
        r9 = json.load(f)
    assert (
        r9["parsed"]["queries"]["dedup_embedding_cosine"]
        < 2.0 * rp["baseline_sec"]
    )
