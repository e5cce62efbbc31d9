"""Honesty guards for the rotation ledger (r8 verdict item 8).

The r5/r6 rows of COVERAGE.md's rotation table claimed "29/17 oldest-row
veterans" were driver-re-checked; the committed CORRECTNESS_r05/r06.json
artifacts contained 4 and 0 such queries.  These tests make that class of
prose drift impossible to recommit:

* every exact query name the rotation table's "Driver-checked" column
  claims for round N must actually appear in CORRECTNESS_rN.json;
* the committed WINDOW_HISTORY.json must be the mechanical rebuild of the
  committed CORRECTNESS_r*.json artifacts (same never_checked set and
  last_official map), so the ledger the tiers draw from cannot go stale.

Both tests are pure file reads — no SparkSession.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _official_history(max_round: int | None = None) -> dict[str, list[int]]:
    """Rebuild query -> green official rounds from committed artifacts
    (same predicate as tools/window_history.py).  ``max_round`` bounds the
    rebuild: rounds above it are ignored, so a driver artifact that lands
    AFTER the ledger was last regenerated (the r9 sequencing failure —
    VERDICT r9 "What's wrong" #1) cannot redden the guard."""
    history: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        with open(path) as f:
            rows = json.load(f)
        for name, rec in rows.items():
            ok = (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("hash_match", True) in (True, None)
                and not rec.get("err")
            )
            history.setdefault(name, [])
            if ok:
                history[name].append(rnd)
    return history


def _declared_names() -> set[str]:
    from lvm_datapipe_spark.queries import QUERIES

    return set(QUERIES)


def test_coverage_rotation_rows_match_artifacts():
    """Every backticked DECLARED-QUERY name in a rotation-table row's
    "Driver-checked" column must hold a row in that round's committed
    CORRECTNESS artifact.  Only exact declared-name matches count as
    claims (prose families like `asof_*` or "a5-a8" are not parseable
    and not asserted)."""
    declared = _declared_names()
    history = _official_history()
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        text = f.read()
    # the rotation table: rows starting "| rN |" with 3 columns
    rows = re.findall(r"^\| (r[\d-]+) \|(.*?)\|(.*?)\|$", text, re.M)
    assert rows, "rotation table not found in COVERAGE.md"
    problems = []
    for rnd_label, driver_col, _local_col in rows:
        m = re.fullmatch(r"r(\d+)", rnd_label)
        if not m:  # the r1-r3 aggregate row — spot-check not applicable
            continue
        rnd = int(m.group(1))
        claimed = {
            n
            for n in re.findall(r"`([a-z0-9_]+)`", driver_col)
            if n in declared
        }
        for name in sorted(claimed):
            if rnd not in history.get(name, []):
                problems.append(f"{rnd_label}: `{name}` not in artifact")
    assert not problems, (
        "COVERAGE.md rotation table claims driver rows the committed "
        f"CORRECTNESS artifacts do not contain: {problems}"
    )


def test_window_history_json_is_mechanical_rebuild():
    """WINDOW_HISTORY.json (the file the rotation tiers draw from) must
    equal the rebuild from committed artifacts — a stale or hand-edited
    ledger would silently misdirect tier 2/4 slot picks.

    The rebuild is bounded at max(rounds_seen) recorded IN the ledger:
    the driver writes CORRECTNESS_r{N}.json after the builder's final
    commit, so an unbounded rebuild would fail at the start of every
    round through no fault of the tree (VERDICT r9 item 1).  A ledger
    that ignores an artifact it HAS seen is still caught (rounds_seen
    pins which artifacts it claims to cover), and the start-of-round
    regeneration folds new rounds in."""
    with open(os.path.join(REPO, "WINDOW_HISTORY.json")) as f:
        committed = json.load(f)
    assert committed.get("rounds_seen"), "ledger missing rounds_seen"
    history = _official_history(max_round=max(committed["rounds_seen"]))
    declared = _declared_names()
    # mirrors tools/window_history.py exactly: last_official keeps names
    # that have since left the declared surface (their history is real)
    last = {n: max(rs) for n, rs in history.items() if rs}
    never = sorted(n for n in declared if not history.get(n))
    assert committed["last_official"] == {
        n: last[n] for n in sorted(last)
    }, "WINDOW_HISTORY.last_official is stale — rerun tools/window_history.py"
    assert committed["never_checked"] == never, (
        "WINDOW_HISTORY.never_checked is stale — rerun tools/window_history.py"
    )
    assert committed["declared_queries"] == len(declared)
