"""Mechanical audit of the 50-slot driver-window rotation (VERDICT r7
item 8).

The driver checks only the first 50 entries of ``__spark_entry__.queries()``
per round, so with a ~400-query surface the rotation policy (changed/added
first, then the never-checked backlog, then oldest-green) is what guarantees
every query periodically re-enters the official window.  Until now that
ledger existed only as COVERAGE.md prose; this tool reconstructs it from the
committed ``CORRECTNESS_r*.json`` artifacts themselves — query → every round
it held an official row, last official round, and the never-checked backlog
— and writes ``WINDOW_HISTORY.json`` so the rotation is auditable (and the
"oldest first" tier computable) mechanically.

Run in each round's closing sweep:  python tools/window_history.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    history: dict[str, list[int]] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
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

    from lvm_datapipe_spark.queries import ORACLE_SQL, QUERIES

    declared = sorted(QUERIES)
    never = [n for n in declared if not history.get(n)]
    last = {n: max(rs) for n, rs in history.items() if rs}
    stale = sorted(
        (n for n in declared if n in last), key=lambda n: (last[n], n)
    )

    out = {
        "rounds_seen": sorted(rounds),
        "declared_queries": len(declared),
        "oracle_paired": sum(1 for n in declared if n in ORACLE_SQL),
        "official_rounds": {n: history.get(n, []) for n in declared},
        "last_official": {n: last[n] for n in sorted(last)},
        "never_checked": never,
        "oldest_green_first": stale[:60],
        "note": (
            "last_official = latest round with a green driver row "
            "(CORRECTNESS_r*.json). never_checked queries are covered by "
            "the committed CORRECTNESS_LOCAL_r*.json full sweeps and are "
            "tier-2 candidates for the next window; oldest_green_first "
            "feeds tier-4 of the rotation documented in __spark_entry__.py."
        ),
    }
    dest = os.path.join(REPO, "WINDOW_HISTORY.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(
        f"{len(declared)} declared; {len(last)} have held an official row; "
        f"{len(never)} never checked; wrote WINDOW_HISTORY.json"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
