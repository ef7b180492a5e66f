"""Recount the driver-window rotation invariant from the
CORRECTNESS_r*.json history — the arithmetic that broke silently in
r8 and nearly again in r9 (both times a pre-draft dropped stale
queries that a by-hand recount missed; both verdicts demanded the
recount be done BY SCRIPT at round start; this is that script,
persisted instead of re-improvised each round).

For every registered query it derives the last round with a green
driver row (rows+schema+hash all true), then reports:

- the staleness distribution (how many queries last-green per round);
- the block that goes 3-rounds-stale NEXT round (rule-3 head — these
  MUST fill the next window's re-entry slots);
- any query >3 rounds stale at the CURRENT round (invariant
  VIOLATION — the r8 failure mode; exactly 3 rounds stale is the
  rule-3 must-re-enter block, not a violation — ROTATION.md);
- never-checked registrations (rule-1 head);
- how many genuinely free slots the next window has after rule 3;
- a CEILING check (r11 verdict #2): the ≤3-round staleness invariant
  gives every registered query one slot per 3 consecutive rounds, so
  3 × 50 = 150 registered queries is the hard cap — past it the
  invariant is arithmetically unsatisfiable and the script FAILS
  before the violation can materialize. New registrations beyond the
  cap require RETIRING queries first (ROTATION.md RETIREMENT).

Usage:
    python tools/rotation_recount.py [CURRENT_ROUND]
CURRENT_ROUND defaults to the highest CORRECTNESS round found + 1
(i.e. "we are building the window for the round whose driver check
has not landed yet").
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
# 3-round staleness x 50 slots: the arithmetic registration ceiling
# (r11 verdict #2). rotation_recount FAILS past it — at CEILING+1 the
# invariant cannot be satisfied by any window schedule, so the error
# must fire at registration time, not two rounds later as a
# staleness violation.
CEILING = 3 * WINDOW


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    last_green: dict[str, int] = {}
    rounds = []
    for f in files:
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json", f).group(1))
        rounds.append(rnd)
        data = json.load(open(f))
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") or row.get("hash_match") is None)
                and not row.get("err")
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)

    latest = max(rounds)
    current = int(sys.argv[1]) if len(sys.argv) > 1 else latest + 1

    from duckdb_retail_pipeline_spark.queries import REGISTRY

    registered = list(REGISTRY.keys())
    never = [q for q in registered if q not in last_green]
    dist: dict[int, list[str]] = {}
    for q in registered:
        if q in last_green:
            dist.setdefault(last_green[q], []).append(q)

    print(f"history: r{min(rounds)}..r{latest}; registry {len(registered)}; "
          f"building window for r{current}")
    for rnd in sorted(dist):
        stale = current - rnd
        flag = ""
        if stale > 3:
            flag = "  <-- INVARIANT VIOLATION (already >3 stale)"
        elif stale == 3:
            flag = "  <-- rule-3 head: MUST re-enter this window"
        print(f"  last-green r{rnd}: {len(dist[rnd])} queries"
              f" ({stale} rounds stale at r{current}){flag}")
    if never:
        print(f"  never-checked (rule-1 head): {len(never)}: "
              + ", ".join(sorted(never)))

    owed = [q for rnd, qs in dist.items() if current - rnd >= 3 for q in qs]
    free = WINDOW - len(owed) - len(never)
    print(f"rule-3 owed this window: {len(owed)}; rule-1: {len(never)}; "
          f"genuinely free slots (guards + new registrations): {free}")
    if owed:
        print("owed list:", ", ".join(sorted(owed)))
    if len(registered) > CEILING:
        print(f"CEILING EXCEEDED: {len(registered)} registered > "
              f"{CEILING} (= 3-round staleness x {WINDOW} slots); the "
              "invariant is arithmetically unsatisfiable — RETIRE "
              "queries per ROTATION.md RETIREMENT before registering "
              "more")
        sys.exit(1)
    if len(registered) == CEILING:
        print(f"AT CEILING ({CEILING}): every future window is exactly "
              "the owed block; registering anything requires a "
              "retirement first (ROTATION.md RETIREMENT)")
    violations = [
        q for rnd, qs in dist.items() if current - rnd > 3 for q in qs
    ]
    if violations:
        print("VIOLATIONS (must lead the window, invariant already broken):",
              ", ".join(sorted(violations)))
        sys.exit(1)


if __name__ == "__main__":
    main()
