"""Probe-coverage recount: which registered queries have at least one
ENGINEERED-CORPUS differential (a test that builds its own adversarial
parquet via _probe_corpus and runs the REGISTERED query + oracle on
it), as opposed to only the driver-SF oracle rows.

The probe-wave discipline (r12 waves 1-2, r13 waves 3-8) targets
surfaces with no such differential yet; this script derives the
remaining worklist mechanically so a wave pre-draft can't miss or
double-probe a query (the same failure the rotation recount fixed for
the driver window).

Counting rule: inside every test function whose body calls
``_probe_corpus``, any string literal that names a registered query
counts as probed — that catches both ``REGISTRY["x44_..."]`` lookups
and the ``for name in ("x44_...", ...)`` loop idiom. Unit
differentials on synthetic frames that bypass the registry (the
graph/sketch/ANN contract tests) deliberately do NOT count: the probe
contract is "the REGISTERED query ran against its REGISTERED oracle
on hostile data".

Usage: python tools/probe_coverage.py   (exit 0; prints the worklist)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from duckdb_retail_pipeline_spark.queries import REGISTRY

    tests_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests")
    registered = set(REGISTRY)
    probed: dict[str, list[str]] = {}
    for fname in sorted(os.listdir(tests_dir)):
        if not (fname.startswith("test_") and fname.endswith(".py")):
            continue
        src = open(os.path.join(tests_dir, fname)).read()
        # function bodies: from each def to the next top-level def
        for m in re.finditer(
            r"^def (test_\w+)\(.*?\n(.*?)(?=^def |\Z)", src, re.S | re.M
        ):
            name, body = m.group(1), m.group(2)
            if "_probe_corpus" not in body:
                continue
            for lit in re.findall(r'"([a-z]\w+)"', body):
                if lit in registered:
                    probed.setdefault(lit, []).append(f"{fname}::{name}")
    un = sorted(registered - set(probed))
    print(f"registry {len(registered)}; engineered-corpus-probed "
          f"{len(probed)}; remaining {len(un)}")
    print("\nremaining worklist (no engineered-corpus differential yet):")
    for q in un:
        print(f"  {q}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
