#!/usr/bin/env python3
"""Regenerate PARITY.md's canonical-counts block from the live registry
(VERDICT r06 #8: hand-maintained counts drifted; generated ones can't).

Run from the repo root after adding/oracling queries:
    python3 scripts/update_parity_counts.py [--check]

``--check`` exits nonzero if the block is stale instead of rewriting —
tests/test_registry_order.py runs the same comparison so drift fails the
suite.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BEGIN = "<!-- BEGIN GENERATED COUNTS (scripts/update_parity_counts.py) -->"
END = "<!-- END GENERATED COUNTS -->"


def registry_counts() -> dict[str, int]:
    from pipeline_calculator_v3_spark.queries import (
        _KEEP_IN_WINDOW,
        _NEVER_CHECKED_FIRST,
        ORACLE_SQL,
        QUERIES,
    )

    return {
        "queries": len(QUERIES),
        "oracle_backed": len(ORACLE_SQL),
        "rows_only": len(QUERIES) - len(ORACLE_SQL),
        "window": len(_NEVER_CHECKED_FIRST) + len(_KEEP_IN_WINDOW),
    }


def test_count() -> int:
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests"],
        cwd=ROOT, capture_output=True, text=True, timeout=300,
    )
    m = re.search(r"(\d+) tests collected", proc.stdout)
    if m is None:
        # Fail loudly (advice r07): a silent -1 would stamp "pytest suite
        # -1 tests" into PARITY.md on a collection error or a pytest
        # output-format change instead of surfacing the problem.
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise RuntimeError(
            "could not parse 'N tests collected' from pytest --collect-only "
            f"output (rc={proc.returncode})"
        )
    return int(m.group(1))


def render(c: dict[str, int], n_tests: int) -> str:
    return (
        f"{BEGIN}\n"
        f"**Current registry (generated — do not hand-edit):** "
        f"{c['queries']} queries registered, {c['oracle_backed']} "
        f"oracle-backed (DuckDB value hash), {c['rows_only']} rows-only "
        f"by declared design; driver check window "
        f"{c['window']} slots; pytest suite {n_tests} tests.\n"
        f"{END}"
    )


def main() -> int:
    check = "--check" in sys.argv
    path = os.path.join(ROOT, "PARITY.md")
    with open(path) as f:
        text = f.read()
    block = render(registry_counts(), test_count())
    pattern = re.compile(re.escape(BEGIN) + ".*?" + re.escape(END), re.S)
    if pattern.search(text):
        new = pattern.sub(block, text)
    else:  # first insertion: after the intro paragraph
        parts = text.split("\n\n", 2)
        new = parts[0] + "\n\n" + parts[1] + "\n\n" + block + "\n\n" + parts[2]
    if check:
        if new != text:
            print("PARITY.md counts are stale — run "
                  "scripts/update_parity_counts.py")
            return 1
        print("PARITY.md counts current")
        return 0
    with open(path, "w") as f:
        f.write(new)
    print(block)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
