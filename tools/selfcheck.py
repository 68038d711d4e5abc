"""Registry staleness gate (r9 VERDICT ask #7) — an ASSERTION, not a
convention.

The driver verifies 50 entries per round; the registry is larger, so the
freshness scheduler (entry_queries._verification_order) sweeps the
window across all entries round-robin. Steady-state staleness is
ceil(registry/50) rounds — acceptable — but any entry about to fall
FURTHER behind than that must carry a same-round self-check line
(tools/check_oracle.py output appended to tools/selfcheck_r{N}.txt), or
this gate fails the round.

Usage:
    python tools/selfcheck.py <round>            # gate: exit 1 on violations
    python tools/selfcheck.py <round> --missing  # just print entries to check

The projection: the upcoming driver window is the first 50 names of
queries() (the scheduler's order is deterministic from the
CORRECTNESS_r*.json history). An entry in the window gets checked this
round; everything else keeps its last-checked round. Any entry whose
projected last check is older than <round> - ALLOWED_LAG must appear as
an OK line in tools/selfcheck_r{round}.txt.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

WINDOW = 50


def allowed_lag(n_entries: int) -> int:
    """Maximum acceptable driver-check age, in rounds: the steady-state
    sweep age of an N-entry registry under a 50-slot round-robin window
    is ceil(N/50) - 1 full rounds behind the freshest cohort (at N=163:
    cohorts of 50@0/50@1/50@2/13@3 → lag 3, the bar the r9 review set).
    Floor of 3 so a shrinking registry doesn't retroactively tighten the
    gate past the acknowledged overflow cohort."""
    return max(3, -(-n_entries // WINDOW) - 1)


def last_checked_rounds() -> dict[str, int]:
    out: dict[str, int] = {}
    for p in sorted(
        ROOT.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    ):
        n = int(re.search(r"r(\d+)", p.name).group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            for name, row in data.items():
                if isinstance(row, dict):
                    out[name] = n
    return out


def selfchecked_ok(rnd: int) -> set[str]:
    p = ROOT / f"tools/selfcheck_r{rnd:02d}.txt"
    if not p.exists():
        return set()
    ok = set()
    for line in p.read_text().splitlines():
        m = re.match(r"^\s*([A-Za-z0-9_]+)\s+OK\b", line)
        if m:
            ok.add(m.group(1))
    return ok


def main() -> int:
    rnd = int(sys.argv[1])
    missing_only = "--missing" in sys.argv

    from accumulo_wikisearch_spark import entry_queries

    names = list(entry_queries.queries().keys())
    window = set(names[:WINDOW])
    checked = last_checked_rounds()
    lag = allowed_lag(len(names))
    floor = rnd - lag
    ok_lines = selfchecked_ok(rnd)

    violations = []
    for name in names:
        projected = rnd if name in window else checked.get(name, 0)
        if projected < floor and name not in ok_lines:
            violations.append((name, checked.get(name)))

    if missing_only:
        for name, _ in violations:
            print(name)
        return 0
    if violations:
        print(
            f"selfcheck GATE FAILED (round {rnd}, registry {len(names)}, "
            f"allowed lag {lag} rounds → floor r{floor}):"
        )
        for name, last in violations:
            print(
                f"  {name}: last driver check r{last or '-'}, not in the "
                f"upcoming window, no OK line in tools/selfcheck_r{rnd:02d}.txt"
            )
        print(
            "\nRun: python tools/check_oracle.py /root/testdata/sf0.01 "
            + " ".join(v[0] for v in violations)
            + f" | tee -a tools/selfcheck_r{rnd:02d}.txt"
        )
        return 1
    print(
        f"selfcheck gate OK (round {rnd}): every entry within {lag} rounds "
        f"or self-checked this round ({len(names)} entries, window {WINDOW})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
