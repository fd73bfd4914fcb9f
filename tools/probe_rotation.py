"""Seeded round-indexed probe sample over the query registry.

The driver gate probes a ~50-query sample of the 300+ registry per round;
a fixed sample would leave the rest pytest-pinned only. This tool emits a
DETERMINISTIC rotation: round r's sample is a seeded shuffle slice, so
across ceil(N/k) consecutive rounds every registry query is gate-verified
at least once (the shuffle is fixed per cycle; rounds walk disjoint
windows of it).

Usage:
    python tools/probe_rotation.py <round> [k]        # print round r's names
    python tools/probe_rotation.py <round> [k] --run  # and run the gate on them

Cycle pinning: with a state file (the CLI default, BENCH/probe_cycles.json)
each cycle's shuffled order and window count are computed ONCE from the
registry snapshot at the time the cycle is first requested and persisted,
so registry growth never re-deals an in-progress cycle — new queries join
the rotation at the next cycle boundary, and already-probed windows stay
disjoint from the remaining ones. Without a state file (preview/test mode)
the deal is a pure function of (sorted names, cycle index) and ANY registry
change re-deals the current cycle too — that mode makes no mid-cycle
coverage promise.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_STATE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH",
    "probe_cycles.json",
)


def sample_for_round(
    names: list[str], rnd: int, k: int = 50, state_path: str | None = None
) -> list[str]:
    names_set = set(names)
    if state_path is None:  # stateless preview mode (docstring caveat)
        snames = sorted(names_set)
        per_cycle = max(1, (len(snames) + k - 1) // k)
        cycle, slot = divmod(max(rnd - 1, 0), per_cycle)
        order = snames[:]
        random.Random(f"osmgraft-probe-cycle-{cycle}").shuffle(order)
        return sorted(order[slot * k : (slot + 1) * k])

    state = {"cycles": []}
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)
    cycles = state.setdefault("cycles", [])
    r0, ci, dirty = max(rnd - 1, 0), 0, False
    while True:
        if ci >= len(cycles):
            order = sorted(names_set)
            random.Random(f"osmgraft-probe-cycle-{ci}").shuffle(order)
            cycles.append(
                {"order": order, "k": k, "per_cycle": max(1, (len(order) + k - 1) // k)}
            )
            dirty = True
        c = cycles[ci]
        if r0 < c["per_cycle"]:
            slot = r0
            break
        r0 -= c["per_cycle"]
        ci += 1
    if dirty:
        os.makedirs(os.path.dirname(state_path), exist_ok=True)
        with open(state_path, "w") as f:
            json.dump(state, f, indent=1)
    ck = c.get("k", k)
    window = c["order"][slot * ck : (slot + 1) * ck]
    # deleted queries are skipped but keep their slot (window stays pinned)
    return sorted(n for n in window if n in names_set)


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    k = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 50
    from osmgraft.queries import all_queries

    state_path = os.environ.get("PROBE_STATE", DEFAULT_STATE)
    names = sample_for_round(
        list(all_queries()), rnd, k, state_path=state_path or None
    )
    try:
        for n in names:
            print(n)
    except BrokenPipeError:  # piped into head — fine
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
    if "--run" in sys.argv:
        sf = os.environ.get("PROBE_SF_DIR", "/root/testdata/sf0.01")
        sys.exit(
            subprocess.call(
                [sys.executable, os.path.join(os.path.dirname(__file__), "verify_oracle.py"), sf, *names]
            )
        )


if __name__ == "__main__":
    main()
