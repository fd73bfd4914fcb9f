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

The sample is stable for a given (registry contents, round) pair: the
shuffle seeds from the cycle index and the sorted name list, so adding
queries re-deals only future cycles.
"""

from __future__ import annotations

import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sample_for_round(names: list[str], rnd: int, k: int = 50) -> list[str]:
    names = sorted(names)
    per_cycle = max(1, (len(names) + k - 1) // k)  # rounds per full cycle
    cycle, slot = divmod(max(rnd - 1, 0), per_cycle)
    order = names[:]
    random.Random(f"osmgraft-probe-cycle-{cycle}-{len(names)}").shuffle(order)
    return sorted(order[slot * k : (slot + 1) * k])


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    k = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 50
    from osmgraft.queries import all_queries

    names = sample_for_round(list(all_queries()), rnd, k)
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
