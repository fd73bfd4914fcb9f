"""tools/probe_rotation.py: deterministic, full-coverage rotation."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.probe_rotation import sample_for_round


def test_rotation_deterministic():
    names = [f"q{i:03d}" for i in range(323)]
    assert sample_for_round(names, 4, 50) == sample_for_round(names, 4, 50)


def test_rotation_covers_registry_within_cycle():
    names = [f"q{i:03d}" for i in range(323)]
    per_cycle = (len(names) + 49) // 50
    seen = set()
    for r in range(1, per_cycle + 1):
        s = sample_for_round(names, r, 50)
        assert len(s) <= 50
        assert not (seen & set(s))  # disjoint windows within a cycle
        seen |= set(s)
    assert seen == set(names)  # full registry covered each cycle


def test_rotation_redeals_next_cycle():
    names = [f"q{i:03d}" for i in range(323)]
    per_cycle = (len(names) + 49) // 50
    assert sample_for_round(names, 1, 50) != sample_for_round(
        names, per_cycle + 1, 50
    )
