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


def test_pinned_cycle_survives_registry_growth(tmp_path):
    """With a state file, registry growth must NOT re-deal the in-progress
    cycle: windows already probed stay disjoint from the remaining ones,
    and new names join only at the next cycle boundary (the round-4 ADVICE
    fix — the stateless seed included len(names), so any growth re-dealt
    the live cycle and broke mid-cycle coverage)."""
    state = str(tmp_path / "cycles.json")
    names = [f"q{i:03d}" for i in range(323)]
    r1 = sample_for_round(names, 1, 50, state_path=state)
    grown = names + [f"new{i}" for i in range(10)]
    # round 1 re-request after growth: identical (pinned)
    assert sample_for_round(grown, 1, 50, state_path=state) == r1
    # remaining windows of the cycle: disjoint, and cover the ORIGINAL set
    seen = set(r1)
    per_cycle = (len(names) + 49) // 50
    for r in range(2, per_cycle + 1):
        s = sample_for_round(grown, r, 50, state_path=state)
        assert not (seen & set(s))
        assert not any(n.startswith("new") for n in s)
        seen |= set(s)
    assert seen == set(names)
    # next cycle re-deals from the grown snapshot: new names now rotate
    nxt = set()
    grown_pc = (len(grown) + 49) // 50
    for r in range(per_cycle + 1, per_cycle + grown_pc + 1):
        nxt |= set(sample_for_round(grown, r, 50, state_path=state))
    assert nxt == set(grown)


def test_pinned_cycle_skips_deleted_names_without_shifting(tmp_path):
    state = str(tmp_path / "cycles.json")
    names = [f"q{i:03d}" for i in range(120)]
    r1 = sample_for_round(names, 1, 50, state_path=state)
    shrunk = [n for n in names if n != r1[0]]
    got = sample_for_round(shrunk, 1, 50, state_path=state)
    assert got == [n for n in r1 if n != r1[0]]  # slot kept, name skipped
    # later windows unaffected by the deletion
    r2_full = sample_for_round(names, 2, 50, state_path=state)
    assert sample_for_round(shrunk, 2, 50, state_path=state) == [
        n for n in r2_full if n != r1[0]
    ]
