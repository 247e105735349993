"""Unit tests for bench.py's rep-decision protocol (should_run_rep),
replayed against the recorded rep sequences from rounds 6-9 so the
convergence guards that fixed past artifacts cannot silently regress.

No Spark needed — the decision function is pure.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench", bench)
_spec.loader.exec_module(bench)

FLOORS = {
    "smj": 5.4,
    "shj": 5.5,
    "groupby": 0.48,
    "bucketed": 0.70,
}


def replay(seq, adaptive, floor):
    """Feed the sequence rep by rep; return how many reps ran."""
    r = []
    for rep in range(bench.MAX_REPS + 1):
        if not bench.should_run_rep(r, rep, adaptive, floor):
            continue
        if len(r) < len(seq):
            r.append(seq[len(r)])
        else:  # protocol wants more reps than the archive recorded:
            r.append(seq[-1])  # box keeps returning the same time
    return r


def test_min_reps_always_run():
    assert len(replay([1.0, 1.0, 1.0], adaptive=False, floor=None)) >= 3


def test_non_adaptive_capped_at_max_reps():
    # diverging junk still stops at MAX_REPS without the +1 slot
    r = replay([5, 4, 3, 2, 1], adaptive=False, floor=None)
    assert len(r) <= bench.MAX_REPS


def test_converged_stops_at_min_reps():
    r = replay([1.00, 1.01, 1.02, 9, 9], adaptive=True, floor=0.95)
    assert len(r) == 3


def test_r9_shj_loaded_box_keeps_burning_reps():
    """The round-9 weak row: [9.68, 6.70, 7.02] passed the old
    converged check (spread 1.44, not descending) and recorded a min
    20% above the 5.54-5.63 s idle record. The floor guard must keep
    the sequence running to the adaptive cap."""
    r = replay([9.68, 6.70, 7.02, 6.9, 6.8, 6.85], adaptive=True,
               floor=FLOORS["shj"])
    assert len(r) == bench.MAX_REPS + 1  # every slot spent hunting
    # and when a late rep DOES reach the floor, the min is honest
    r2 = replay([9.68, 6.70, 7.02, 5.58, 5.55], adaptive=True,
                floor=FLOORS["shj"])
    assert min(r2) <= 5.58


def test_r9_shj_idle_box_stops_early():
    """Same row on the idle box (r8 record 5.75/5.54-class): floor
    satisfied, converged at MIN_REPS — no wasted reps."""
    r = replay([7.9, 5.60, 5.55], adaptive=True, floor=FLOORS["shj"])
    assert len(r) == 3


def test_r8_groupby_still_descending():
    """r9 fix regression: [3.66, ..., 0.48] — a descending sequence
    must not stop while the last rep is still the strict min."""
    seq = [3.66, 1.2, 0.9, 0.55, 0.48, 0.478]
    r = replay(seq, adaptive=True, floor=FLOORS["groupby"])
    assert min(r) <= 0.49


def test_r9_bucketed_convergence():
    """r9 record [1.99, 0.82, 0.76, 0.71, 0.70]: spread > 1.5 keeps
    it going past MIN_REPS until the floor is reached."""
    r = replay([1.99, 0.82, 0.76, 0.71, 0.70], adaptive=True,
               floor=FLOORS["bucketed"])
    assert min(r) == 0.70


def test_floor_never_blocks_a_genuinely_faster_box():
    """A min BELOW the floor is success, not suspicion: converged
    sub-floor sequences stop at MIN_REPS."""
    r = replay([0.45, 0.44, 0.44], adaptive=True, floor=FLOORS["groupby"])
    assert len(r) == 3


def test_no_floor_behaves_like_r9_protocol():
    """At reduced micro scale KNOWN_FLOORS is empty: the r9-era
    spread + still-descending guards remain, nothing more."""
    r = replay([9.68, 6.70, 7.02], adaptive=True, floor=None)
    assert len(r) == 3  # the r9 behavior, preserved when unscaled
