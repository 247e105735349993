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


# ---- r11: the parent's group-budget policy, as a pure function ----
from bench import GROUP_FLOOR, GROUP_ORDER, group_budget  # noqa: E402


def test_group_budget_marquee_floors_always_hold():
    """However squeezed the wall, a launched marquee group (join100,
    bucketed) gets at least its floor — the r11 full-run failure was
    join100 at 88s -> single cold reps."""
    for remaining in (45, 60, 100, 150, 224, 300, 460):
        for gi, group in enumerate(GROUP_ORDER):
            b = group_budget(gi, group, float(remaining))
            assert b is not None
            assert b >= GROUP_FLOOR.get(group, 60.0), (group, remaining, b)


def test_group_budget_skip_threshold():
    assert group_budget(0, "duckdb", 44.9) is None
    assert group_budget(3, "light", 10.0) is None


def test_group_budget_controls_yield_to_bucketed_reserve():
    """With plenty of wall the controls take their weighted share or
    floor; when the wall shrinks the reserve caps them so bucketed's
    floor still fits — but never below duckdb's own floor."""
    # plentiful: floor wins over the small weighted share
    assert group_budget(0, "duckdb", 420.0) == 105.0
    # the reserve cap can only LOWER a budget, never raise one: at
    # every remaining, duckdb <= max(remaining - reserve, floor)
    for remaining in (150.0, 250.0, 420.0, 800.0):
        b = group_budget(0, "duckdb", remaining)
        cap = max(remaining - (GROUP_FLOOR["bucketed"] + 15), 105.0)
        assert b <= cap, (remaining, b, cap)
    # desperately squeezed: duckdb's own floor is the last word
    assert group_budget(0, "duckdb", 120.0) == 105.0


def test_group_budget_join100_exempt_from_reserve():
    """join100 must never be capped below its weighted share by the
    bucketed reserve (the r11 lesson): at the remaining where the r11
    loaded run squeezed it to 88s, the policy now yields >= floor."""
    gi = GROUP_ORDER.index("join100")
    for remaining in (150, 224, 300):
        b = group_budget(gi, "join100", float(remaining))
        later = sum(
            __import__("bench").GROUP_WEIGHT[g] for g in GROUP_ORDER[gi:]
        )
        weighted = remaining * __import__("bench").GROUP_WEIGHT["join100"] / later - 10
        assert b >= min(max(weighted, 105.0), remaining - 15) or b == 105.0


def test_group_budget_replays_r11_smoke_notes():
    """The recorded r11 smoke run (400s budget): duckdb launched with
    ~326s remaining and got its 105s floor (reserve cap not binding
    below the floor)."""
    assert group_budget(0, "duckdb", 326.0) == 105.0


def test_group_budget_bucketed_never_skipped():
    """r11: a blown wall must not erase the marquee bucketed row —
    below the skip threshold every other group skips, bucketed gets
    the reduced rescue budget."""
    gi = GROUP_ORDER.index("bucketed")
    assert group_budget(gi, "bucketed", -10.0) == 90.0
    assert group_budget(gi, "bucketed", 44.0) == 90.0
    # above the threshold the normal floor applies
    assert group_budget(gi, "bucketed", 200.0) >= GROUP_FLOOR["bucketed"]


def test_stderr_tail_caps_and_flattens(tmp_path):
    """r13: the child-stderr tee must survive the artifact's one-line
    JSON contract — last N lines only, newline-flattened, char-capped,
    and resilient to a missing file."""
    from bench import _stderr_tail

    p = tmp_path / "err.log"
    p.write_text("\n".join(f"line{i}" for i in range(100)) + "\n")
    tail = _stderr_tail(str(p), lines=30, chars=3000)
    assert "\n" not in tail
    assert "line99" in tail and "line70" in tail
    assert "line69" not in tail  # only the last 30 lines
    # char cap keeps the END of the tail (the exception is last)
    long = tmp_path / "long.log"
    long.write_text("x" * 10000 + "\nTHE-ERROR\n")
    capped = _stderr_tail(str(long), lines=30, chars=100)
    assert len(capped) <= 100 and "THE-ERROR" in capped
    assert _stderr_tail(str(tmp_path / "absent.log")) == "<stderr unavailable>"
