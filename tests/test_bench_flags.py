"""bench.py's host-drift verdict (no Spark needed): the decision rule
is >=DEGRADED_MIN_KERNELS canaries elevated on BOTH sides, and an
unmeasurable window reads as UNKNOWN (None), never as clean (r13
ADVICE)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import DEGRADED_RATIO, QUIET_CANARIES, drift_flags


def _cal(factor):
    return {k: v * factor for k, v in QUIET_CANARIES.items()}


def test_quiet_window_reads_clean():
    flags = drift_flags(_cal(1.0), _cal(1.1))
    assert flags["host_degraded"] is False
    assert flags["degraded_kernels"] == []


def test_both_sides_elevated_reads_degraded():
    flags = drift_flags(_cal(2.0), _cal(1.8))
    assert flags["host_degraded"] is True
    assert len(flags["degraded_kernels"]) == len(QUIET_CANARIES)


def test_one_sided_spike_is_not_degraded():
    # ratio = min(before, after)/quiet: a spike on one side only is
    # transient load, not a degraded window
    flags = drift_flags(_cal(5.0), _cal(1.0))
    assert flags["host_degraded"] is False


def test_unmeasurable_window_reads_unknown_not_clean():
    flags = drift_flags({"error": "boom"}, {"error": "boom"})
    assert flags["host_degraded"] is None
    assert flags["worst_canary_ratio"] is None
    assert flags["canary_ratios_vs_quiet"] == {}


def test_two_of_four_elevated_stays_below_threshold():
    before = dict(_cal(1.0))
    after = dict(_cal(1.0))
    for k in list(QUIET_CANARIES)[:2]:
        before[k] = QUIET_CANARIES[k] * (DEGRADED_RATIO + 0.2)
        after[k] = QUIET_CANARIES[k] * (DEGRADED_RATIO + 0.2)
    flags = drift_flags(before, after)
    assert flags["host_degraded"] is False
    assert len(flags["degraded_kernels"]) == 2
