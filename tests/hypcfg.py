"""Hypothesis example-budget scaling for the suite's property tests.

The adversarial property tests evaluate one real Spark plan per
hypothesis example, so their wall is ~(plan analysis latency) x
max_examples — at 300 examples the test_hof_rewrites file alone costs
~130 s while contributing the same pass/fail signal after the first
few dozen examples on an unchanged tree.  The per-test example budgets
are therefore SCALED by SPARK_GRAFT_HYPOTHESIS_SCALE (default 0.2,
floor 25): the default suite keeps every property test running with a
meaningful example count inside the external verify budget, and
SPARK_GRAFT_HYPOTHESIS_SCALE=1 restores the full adversarial budgets
(run it when touching any of the pinned expressions).
"""

from __future__ import annotations

import os

_SCALE = float(os.environ.get("SPARK_GRAFT_HYPOTHESIS_SCALE", "0.2"))


def ex(n: int) -> int:
    """Scaled max_examples for a declared full budget of ``n``."""
    return max(25, int(n * _SCALE))
