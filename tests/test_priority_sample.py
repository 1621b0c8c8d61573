"""Distributional properties of priority_sample_topk (plans/llmdata.py).

The shadow oracle gate proves the Spark plan and the DuckDB replay
compute the SAME sample; these tests prove the integerized scheme keeps
the properties the Duffield–Lund–Thorup paper promises — estimator
unbiasedness and weight monotonicity — via a pure-Python reference of
the identical arithmetic (salted md5 → u ∈ (0,1] → q = w·2^32 // h),
averaged over a FIXED salt list so every assertion is deterministic.
"""

from __future__ import annotations

import hashlib

SCALE = 1 << 32


def _priority(salt: str, item_id: int, w: int) -> int:
    digest = hashlib.md5(f"{salt}-{item_id}".encode()).hexdigest()
    h = 1 + int(digest[:8], 16)
    return w * SCALE // h


def dlt_sample(weights: dict[int, int], k: int, salt: str):
    """(sample ids, tau, {id: w_hat}) — the engine's exact arithmetic."""
    ranked = sorted(
        weights, key=lambda i: (-_priority(salt, i, weights[i]), i)
    )
    top, next_one = ranked[:k], ranked[k]
    tau = _priority(salt, next_one, weights[next_one])
    return top, tau, {i: max(weights[i], tau) for i in top}


# a skewed 40-item population: a few heavy docs, a long light tail
WEIGHTS = {i: (i % 7 + 1) ** 3 * (100 if i % 13 == 0 else 1) for i in range(40)}
K = 16
SALTS = [f"s{j}" for j in range(400)]


def test_sample_is_k_distinct_items():
    top, tau, w_hat = dlt_sample(WEIGHTS, K, "s0")
    assert len(top) == K == len(set(top))
    # every sampled item's priority clears the threshold
    for i in top:
        assert _priority("s0", i, WEIGHTS[i]) >= tau
    # estimator never shrinks a known weight
    assert all(w_hat[i] >= WEIGHTS[i] for i in top)


def test_subset_sum_estimator_is_unbiased_over_salts():
    total = sum(WEIGHTS.values())
    subset = {i for i in WEIGHTS if i % 2 == 0}
    subset_total = sum(WEIGHTS[i] for i in subset)

    est_tot, est_sub = [], []
    for salt in SALTS:
        top, _tau, w_hat = dlt_sample(WEIGHTS, K, salt)
        est_tot.append(sum(w_hat.values()))
        est_sub.append(sum(v for i, v in w_hat.items() if i in subset))

    mean_tot = sum(est_tot) / len(est_tot)
    mean_sub = sum(est_sub) / len(est_sub)
    assert abs(mean_tot - total) / total < 0.05, mean_tot
    assert abs(mean_sub - subset_total) / subset_total < 0.08, mean_sub


def test_heavier_items_sampled_more_often():
    """Inclusion frequency must be monotone in weight: P(i ∈ S) is
    increasing in w_i under DLT (priority q = w/u is increasing in w
    with u fixed, and the competing priorities are unchanged)."""
    freq = {i: 0 for i in WEIGHTS}
    for salt in SALTS:
        top, _t, _w = dlt_sample(WEIGHTS, K, salt)
        for i in top:
            freq[i] += 1
    heavy = [i for i in WEIGHTS if WEIGHTS[i] >= 1000]
    light = [i for i in WEIGHTS if WEIGHTS[i] <= 8]
    assert heavy and light
    worst_heavy = min(freq[i] for i in heavy)
    best_light = max(freq[i] for i in light)
    assert worst_heavy > best_light, (worst_heavy, best_light)


def test_weight_increase_never_evicts_the_item_itself():
    """Per-salt monotonicity: raising ONE item's weight (all else
    fixed) can only raise its own priority, so an item already in the
    sample stays in it."""
    for salt in SALTS[:50]:
        top, _t, _w = dlt_sample(WEIGHTS, K, salt)
        victim = top[len(top) // 2]
        bumped = dict(WEIGHTS)
        bumped[victim] *= 10
        top2, _t2, _w2 = dlt_sample(bumped, K, salt)
        assert victim in top2, (salt, victim)
