"""Property-based checks (hypothesis) for the r6 operator algorithms:
Misra-Gries candidate superset and bucketed interval-join emit-once.

Pure-Python mirrors of the operator logic (same algorithms as
operators/heavyhitters.py and operators/intervaljoin.py) so the
properties run thousands of examples without a JVM round-trip; the
Spark implementations are separately pinned equal to their naive
formulations in tests/test_heavyhitters.py / test_intervaljoin.py.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings, strategies as st


def _mg(stream, k):
    """Mirror of heavyhitters.mg_candidates' per-partition summary."""
    counters: dict = {}
    for v in stream:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return set(counters)


@given(
    stream=st.lists(st.integers(0, 30), min_size=1, max_size=500),
    n_parts=st.integers(1, 8),
    phi_pct=st.integers(5, 50),
)
@settings(max_examples=300, deadline=None)
def test_mg_partition_union_superset(stream, n_parts, phi_pct):
    """Union of per-partition MG(ceil(1/phi)) candidates contains every
    item with global frequency > phi*n — for ANY partitioning."""
    phi = phi_pct / 100.0
    k = math.ceil(1.0 / phi)
    parts = [stream[i::n_parts] for i in range(n_parts)]
    cand = set().union(*(_mg(p, k) for p in parts))
    n = len(stream)
    heavy = {v for v, c in Counter(stream).items() if c > phi * n}
    assert heavy <= cand


@given(
    stream=st.lists(st.integers(0, 10), min_size=1, max_size=300),
    k=st.integers(1, 20),
)
@settings(max_examples=200, deadline=None)
def test_mg_summary_size_bounded(stream, k):
    assert len(_mg(stream, k)) <= k


_iv = st.tuples(st.integers(0, 1000), st.integers(0, 200)).map(
    lambda t: (t[0], t[0] + t[1])
)


@given(
    left=st.lists(_iv, min_size=0, max_size=30),
    right=st.lists(_iv, min_size=0, max_size=30),
    width=st.integers(1, 300),
)
@settings(max_examples=300, deadline=None)
def test_bucketed_overlap_join_exact_once(left, right, width):
    """Mirror of intervaljoin.overlap_join's bucket/emit-once logic:
    every overlapping pair is emitted in EXACTLY one bucket; every
    non-overlapping pair in none — for any bucket width."""
    emitted = Counter()
    for li, (ls, le) in enumerate(left):
        for ri, (rs, re_) in enumerate(right):
            lbuckets = range(ls // width, le // width + 1)
            rbuckets = set(range(rs // width, re_ // width + 1))
            first_shared = max(ls // width, rs // width)
            for b in lbuckets:
                if b in rbuckets and ls <= re_ and rs <= le and b == first_shared:
                    emitted[(li, ri)] += 1
    for li, (ls, le) in enumerate(left):
        for ri, (rs, re_) in enumerate(right):
            want = 1 if (ls <= re_ and rs <= le) else 0
            assert emitted[(li, ri)] == want, (li, ri)


# ---------------------------------------------------------------------------
# 2-D skyline: the cumulative-max formulation (the window device behind
# skyline_price_quantity) must equal brute-force dominance filtering.
# ---------------------------------------------------------------------------


def _skyline_bruteforce(pts):
    """Non-dominated (price, qty) points: s dominates r iff s.price <=
    r.price and s.qty >= r.qty with at least one strict."""
    uniq = set(pts)
    out = set()
    for p, q in uniq:
        dominated = any(
            (p2 <= p and q2 >= q and (p2 < p or q2 > q)) for p2, q2 in uniq
        )
        if not dominated:
            out.add((p, q))
    return out


def _skyline_cummax(pts):
    """Mirror of the query: per price keep max qty, sort by price, keep
    points whose qty strictly exceeds the running max of all cheaper
    prices."""
    best: dict = {}
    for p, q in pts:
        best[p] = max(best.get(p, q), q)
    out = set()
    running = None
    for p in sorted(best):
        q = best[p]
        if running is None or q > running:
            out.add((p, q))
        running = q if running is None else max(running, q)
    return out


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=300, deadline=None)
def test_skyline_cummax_equals_bruteforce(pts):
    assert _skyline_cummax(pts) == _skyline_bruteforce(pts)


# ---------------------------------------------------------------------------
# Z-order interleave (zorder_layout_audit): the 16 shift-mask terms are
# a bijection [0,256)² → [0,65536), and decoding recovers the inputs.
# ---------------------------------------------------------------------------


def _zvalue_py(x, y):
    z = 0
    for i in range(8):
        z += ((x >> i) & 1) << (2 * i)
        z += ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_is_bijective_and_decodable():
    seen = set()
    for x in range(0, 256, 7):
        for y in range(0, 256, 5):
            z = _zvalue_py(x, y)
            assert z not in seen
            seen.add(z)
            dx = sum(((z >> (2 * i)) & 1) << i for i in range(8))
            dy = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
            assert (dx, dy) == (x, y)
    assert _zvalue_py(255, 255) == 65535
    assert _zvalue_py(0, 0) == 0
