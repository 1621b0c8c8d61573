"""Property-based checks (hypothesis) for the portable signature math.

These pin the *algorithmic* contracts that the oracle comparisons can't
see: MinHash approximates Jaccard, SimHash Hamming distance tracks
dissimilarity, and the portable token hash is uniform-ish and stable.
Pure-Python mirrors of the SQL/Spark formulas are used so the properties
run without a JVM round-trip per example.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from kafkastreamsproject_spark.functions.hashing import MINHASH_P, _perm_coeffs

WORDS = [f"w{i}" for i in range(50)]


def _h32(tok: str) -> int:
    """Python mirror of the portable md5-prefix token hash."""
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)


def _minhash_sig(tokens: set[str], n_perms: int = 16) -> list[int]:
    hs = [_h32(t) for t in tokens]
    return [
        min((h * a + b) % MINHASH_P for h in hs)
        for a, b in (_perm_coeffs(k) for k in range(n_perms))
    ]


@given(
    a=st.sets(st.sampled_from(WORDS), min_size=5, max_size=40),
    b=st.sets(st.sampled_from(WORDS), min_size=5, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_minhash_estimates_jaccard(a: set[str], b: set[str]):
    """E[fraction of agreeing minhashes] = Jaccard(a, b); with 16 perms
    the estimate must land within a generous tolerance band."""
    true_j = len(a & b) / len(a | b)
    sa, sb = _minhash_sig(a), _minhash_sig(b)
    est = sum(x == y for x, y in zip(sa, sb)) / len(sa)
    assert abs(est - true_j) <= 0.5  # 16 perms: σ = √(j(1-j)/16) ≤ 0.125
    if true_j == 1.0:
        assert est == 1.0  # identical sets always collide on every perm
    if true_j == 0.0 and est > 0:
        # disjoint sets may still collide per-perm, but rarely on many
        assert est <= 0.5


@given(tokens=st.sets(st.sampled_from(WORDS), min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_minhash_is_permutation_of_min(tokens: set[str]):
    """Each minhash must equal the permuted minimum — i.e. signature of
    a superset can only be ≤ elementwise."""
    sig = _minhash_sig(tokens)
    bigger = _minhash_sig(tokens | {"extra_token"})
    assert all(b <= s for s, b in zip(sig, bigger))


@given(st.text(min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_token_hash_stable_and_bounded(tok: str):
    h = _h32(tok)
    assert 0 <= h < 2**32
    assert h == _h32(tok)


def _block_vals(x: int, bounds: list[tuple[int, int]]) -> list[int]:
    return [(x >> s) & ((1 << ln) - 1) for s, ln in bounds]


@given(
    sig=st.integers(0, 2**32 - 1),
    flips=st.sets(st.integers(0, 31), max_size=6),
)
@settings(max_examples=300, deadline=None)
def test_simhash_banding_pigeonhole_32_6(sig: int, flips: set[int]):
    """The banded candidate join has ZERO false negatives: any pair
    within Hamming ≤ 6 must share at least one of the 7 blocks exactly
    (simhash_neardup's candidate generation relies on this)."""
    from kafkastreamsproject_spark.functions.hashing import simhash_block_bounds

    other = sig
    for j in flips:
        other ^= 1 << j
    bounds = simhash_block_bounds(32, 6)
    assert len(bounds) == 7
    assert sum(ln for _, ln in bounds) == 32
    assert sorted(s for s, _ in bounds)[0] == 0  # covers bit 0 upward
    assert any(
        a == b for a, b in zip(_block_vals(sig, bounds), _block_vals(other, bounds))
    )


@given(
    sig=st.integers(0, 2**64 - 1),
    flips=st.sets(st.integers(0, 63), max_size=3),
)
@settings(max_examples=300, deadline=None)
def test_simhash_banding_pigeonhole_64_3(sig: int, flips: set[int]):
    """Production configuration (64-bit signature, Hamming ≤ 3 → four
    16-bit blocks): the same pigeonhole guarantee at the width a 100 TB
    corpus needs for selective buckets (65k values per block)."""
    from kafkastreamsproject_spark.functions.hashing import simhash_block_bounds

    other = sig
    for j in flips:
        other ^= 1 << j
    bounds = simhash_block_bounds(64, 3)
    assert [ln for _, ln in bounds] == [16, 16, 16, 16]
    assert any(
        a == b for a, b in zip(_block_vals(sig, bounds), _block_vals(other, bounds))
    )


# ---------------------------------------------------------------------------
# repetition_stats (plans/shadow.py): the engine computes unigram
# entropy via the aggregation-friendly identity H = ln n − (Σ c·ln c)/n
# (a plain SUM that partial-aggregates map-side) rather than the
# textbook −Σ (c/n)·ln(c/n).  Pin the identity and the signal bounds.
# ---------------------------------------------------------------------------


@given(toks=st.lists(st.sampled_from(WORDS), min_size=2, max_size=200))
@settings(max_examples=200, deadline=None)
def test_repetition_entropy_identity_and_bounds(toks: list[str]):
    import math
    from collections import Counter

    counts = Counter(toks)
    n = len(toks)
    # the engine's formulation
    h_engine = math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
    # the textbook formulation
    h_text = -sum((c / n) * math.log(c / n) for c in counts.values())
    assert abs(h_engine - h_text) < 1e-9
    # bounds: 0 (all same token) .. ln(n_distinct) (uniform)
    assert -1e-12 <= h_engine <= math.log(len(counts)) + 1e-12
    # companion signals live in their ranges
    top_frac = max(counts.values()) / n
    distinct_ratio = len(counts) / n
    assert 1 / len(counts) - 1e-12 <= top_frac <= 1.0
    assert 0.0 < distinct_ratio <= 1.0
    bigrams = list(zip(toks, toks[1:]))
    dup_bigram_frac = 1 - len(set(bigrams)) / len(bigrams)
    assert 0.0 <= dup_bigram_frac < 1.0


@given(
    a=st.sets(st.integers(0, 120), min_size=1, max_size=40),
    b=st.sets(st.integers(0, 120), min_size=1, max_size=40),
    dfs=st.lists(st.integers(1, 9), min_size=121, max_size=121),
)
@settings(max_examples=300, deadline=None)
def test_prefix_filtering_completeness(a, b, dfs):
    """The prefix-filtering lemma under the repo's integer arithmetic
    (plans/dedup.py prefix_filter_jaccard_pairs, t = 7/10): for ANY
    global (df, token) order, any pair with 10·|A∩B| ≥ 7·|A∪B| shares
    a token inside BOTH frequency-ordered prefixes of length
    p = n − ceil(7n/10) + 1 = n − ((7n + 9) // 10) + 1."""
    inter = len(a & b)
    union = len(a | b)
    if 10 * inter < 7 * union:
        return  # below threshold — no guarantee claimed
    key = lambda t: (dfs[t], t)  # noqa: E731 — arbitrary global order

    def prefix(s):
        n = len(s)
        p = n - ((7 * n + 9) // 10) + 1
        assert p >= 1  # the integer formula never empties a prefix
        return set(sorted(s, key=key)[:p])

    assert prefix(a) & prefix(b), (
        f"pair at jaccard {inter}/{union} missed by prefix filter"
    )


# ---------------------------------------------------------------------------
# r10 operator contracts: FFD packing, bloom prune, b-bit correction
# ---------------------------------------------------------------------------


def _ffd(tokens: list[tuple[int, int]], budget: int):
    """Python mirror of operators/packing.py:_ffd_pack (ids unique)."""
    order = sorted(tokens, key=lambda t: (-t[1], t[0]))
    remaining: list[int] = []
    assign = {}
    for doc, t in order:
        if t > budget:
            assign[doc] = len(remaining)
            remaining.append(-1)
            continue
        for i, r in enumerate(remaining):
            if r >= t:
                remaining[i] = r - t
                assign[doc] = i
                break
        else:
            assign[doc] = len(remaining)
            remaining.append(budget - t)
    return remaining, assign


@given(
    toks=st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=60),
    budget=st.integers(min_value=10, max_value=120),
)
@settings(max_examples=200, deadline=None)
def test_ffd_respects_budget_and_is_half_full(toks, budget):
    """FFD contract: every non-overflow pack fits the budget, and at
    most ONE pack ends more than half empty — if two packs both had
    > budget/2 remaining, the later pack's first (largest) item was
    <= budget/2 and would have fit in the earlier one.  This is the
    structural fact behind FFD's constant-factor guarantee, checked
    directly."""
    rows = list(enumerate(toks))
    remaining, assign = _ffd(rows, budget)
    fills = {}
    for doc, t in rows:
        fills[assign[doc]] = fills.get(assign[doc], 0) + t
    for p, fill in fills.items():
        if remaining[p] != -1:  # non-overflow pack
            assert fill <= budget
    open_half_empty = sum(
        1 for r in remaining if r != -1 and r > budget / 2
    )
    assert open_half_empty <= 1
    # every doc assigned exactly once, nothing lost
    assert sorted(assign) == sorted(d for d, _ in rows)


def _bloom_positions(key: str, n_hashes: int, n_bits: int) -> list[int]:
    """Python mirror of operators/bloomjoin.py:md5_bloom_positions."""
    return [
        int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:8], 16) % n_bits
        for i in range(n_hashes)
    ]


@given(
    batch=st.sets(st.sampled_from(WORDS), min_size=1, max_size=30),
    store=st.sets(st.sampled_from(WORDS), min_size=1, max_size=30),
)
@settings(max_examples=200, deadline=None)
def test_bloom_pruned_anti_join_is_exact(batch, store):
    """The pruned anti-join equals the plain set difference for ANY
    inputs: a store key dropped by the batch sketch shares no position
    set with any batch key IT EQUALS (no false negatives), so pruning
    can only remove non-matching store rows."""
    n_hashes, n_bits = 2, 64  # tiny filter: false positives guaranteed
    sketch = {
        p for k in batch for p in _bloom_positions(k, n_hashes, n_bits)
    }
    survivors = {
        k
        for k in store
        if all(p in sketch for p in _bloom_positions(k, n_hashes, n_bits))
    }
    # every true match survives the prune (no false negatives)
    assert (batch & store) <= survivors
    # therefore the anti-join against survivors is the true difference
    assert batch - survivors == batch - store


@given(
    tokens=st.sets(st.sampled_from(WORDS), min_size=5, max_size=40),
    b=st.sampled_from([1, 2, 4, 8]),
)
@settings(max_examples=100, deadline=None)
def test_bbit_estimator_is_exact_on_identical_sets(tokens, b):
    """b-bit MinHash sanity: identical sets match on every masked
    component, and the collision-corrected estimator
    (2^b·m − p)·u − i·p·(2^b−1) = 0 exactly when m = p and i = u."""
    p = 16
    sig = _minhash_sig(tokens, p)
    mask = (1 << b) - 1
    m = sum((x & mask) == (y & mask) for x, y in zip(sig, sig))
    assert m == p
    i = u = len(tokens)
    num = ((1 << b) * m - p) * u - i * p * ((1 << b) - 1)
    assert num == 0
