"""Adversarial property tests for driver-side exactness claims
(VERDICT r10 #2).

The r9 batched-BPE commit rule was "provably exact" for a full round
until a property test falsified it.  Every other operator that makes a
driver-side or per-partition shortcut with an exactness claim gets the
same treatment here: a pure-Python mirror of the REAL implementation
path is stressed against a straightforward sequential simulation under
adversarial inputs, ≥300 examples each.

Claims covered:
- FFD packing (operators/packing.py:_ffd_pack): the vectorized numpy
  first-fit sweep produces EXACTLY the assignment of a plain
  sequential first-fit-decreasing loop — tested on the real pandas
  function, no Spark session needed.
- Misra-Gries superset rule (operators/heavyhitters.py:mg_summary):
  for ANY split of a stream into partitions and ANY batch boundaries
  within a partition, every value with global frequency > n/k appears
  in the union of per-partition summaries — the guarantee
  heavy_hitters_exact's pruning correctness rests on.
- Prefix-filter completeness under WIDE alphabets/set sizes (the
  original pin in test_properties.py uses tokens 0..120 and sets ≤40;
  this one goes to 2000-token universes and 300-element sets, where
  the integer prefix formula's rounding is exercised far from the
  small-n regime).
"""

from __future__ import annotations

import pandas as pd

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# FFD packing: the real numpy implementation vs a sequential simulation
# ---------------------------------------------------------------------------


def _sequential_ffd(rows: list[tuple[int, int]], budget: int):
    """Textbook first-fit-decreasing, one doc at a time: sort by
    (n_tokens desc, doc_id asc), place each doc in the FIRST open pack
    with room, else open a new pack; oversize docs own a closed pack."""
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    remaining: list[int] = []
    assign: dict[int, int] = {}
    overflow: dict[int, bool] = {}
    for doc, t in order:
        if t > budget:
            assign[doc] = len(remaining)
            overflow[doc] = True
            remaining.append(-1)
            continue
        overflow[doc] = False
        for i, r in enumerate(remaining):
            if r >= t:
                remaining[i] = r - t
                assign[doc] = i
                break
        else:
            assign[doc] = len(remaining)
            remaining.append(budget - t)
    return assign, overflow


# adversarial size mixes: long runs of EQUAL sizes (argmax tie paths),
# sizes straddling budget/2 and budget (half-full boundary), oversize
# docs interleaved, and tiny fillers
_tok_sizes = st.one_of(
    st.integers(min_value=1, max_value=130),
    st.sampled_from([1, 2, 49, 50, 51, 99, 100, 101, 120]),
)


@given(
    toks=st.lists(_tok_sizes, min_size=1, max_size=80),
    budget=st.integers(min_value=1, max_value=100),
)
@settings(max_examples=300, deadline=None)
def test_ffd_pack_matches_sequential_simulation(toks, budget):
    """operators/packing.py:_ffd_pack (the REAL vectorized function,
    called directly on a pandas shard) assigns every doc to exactly
    the pack the sequential FFD loop would — pack indices, overflow
    flags, and pack token sums all identical."""
    from kafkastreamsproject_spark.operators.packing import _ffd_pack

    rows = list(enumerate(toks))
    got = _ffd_pack((7,), pd.DataFrame({"doc_id": [d for d, _ in rows],
                                        "n_tokens": [t for _, t in rows]}),
                    budget)
    assign, overflow = _sequential_ffd(rows, budget)

    assert len(got) == len(rows)
    assert (got["shard_id"] == 7).all()
    got_assign = {int(r.doc_id): r.pack_id for r in got.itertuples()}
    want_assign = {d: f"7-{p}" for d, p in assign.items()}
    assert got_assign == want_assign
    got_overflow = {int(r.doc_id): bool(r.overflow) for r in got.itertuples()}
    assert got_overflow == overflow
    # pack_tokens: sum of members, and ≤ budget for non-overflow packs
    sums: dict[str, int] = {}
    for d, t in rows:
        sums[want_assign[d]] = sums.get(want_assign[d], 0) + t
    for r in got.itertuples():
        assert int(r.pack_tokens) == sums[r.pack_id]
        if not r.overflow:
            assert int(r.pack_tokens) <= budget


# ---------------------------------------------------------------------------
# Misra-Gries: per-partition summaries form a superset of heavy hitters
# ---------------------------------------------------------------------------


@given(
    stream=st.lists(
        st.integers(min_value=0, max_value=9), min_size=1, max_size=200
    ),
    cuts=st.lists(
        st.integers(min_value=0, max_value=200), min_size=0, max_size=8
    ),
    batch_cuts=st.lists(
        st.integers(min_value=0, max_value=200), min_size=0, max_size=8
    ),
    k=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=300, deadline=None)
def test_mg_candidates_superset_under_any_partitioning(
    stream, cuts, batch_cuts, k
):
    """The exact rule heavy_hitters_exact relies on: for ANY partition
    split AND any Arrow batch boundaries within each partition, the
    union of Misra-Gries summaries (operators/heavyhitters.py:
    mg_summary, the real per-partition kernel) contains every value
    with global frequency > n/k.  The 10-value alphabet forces heavy
    counter churn (the decrement-all path)."""
    from kafkastreamsproject_spark.operators.heavyhitters import mg_summary

    values = [str(v) for v in stream]
    n = len(values)
    bounds = sorted({min(c, n) for c in cuts} | {0, n})
    partitions = [
        values[a:b] for a, b in zip(bounds, bounds[1:]) if b > a
    ]

    surviving: set[str] = set()
    for part in partitions:
        # arbitrary batch boundaries inside the partition: state must
        # carry across batches exactly as mapInPandas delivers them
        pb = sorted({min(c, len(part)) for c in batch_cuts} | {0, len(part)})
        batches = [
            pd.DataFrame({"v": part[a:b]})
            for a, b in zip(pb, pb[1:])
            if b > a
        ]
        surviving |= set(mg_summary(batches, "v", k))

    from collections import Counter

    counts = Counter(values)
    heavy = {v for v, c in counts.items() if c > n / k}
    assert heavy <= surviving, (heavy - surviving, k, partitions)


def test_mg_summary_size_bounded():
    """A summary never holds more than k counters — the bound that
    caps the candidate shuffle at k·partitions."""
    from kafkastreamsproject_spark.operators.heavyhitters import mg_summary

    batches = [pd.DataFrame({"v": [str(i % 50) for i in range(500)]})]
    for k in (1, 3, 10):
        assert len(mg_summary(batches, "v", k)) <= k


# ---------------------------------------------------------------------------
# Prefix filter: completeness far from the small-n regime
# ---------------------------------------------------------------------------


@given(
    a=st.sets(st.integers(0, 1999), min_size=2, max_size=300),
    del_frac=st.floats(min_value=0.0, max_value=0.35),
    adds=st.sets(st.integers(2000, 2399), max_size=40),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=300, deadline=None)
def test_prefix_filtering_completeness_wide(a, del_frac, adds, seed):
    """The prefix-filtering lemma (plans/dedup.py
    prefix_filter_jaccard_pairs, t = 7/10) at 2000-token universes and
    300-element sets: any pair with 10·|A∩B| ≥ 7·|A∪B| shares a token
    inside BOTH prefixes of length n − ceil(7n/10) + 1, under an
    arbitrary (seeded-hash) global token order.  ``b`` is derived from
    ``a`` by deletions+insertions so the generator lands a dense
    spread of Jaccard values straddling the 0.7 threshold (two
    independent sets would never meet it — the guarantee would go
    untested)."""
    srt = sorted(a)
    b = set(srt[int(len(srt) * del_frac):]) | adds
    if not b:
        return
    inter = len(a & b)
    union = len(a | b)
    if 10 * inter < 7 * union:
        return  # below threshold — no guarantee claimed
    import hashlib

    key = lambda t: hashlib.md5(f"{seed}:{t}".encode()).hexdigest()  # noqa: E731

    def prefix(s):
        n = len(s)
        p = n - ((7 * n + 9) // 10) + 1
        assert p >= 1
        return set(sorted(s, key=key)[:p])

    assert prefix(a) & prefix(b), (
        f"pair at jaccard {inter}/{union} missed by wide prefix filter"
    )


def _sequential_bfd(rows: list[tuple[int, int]], budget: int):
    """Textbook best-fit-decreasing: place each doc in the open pack
    with the SMALLEST remaining capacity that fits (ties to the lowest
    index); oversize docs own a closed pack."""
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    remaining: list[int] = []
    assign: dict[int, int] = {}
    for doc, t in order:
        if t > budget:
            assign[doc] = len(remaining)
            remaining.append(-1)
            continue
        fits = [(r, i) for i, r in enumerate(remaining) if r >= t]
        if fits:
            _, i = min(fits)
            remaining[i] -= t
            assign[doc] = i
        else:
            assign[doc] = len(remaining)
            remaining.append(budget - t)
    return assign


@given(
    toks=st.lists(_tok_sizes, min_size=1, max_size=80),
    budget=st.integers(min_value=1, max_value=100),
)
@settings(max_examples=300, deadline=None)
def test_bfd_pack_matches_sequential_simulation(toks, budget):
    """The best_fit=True branch of operators/packing.py:_ffd_pack (the
    REAL vectorized kernel) assigns every doc to exactly the pack the
    sequential best-fit-decreasing loop would."""
    from kafkastreamsproject_spark.operators.packing import _ffd_pack

    rows = list(enumerate(toks))
    got = _ffd_pack(
        (3,),
        pd.DataFrame({"doc_id": [d for d, _ in rows],
                      "n_tokens": [t for _, t in rows]}),
        budget,
        best_fit=True,
    )
    assign = _sequential_bfd(rows, budget)
    got_assign = {int(r.doc_id): r.pack_id for r in got.itertuples()}
    assert got_assign == {d: f"3-{p}" for d, p in assign.items()}
    for r in got.itertuples():
        if not r.overflow:
            assert int(r.pack_tokens) <= budget


# ---------------------------------------------------------------------------
# Winnowing: the (w + k - 1)-token detection guarantee
# ---------------------------------------------------------------------------


def _py_winnow(tokens: list[str], k: int = 3, w: int = 4) -> set[int]:
    """Python mirror of plans/dedup.py:_winnow_fps (md5-prefix k-gram
    hashes, per-window minima, distinct)."""
    import hashlib

    kg = [
        int(hashlib.md5(" ".join(tokens[i : i + k]).encode()).hexdigest()[:8], 16)
        for i in range(len(tokens) - k + 1)
    ]
    return {min(kg[i : i + w]) for i in range(len(kg) - w + 1)}


@given(
    left=st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=20),
    right=st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=20),
    shared=st.lists(st.sampled_from("qrstuv"), min_size=6, max_size=15),
    other=st.lists(st.sampled_from("ijklmnop"), min_size=6, max_size=30),
)
@settings(max_examples=300, deadline=None)
def test_winnowing_detection_guarantee(left, right, shared, other):
    """Schleimer/Wilkerson/Aiken's floor, on the repo's exact k=3/w=4
    parameters: two documents sharing a verbatim run of >= w + k - 1
    tokens ALWAYS share at least one winnowed fingerprint.  The shared
    run uses a disjoint alphabet so the guarantee is tested through
    the planted overlap, not accidental collisions; doc B embeds the
    run at a different position with different surroundings."""
    doc_a = left + shared + right
    doc_b = other + shared
    assert len(shared) >= 3 + 4 - 1
    fa = _py_winnow(doc_a)
    fb = _py_winnow(doc_b)
    assert fa & fb, (doc_a, doc_b)
