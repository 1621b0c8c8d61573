"""Cross-engine parity of the BPE-ish pre-tokenizer (functions/text.py).

The pattern must mean the same thing to Java regex (Spark), RE2
(DuckDB), and Python ``re`` — it is deliberately lookahead-free so all
three agree.  The synthetic corpus is plain lowercase words, so these
tests supply the punctuation/contraction/digit shapes the corpus lacks.
"""

from __future__ import annotations

import re

import pytest

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from kafkastreamsproject_spark.functions import text as TX
from pyspark.sql import functions as F

TRICKY = [
    "the cat's hat isn't 42 dogs!",
    "a-b c_d 3.14",
    "it'll we've I'd",
    "  spaces  everywhere  ",
    "UPPER lower MiXeD 000",
    "!!!",
    "x",
]


def _py_count(s: str) -> int:
    return sum(1 for _ in re.finditer(TX.BPE_ISH_PATTERN, s))


def test_bpe_ish_spark_matches_duckdb_and_python(spark):
    pdf = pd.DataFrame({"doc_id": range(len(TRICKY)), "text": TRICKY})
    sdf = spark.createDataFrame(pdf)
    got = {
        r.doc_id: r.n
        for r in sdf.select(
            "doc_id", TX.n_bpe_tokens(F.col("text")).alias("n")
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    want = dict(
        con.execute(f"SELECT doc_id, {TX.sql_n_bpe_tokens()} FROM documents").fetchall()
    )
    con.close()
    assert got == want
    assert got == {i: _py_count(s) for i, s in enumerate(TRICKY)}


@given(
    st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_bpe_ish_duckdb_matches_python(s: str):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": [s]}))
    (n,) = con.execute(f"SELECT {TX.sql_n_bpe_tokens()} FROM documents").fetchone()
    con.close()
    assert n == _py_count(s)


# ---------------------------------------------------------------------------
# BPE merge learning (functions/bpe.py): the distributed trainer must
# match an independent pure-Python reference implementing the same
# documented semantics (overlapping pair counts, count-DESC/pair-ASC
# tie-break, left-to-right non-overlapping merge application).
# ---------------------------------------------------------------------------


def _ref_bpe(words: dict, n_steps: int):
    from kafkastreamsproject_spark.functions.bpe import placeholder

    expansions: dict = {}
    cur = dict(words)
    out = []
    for k in range(n_steps):
        cnt: dict = {}
        for w, f in cur.items():
            for i in range(len(w) - 1):
                pair = w[i : i + 2]
                cnt[pair] = cnt.get(pair, 0) + f
        if not cnt:
            break
        pair, c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        expanded = "".join(expansions.get(ch, ch) for ch in pair)
        out.append((k + 1, expanded, c))
        expansions[placeholder(k)] = expanded
        cur = {w.replace(pair, placeholder(k)): f for w, f in cur.items()}
    return out


def test_learn_bpe_matches_python_reference(spark):
    """Small corpora, 12 steps — past the old 10-step digit cap, so the
    placeholder scheme itself (not just the first merges) is pinned."""
    from kafkastreamsproject_spark.functions.bpe import learn_bpe

    corpora = [
        # classic: shared suffixes dominate
        {"low": 5, "lower": 2, "lowest": 6, "newer": 3, "wider": 1},
        # overlap semantics: 'aaaa' counts 'aa' three times per copy
        {"aaaa": 3, "ab": 1, "ba": 1},
        # total tie: every pair count 1 → lexicographic winner chain
        {"abcd": 1},
        # merged symbol participates in later pairs
        {"banana": 4, "bandana": 2, "nab": 5},
    ]
    for words in corpora:
        df = spark.createDataFrame(list(words.items()), ["w", "f"])
        got = sorted(
            (r["step"], r["merge_pair"], r["cnt"])
            for r in learn_bpe(df, n_steps=12).collect()
        )
        want = sorted(_ref_bpe(words, 12))
        assert got == want, (words, got, want)


@pytest.mark.slowsuite  # r16: slowest-tail; deselected by default (pyproject addopts), run via -m slowsuite
def test_learn_bpe_runs_120_steps(spark):
    """The r7 verdict's ask: ≥100 merges.  A synthetic vocab rich
    enough to sustain 120 distinct merges must match the reference
    trainer step-for-step — exercising placeholder indices far past
    the retired digit alphabet and the lineage-truncation path."""
    import itertools
    import string

    from kafkastreamsproject_spark.functions.bpe import learn_bpe

    words = {
        "".join(t): (i * 7) % 13 + 1
        for i, t in enumerate(
            itertools.islice(
                itertools.product(string.ascii_lowercase[:12], repeat=4), 400
            )
        )
    }
    df = spark.createDataFrame(list(words.items()), ["w", "f"])
    got = sorted(
        (r["step"], r["merge_pair"], r["cnt"])
        for r in learn_bpe(df, n_steps=120).collect()
    )
    want = sorted(_ref_bpe(words, 120))
    assert len(want) == 120, len(want)
    assert got == want


def test_learn_bpe_stops_when_no_pairs_remain(spark):
    from kafkastreamsproject_spark.functions.bpe import learn_bpe

    df = spark.createDataFrame([("ab", 3), ("cd", 1)], ["w", "f"])
    got = sorted(
        (r["step"], r["merge_pair"], r["cnt"])
        for r in learn_bpe(df, n_steps=50).collect()
    )
    # after merging 'ab' and 'cd' every word is a single symbol
    assert got == [(1, "ab", 3), (2, "cd", 1)]


def test_bpe_encode_roundtrip_and_token_counts(spark):
    """apply_merges is a faithful BPE encoder: expanding every
    placeholder in the encoded string recovers the original word
    (lossless), and the encoded length (= subword count) matches an
    independent Python encode applying the same rules in order."""
    from kafkastreamsproject_spark.functions.bpe import (
        apply_merges,
        learn_bpe_rules,
    )

    words = {"low": 5, "lower": 2, "lowest": 6, "newer": 3, "wider": 1,
             "banana": 4, "bandana": 2, "nab": 5}
    df = spark.createDataFrame(list(words.items()), ["w", "f"])
    rules = learn_bpe_rules(df, n_steps=8)
    got = {
        r["w"]: r["enc"]
        for r in df.select(
            "w", apply_merges(F.col("w"), rules).alias("enc")
        ).collect()
    }
    expansions = {ph: full for _, ph, full, _ in rules}
    for w in words:
        enc = w
        for pair, ph, _, _ in rules:  # independent Python encode
            enc = enc.replace(pair, ph)
        assert got[w] == enc, w
        # losslessness: every symbol expands back to the original word
        assert "".join(expansions.get(ch, ch) for ch in got[w]) == w
        assert len(got[w]) <= len(w)


def _batched_vs_sequential(words, batch_k, n_steps=15):
    """Pure-Python harness: run the one-at-a-time trainer as truth and
    the batched trainer (top-batch_k per recount + _commit_prefix with
    per-pair adj3 context bounds, exactly mirroring learn_bpe_rules's
    driver loop) and return (batched, sequential) merge lists."""
    from kafkastreamsproject_spark.functions.bpe import (
        _commit_prefix,
        placeholder,
    )

    def pair_counts(cur):
        cnt = {}
        for w, f in cur.items():
            for i in range(len(w) - 1):
                p = w[i : i + 2]
                cnt[p] = cnt.get(p, 0) + f
        return cnt

    def adj3_bounds(cur):
        # per pair, max weighted trigram count over trigrams having
        # the pair as prefix or suffix — mirrors bpe._pair_stats
        tri = {}
        for w, f in cur.items():
            for i in range(len(w) - 2):
                t = w[i : i + 3]
                tri[t] = tri.get(t, 0) + f
        adj = {}
        for t, c in tri.items():
            for p in (t[:2], t[1:]):
                adj[p] = max(adj.get(p, 0), c)
        return adj

    def apply(cur, pair, k):
        out = {}
        for w, f in cur.items():
            w2 = w.replace(pair, placeholder(k))
            out[w2] = out.get(w2, 0) + f
        return out

    # truth: strictly one merge per recount
    seq = []
    cur = dict(words)
    for k in range(n_steps):
        cnt = pair_counts(cur)
        if not cnt:
            break
        pair, c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        seq.append((pair, c))
        cur = apply(cur, pair, k)

    # batched: top-batch_k per recount + _commit_prefix
    got = []
    cur = dict(words)
    while len(got) < n_steps:
        cnt = pair_counts(cur)
        if not cnt:
            break
        adj = adj3_bounds(cur)
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        cands = [(p, c, adj.get(p, 0)) for p, c in ranked[:batch_k]]
        batch = _commit_prefix(
            cands,
            fetched_all=len(ranked) <= batch_k,
            max_commits=n_steps - len(got),
        )
        for pair, c in batch:
            cur = apply(cur, pair, len(got))
            got.append((pair, c))

    return got, seq


@given(
    words=st.dictionaries(
        st.text(alphabet="abcde", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    ),
    batch_k=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=300, deadline=None)
def test_commit_prefix_matches_sequential_trainer(words, batch_k):
    """The batched argmax's driver-side conflict resolution
    (functions/bpe.py:_commit_prefix) commits EXACTLY the merges the
    one-at-a-time trainer would produce, on arbitrary corpora.  The
    tiny 5-letter alphabet maximizes symbol collisions, i.e. maximally
    stresses the overlap/dominance/creatable-pair rules."""
    got, seq = _batched_vs_sequential(words, batch_k)
    assert got == seq, (words, batch_k, got, seq)


def test_commit_prefix_r10_counterexample():
    """Pinned regression (VERDICT r10 #1): merging 'ee' in {'eee': 2}
    CREATES the pair 'Āe' (count 2), which out-ranks the fetched
    candidate 'aa' (count 1); the pre-fix dominance check could not
    see created pairs and committed 'aa' early.  Rule (4)'s adj3 bound
    must cut the batch after 'ee'."""
    words = {"aa": 1, "eee": 2}
    got, seq = _batched_vs_sequential(words, batch_k=2)
    assert seq[:2] == [("ee", 4), ("Āe", 2)]
    assert got == seq, (got, seq)


def test_let1_preserves_values_across_types(spark):
    """let1 (the single-element-array transform let-binding) is an
    identity wrapper: body(bound) equals body(expr) for array and
    scalar payloads — the perf idiom must never change values."""
    from kafkastreamsproject_spark.functions import text as TX

    df = spark.createDataFrame(
        [("a b c d e",), ("x",), ("",)], ["text"]
    )
    toks = TX.tokens(F.col("text"))
    direct = F.size(toks) + F.size(toks)
    bound = TX.let1(toks, lambda t: F.size(t) + F.size(t))
    rows = df.select(direct.alias("d"), bound.alias("b")).collect()
    assert all(r.d == r.b for r in rows), rows
    # scalar payloads bind too
    got = df.select(
        TX.let1(F.length("text"), lambda n: n * 2).alias("v")
    ).collect()
    assert [r.v for r in got] == [9 * 2, 1 * 2, 0]


def test_shingles_match_reference_python(spark):
    """shingles() after the let1 rewrite still equals a plain Python
    sliding-window reference on varied lengths (incl. below-width)."""
    from kafkastreamsproject_spark.functions import text as TX

    texts = [
        "a b c d e f g",
        "one two three four five",
        "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10",
        "a a a a a a",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {
        r.text: sorted(r.sh)
        for r in df.select(
            "text", TX.shingles(F.col("text"), 5).alias("sh")
        ).collect()
    }
    for t in texts:
        ws = t.split()
        want = sorted({" ".join(ws[i : i + 5]) for i in range(len(ws) - 4)})
        assert got[t] == want, t
