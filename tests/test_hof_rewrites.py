"""Adversarial property tests for the r11 higher-order-function
rewrites (VERDICT r11 #5).

The r11 `let1`/`zip_with`-over-slices rewrites (commits 15de1db,
0c9f0dd) claimed "values unchanged everywhere" — but that claim was
proven only on the friendly oracle corpora, the exact gap class the
r10 BPE bug came from.  This module pins each rewritten expression
against an INDEPENDENT plain-Python implementation of the documented
semantics, on hypothesis-generated pathological text: unicode
(combining marks, CJK, astral), empty strings, whitespace runs, tabs/
newlines (which Spark's space-only ``trim``/``' +'`` split treat
differently from str.split()), NUL bytes, and single-token documents.

Spark semantics the references replicate exactly (probed, not
assumed):
- ``F.trim`` strips ONLY U+0020 (not tab/newline) → ``s.strip(' ')``;
- ``F.split(s, ' +')`` keeps a single empty token for empty input
  (Java split limit -1) → ``re.split(' +', s)``;
- ``F.slice(a, 1, 0)`` is the empty array (the zip_with bigram shape
  on one-token docs).

Each expression is evaluated through a real Spark plan per example
(tiny LocalRelation — ConvertToLocalRelation folds it driver-side, so
300 examples stay cheap) and compared elementwise.

Rewrite sites pinned here:
- functions/text.py:shingles (feeds ALL MinHash/near-dup paths)
- streaming/linededup.py:lines_expr (the line-dedup unit)
- the zip_with bigram pair builder (plans/text.py PMI,
  plans/llmdata.py + pipelines/curation.py DSIR — same expression)
- functions/perceptron.py:hashed_bigram_features (full feature vector)
- the curation repetition gate's double-let-bound duplicate-trigram
  fraction (pipelines/curation.py)
- the shadow chunk/stride/CDC window-hash builders (plans/shadow.py)
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest
from hypothesis import given, settings

from tests.hypcfg import ex
from hypothesis import strategies as st

from pyspark.sql import functions as F

from kafkastreamsproject_spark.functions import text as TX

# ---------------------------------------------------------------------------
# Independent Python references (no imports from the code under test
# beyond the Columns themselves)
# ---------------------------------------------------------------------------


def py_tokens(s: str) -> list[str]:
    return re.split(" +", s.strip(" "))


def py_shingles(s: str, w: int) -> list[str]:
    toks = py_tokens(s)
    seen: list[str] = []
    for i in range(len(toks) - w + 1):
        sh = " ".join(toks[i : i + w])
        if sh not in seen:
            seen.append(sh)  # array_distinct keeps first occurrence
    return seen


def py_lines(s: str, w: int) -> list[str]:
    toks = py_tokens(s)
    return [
        " ".join(toks[i * w : (i + 1) * w])
        for i in range((len(toks) - 1) // w + 1)
    ]


def py_bigrams(s: str) -> list[str]:
    toks = py_tokens(s)
    return [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]


def py_md5_bucket(s: str, n: int) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) % n


def py_bigram_features(s: str, n_buckets: int) -> list[int]:
    toks = py_tokens(s)
    counts = [0] * n_buckets
    if len(toks) >= 2:
        for bg in py_bigrams(s):
            counts[py_md5_bucket(bg, n_buckets)] += 1
    return counts + [1]  # trailing bias dimension


def py_repetition_keep(s: str, cap: float) -> bool:
    toks = py_tokens(s)
    if len(toks) < 3:
        return True
    tris = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    dup_frac = (len(tris) - len(set(tris))) / len(tris)
    return dup_frac <= cap


def py_window_hashes(s: str, w: int, stride: int) -> list[str]:
    toks = py_tokens(s)
    return [
        hashlib.md5(" ".join(toks[i : i + w]).encode("utf-8")).hexdigest()
        for i in range(0, len(toks) - w + 1, stride)
    ]


# ---------------------------------------------------------------------------
# Pathological text strategy: raw unicode (hypothesis's full repertoire
# minus surrogates), space-joined word lists (empty words → space
# runs), and a pinned set of known-nasty shapes
# ---------------------------------------------------------------------------

# Exclude the surrogate category (Cs): a LONE surrogate is legal in a
# Python str but not encodable as UTF-8, so the JVM round-trip maps it
# to U+FFFD and the comparison fails on an input that can never reach
# these expressions from parquet-decoded text.  Paired surrogates are
# covered anyway — hypothesis emits astral-plane codepoints directly.
_CHARS = st.characters(exclude_categories=("Cs",))
_WORD = st.text(
    alphabet=st.characters(exclude_characters=" ", exclude_categories=("Cs",)),
    min_size=0,
    max_size=6,
)
TEXTS = st.one_of(
    st.text(alphabet=_CHARS, max_size=60),
    st.lists(_WORD, min_size=0, max_size=14).map(" ".join),
    st.sampled_from(
        [
            "",
            " ",
            "      ",
            "\t",
            "\n \n",
            "a",
            " pad ",
            "a  b   c",
            "a b c",  # NBSP is NOT a separator for ' +'
            "\x00 \x00",
            "ż ż ż ż ż ż",  # repeated multi-byte token
            "x " * 30,
        ]
    ),
)


def _eval(spark, text: str, col) -> object:
    """One-row LocalRelation evaluation of ``col`` over column ``t``."""
    df = spark.createDataFrame(pd.DataFrame({"t": [text]}))
    return df.select(col.alias("v")).collect()[0].v


@given(s=TEXTS, w=st.sampled_from([2, 3, 5]))
@settings(max_examples=ex(300), deadline=None)
def test_shingles_match_python_on_pathological_text(spark, s, w):
    # shingles requires size >= w (callers filter first; sequence(1, <1)
    # would descend into slice(ts, 0, ·) otherwise) — mirror the guard
    if len(py_tokens(s)) < w:
        return
    assert _eval(spark, s, TX.shingles(F.col("t"), w)) == py_shingles(s, w)


@given(s=TEXTS, w=st.sampled_from([3, 12]))
@settings(max_examples=ex(300), deadline=None)
def test_lines_expr_matches_python_on_pathological_text(spark, s, w):
    from kafkastreamsproject_spark.streaming.linededup import lines_expr

    got = _eval(spark, s, lines_expr(TX.tokens(F.col("t")), w))
    assert got == py_lines(s, w)


@given(s=TEXTS)
@settings(max_examples=ex(300), deadline=None)
def test_zipwith_bigram_pairs_match_python(spark, s):
    """The shared zip_with-over-slices bigram shape (PMI builder,
    DSIR feature builder, curation DSIR stage)."""
    toks = TX.tokens(F.col("t"))
    col = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    assert _eval(spark, s, col) == py_bigrams(s)


@given(s=TEXTS)
@settings(max_examples=ex(300), deadline=None)
def test_dsir_hashed_features_match_python(spark, s):
    """The DSIR hashed-bigram feature ids (plans/llmdata.py:1276 and
    the identical pipelines/curation.py stage): md5-hash of each
    bigram mod 1024, only on docs with >= 2 tokens (callers filter)."""
    if len(py_tokens(s)) < 2:
        return
    toks = TX.tokens(F.col("t"))
    fhash = lambda c: (  # noqa: E731
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % 1024
    )
    col = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: fhash(F.concat_ws(" ", a, b)),
    )
    assert _eval(spark, s, col) == [
        py_md5_bucket(bg, 1024) for bg in py_bigrams(s)
    ]


@given(s=TEXTS)
@settings(max_examples=ex(300), deadline=None)
def test_perceptron_features_match_python(spark, s):
    """hashed_bigram_features after the r11 double-let rewrite: the
    full (n_buckets+1)-long count vector, including the <2-token
    all-zero gate and the bias dimension."""
    from kafkastreamsproject_spark.functions.perceptron import (
        DEFAULT_BUCKETS,
        hashed_bigram_features,
    )

    got = _eval(spark, s, hashed_bigram_features(F.col("t")))
    assert list(got) == py_bigram_features(s, DEFAULT_BUCKETS)


@given(s=TEXTS, cap=st.sampled_from([0.0, 0.3, 0.8]))
@settings(max_examples=ex(300), deadline=None)
def test_repetition_gate_matches_python(spark, s, cap):
    """The curation funnel's repetition gate (double let1: tokens
    bound once per trigram, trigrams once per reference) — pinned as
    the full keep/drop PREDICATE, exactly as pipelines/curation.py
    applies it."""
    toks = TX.tokens(F.col("t"))
    tris = TX.let1(
        toks,
        lambda ts: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(ts) - 2, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(ts, i, 3)),
        ),
    )
    dup_frac = TX.let1(
        tris,
        lambda tr: (F.size(tr) - F.size(F.array_distinct(tr)))
        / F.size(tr).cast("double"),
    )
    keep = (F.size(toks) < 3) | (dup_frac <= cap)
    assert bool(_eval(spark, s, keep)) == py_repetition_keep(s, cap)


@given(s=TEXTS, shape=st.sampled_from([(20, 20), (20, 10), (20, 1), (8, 3)]))
@settings(max_examples=ex(300), deadline=None)
def test_chunk_window_hashes_match_python(spark, s, shape):
    """The let1-rewritten chunk/stride/CDC window-hash builders
    (plans/shadow.py chunk_dedup_stats / stride_chunk_dedup_stats /
    cdc_chunk_dedup_stats): md5 over each w-token window at the given
    stride, on docs with >= w tokens (callers filter)."""
    w, stride = shape
    if len(py_tokens(s)) < w:
        return
    toks = TX.tokens(F.col("t"))
    col = TX.let1(
        toks,
        lambda ts: F.transform(
            F.sequence(F.lit(1), F.size(ts) - (w - 1), F.lit(stride)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(ts, i, w))),
        ),
    )
    assert _eval(spark, s, col) == py_window_hashes(s, w, stride)


def test_references_are_not_vacuous():
    """The guards above skip under-width docs; make sure the
    strategies actually exercise the non-trivial branches (a guard
    that always fires would green-wash every property)."""
    long_doc = "x " * 30
    assert len(py_shingles(long_doc, 5)) == 1  # all-same shingles dedup
    assert py_window_hashes(long_doc.strip(), 20, 10)
    assert not py_repetition_keep("a b c a b c a b c", 0.0)
    assert py_repetition_keep("a b", 0.0)
    assert py_bigram_features("a b a b", 4)[-1] == 1
