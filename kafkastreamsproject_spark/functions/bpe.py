"""Byte-pair-encoding merge learning over a word-frequency relation.

The trainer's working state is the (word, frequency) table — |vocab|
rows — never the corpus: this is the standard scale shape of production
BPE training (count words once, iterate on the counts).  Each merge
step is

1. weighted adjacent-pair counts: explode ``substr(w, i, 2)`` for
   i in 1..len-1 (overlapping occurrences each count: 'aaa' → two
   'aa'), SUM(f) per pair — an |alphabet+merges|²-bounded aggregation;
2. argmax pair with a deterministic (count DESC, pair ASC) tie-break —
   a single-partition window over that bounded table;
3. merge application: simultaneous left-to-right non-overlapping
   ``replace`` of the pair with a single PLACEHOLDER character, so a
   symbol sequence stays a plain string and step 1 stays
   ``substr(w, i, 2)`` forever (no array-of-struct symbol state).

Placeholders are the digit characters '0'..'9' (max 10 steps); callers
must feed words that cannot contain them (the registry query filters
to ^[a-z]+$, and :func:`learn_bpe` re-filters defensively).  Every
rule is engine-portable integer/string arithmetic, so the DuckDB
oracle (plans/text.py) matches bit-for-bit, and the semantics are
pinned against an independent Python reference trainer in
tests/test_operator_properties.py.
"""

from __future__ import annotations

import string

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_PLACEHOLDERS = string.digits


def _pair_counts(words: DataFrame) -> DataFrame:
    pairs = F.explode(
        F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
    )
    return (
        words.filter(F.length("w") >= 2)
        .select(pairs.alias("pair"), "f")
        .groupBy("pair")
        .agg(F.sum("f").alias("cnt"))
    )


def _best(pairs: DataFrame) -> DataFrame:
    # global argmax over the alphabet²-bounded pair table — the
    # single-partition window is ≤ (|alphabet| + steps)² rows by design
    wb = W.orderBy(F.col("cnt").desc(), F.col("pair"))
    return (
        pairs.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("pair", "cnt")
    )


def _apply_merge(words: DataFrame, best: DataFrame, ph: str) -> DataFrame:
    m = best.select(F.col("pair").alias("m"))
    return words.crossJoin(F.broadcast(m)).select(
        F.replace(F.col("w"), F.col("m"), F.lit(ph)).alias("w"), "f"
    )


def _expand(col: Column, k: int) -> Column:
    """Replace placeholders 0..k-1 in ``col`` with their fully-expanded
    merge strings (columns m0..m{k-1} must be in scope)."""
    out = col
    for j in range(k):
        out = F.replace(
            out, F.lit(_PLACEHOLDERS[j]), _expand(F.col(f"m{j}"), j)
        )
    return out


def learn_bpe(words: DataFrame, n_steps: int = 3) -> DataFrame:
    """Learn the first ``n_steps`` BPE merges from a ``(w, f)``
    word-frequency relation; returns ``(step, merge_pair, cnt)`` with
    merges expanded back to base characters.

    Precondition: words contain no digit characters (the placeholder
    alphabet); offending rows are filtered out, identically to the
    oracle's ^[a-z]+$ guard.
    """
    if not 1 <= n_steps <= len(_PLACEHOLDERS):
        raise ValueError(f"n_steps must be in 1..{len(_PLACEHOLDERS)}")
    cur = words.filter(~F.col("w").rlike("[0-9]"))
    merges: list[DataFrame] = []
    for k in range(n_steps):
        b = _best(_pair_counts(cur))
        merges.append(b)
        if k < n_steps - 1:
            cur = _apply_merge(cur, b, _PLACEHOLDERS[k])

    out: DataFrame | None = None
    for k, b in enumerate(merges):
        r = b
        for j in range(k):
            r = r.crossJoin(
                F.broadcast(merges[j].select(F.col("pair").alias(f"m{j}")))
            )
        r = r.select(
            F.lit(k + 1).alias("step"),
            _expand(F.col("pair"), k).alias("merge_pair"),
            "cnt",
        )
        out = r if out is None else out.unionByName(r)
    assert out is not None
    return out
