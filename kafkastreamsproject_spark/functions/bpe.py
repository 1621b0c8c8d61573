"""Byte-pair-encoding merge learning over a word-frequency relation.

The trainer's working state is the (word, frequency) table — |vocab|
rows — never the corpus: this is the standard scale shape of production
BPE training (count words once, iterate on the counts).  Each merge
step is

1. weighted adjacent-pair counts: explode ``substr(w, i, 2)`` for
   i in 1..len-1 (overlapping occurrences each count: 'aaa' → two
   'aa'), SUM(f) per pair — an |alphabet+merges|²-bounded aggregation;
2. argmax pair with a deterministic (count DESC, pair ASC) tie-break —
   a TakeOrdered(1) over that bounded table, collected to the driver
   (ONE row per step, the same sanctioned bounded collect as the
   MLlib-style iterative algorithms and operators/incremental.py);
3. merge application: simultaneous left-to-right non-overlapping
   ``replace`` of the pair with a single PLACEHOLDER character, so a
   symbol sequence stays a plain string and step 1 stays
   ``substr(w, i, 2)`` forever (no array-of-struct symbol state).

Placeholders are single characters from U+0100 upward (Latin
Extended-A onward): 768 of them, so the trainer runs the hundreds of
merge steps a real subword vocabulary needs — the previous design's
digit placeholders capped it at 10.  Both engines (and the Python
reference trainer) compare strings in UTF-8 binary order, which equals
codepoint order, so the pair-ASC tie-break is engine-portable even
with the non-ASCII placeholders; callers must feed words that cannot
contain them (the registry query filters to ``^[a-z]+$``, and
:func:`learn_bpe` re-filters defensively with the same anchor).

The word relation's lineage is truncated with an eager
``localCheckpoint`` every few steps, so a 100-step run keeps constant
plan depth instead of stacking 100 replaces into one Catalyst tree.
Semantics are pinned against an independent Python reference trainer
in tests/test_text_functions.py (including past 10 steps), and the
registry query ``bpe_merge_steps`` (plans/text.py) cross-checks a
12-step run against a generated DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: first placeholder codepoint — above ASCII, below surrogates, each a
#: single character in both engines' character-based string functions
_PLACEHOLDER_BASE = 0x0100

#: hard step cap: contiguous single-char placeholders U+0100..U+03FF
MAX_STEPS = 0x0400 - _PLACEHOLDER_BASE

#: truncate the word relation's lineage this often
_CHECKPOINT_EVERY = 8


def placeholder(k: int) -> str:
    """The single-character symbol standing for merge ``k`` (0-based)."""
    if not 0 <= k < MAX_STEPS:
        raise ValueError(f"merge index {k} outside 0..{MAX_STEPS - 1}")
    return chr(_PLACEHOLDER_BASE + k)


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


def learn_bpe_rules(
    words: DataFrame, n_steps: int = 3
) -> list[tuple[str, str, str, int]]:
    """Learn the first ``n_steps`` BPE merges from a ``(w, f)``
    word-frequency relation; returns the driver-side rule table as
    ``(raw_pair, placeholder, expanded, cnt)`` in merge order —
    ``raw_pair`` is the 2-symbol string in the working alphabet (may
    contain earlier placeholders), ``expanded`` its base-character
    expansion.

    Iteration shape: per step, ONE distributed pair-count aggregation
    (bounded by the symbol alphabet squared) and a TakeOrdered(1)
    argmax whose single winning row is collected — the rule table thus
    lives on the driver (as in every production BPE trainer), while
    the |vocab|-row word state never leaves the cluster.  Stops early
    if no adjacent pair remains.

    Precondition: words match ``^[a-z]+$`` (no placeholder characters);
    offending rows are filtered out, identically to the oracle's guard.
    """
    if not 1 <= n_steps <= MAX_STEPS:
        raise ValueError(f"n_steps must be in 1..{MAX_STEPS}")
    cur = words.filter(F.col("w").rlike("^[a-z]+$")).select("w", "f")

    merges: list[tuple[str, int]] = []
    for k in range(n_steps):
        top = (
            _pair_counts(cur)
            .orderBy(F.col("cnt").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        merges.append((pair, cnt))
        if k < n_steps - 1:
            cur = cur.select(
                F.replace(
                    F.col("w"), F.lit(pair), F.lit(placeholder(k))
                ).alias("w"),
                "f",
            )
            if (k + 1) % _CHECKPOINT_EVERY == 0:
                cur = cur.localCheckpoint(eager=True)

    # expansion back to base characters is pure driver-side string work
    # over the (≤ n_steps)-row rule table
    expansions: dict[str, str] = {}
    rules: list[tuple[str, str, str, int]] = []
    for k, (pair, cnt) in enumerate(merges):
        full = "".join(expansions.get(ch, ch) for ch in pair)
        expansions[placeholder(k)] = full
        rules.append((pair, placeholder(k), full, cnt))
    return rules


def learn_bpe(words: DataFrame, n_steps: int = 3) -> DataFrame:
    """Learn merges (see :func:`learn_bpe_rules`) and return them as a
    ``(step, merge_pair, cnt)`` DataFrame with merges expanded back to
    base characters."""
    rules = learn_bpe_rules(words, n_steps)
    return words.sparkSession.createDataFrame(
        [(k + 1, full, cnt) for k, (_, _, full, cnt) in enumerate(rules)],
        "step INT, merge_pair STRING, cnt BIGINT",
    )


def apply_merges(col: Column, rules: list[tuple[str, str, str, int]]) -> Column:
    """BPE ENCODE a working-alphabet word column: apply every learned
    merge in priority order (the standard BPE encode loop — each rule
    is a simultaneous left-to-right non-overlapping replace, exactly
    the semantics the rules were learned under).  The result's
    LENGTH is the word's subword-token count, since every symbol is
    one character by construction."""
    out = col
    for pair, ph, _, _ in rules:
        out = F.replace(out, F.lit(pair), F.lit(ph))
    return out
