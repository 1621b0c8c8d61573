"""Linear text classifier over hashed-bigram features, trained with
the full-batch perceptron rule — the engine's trainable quality
filter (fastText-style linear model in the GPT-3 / CCNet curation
role, Joulin et al. 2016).

The perceptron (Rosenblatt 1958) is used deliberately instead of
logistic regression: its update ``w += Σ_misclassified y·x`` is pure
integer arithmetic — no sigmoid, no learning-rate float — so a K-step
training trajectory is EXACTLY reproducible by an independent engine
(the DuckDB oracles of ``plans/llmdata.py:quality_classifier_train``
replay it CTE-by-CTE and the weights match bit-for-bit).

Scale shape:

- featurization is ROW-LOCAL: bigrams hash into ``n_buckets`` md5
  buckets in one pass, bucket counts come from in-row array filters,
  and the bias rides as the last dimension — nothing but (label,
  ~33 longs) ever leaves the row;
- each training step is ONE distributed aggregate: the current
  weights fold into the plan as whole-stage-codegen literals, the
  misclassified-set update comes back as ``dims`` longs (the bounded
  driver-state iterative-trainer shape sanctioned for
  ``kmeans_int8_lloyd`` and ``functions/bpe.py``);
- application is a pure scan — ``score(w)`` folds the trained
  weights into the plan as literals (zero shuffle, zero UDF), which
  is exactly how a fastText-style filter screens a 100 TB crawl.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafkastreamsproject_spark.functions import text as TX

DEFAULT_BUCKETS = 32


def hashed_bigram_features(
    text: Column, n_buckets: int = DEFAULT_BUCKETS
) -> Column:
    """``array<long>`` of ``n_buckets`` hashed-bigram counts plus a
    trailing constant-1 bias dimension (length ``n_buckets + 1``),
    computed entirely in-row.  Docs with fewer than 2 tokens get an
    all-zero feature block (bias still 1)."""
    toks = TX.tokens(text)
    # zip_with over two slices, not element_at(toks, i) inside a
    # transform lambda: higher-order functions evaluate interpreted
    # (no codegen subexpression elimination), so an indexed lambda
    # re-runs the tokenizing split per element — O(L²) per doc; the
    # slice pair evaluates it O(1) times per row.  For < 2 tokens the
    # slices are empty — the size-gate below zeroes those rows anyway
    # (identical to the old greatest(size-1, 1) construction's output).
    bks = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.conv(
            F.substring(F.md5(F.concat_ws(" ", a, b)), 1, 8), 16, 10
        ).cast("long")
        % n_buckets,
    )
    # bks is itself let-bound (TX.let1) before the per-bucket count
    # loop: the transform below references it once per bucket, which
    # would otherwise re-run the whole bigram-hash pass n_buckets times
    counts = F.when(
        F.size(toks) >= 2,
        TX.let1(
            bks,
            lambda bk: F.transform(
                F.sequence(F.lit(0), F.lit(n_buckets - 1)),
                lambda j: F.size(
                    F.filter(bk, lambda b: b == j.cast("long"))
                ).cast("long"),
            ),
        ),
    ).otherwise(
        F.array_repeat(F.lit(0).cast("long"), n_buckets)
    )
    return F.concat(counts, F.array(F.lit(1).cast("long")))


def dot_weights(x: Column, w: list[int]) -> Column:
    """``w·x`` with the integer weights folded in as codegen literals
    (zero-weight dims skipped)."""
    terms = [
        F.element_at(x, j + 1) * F.lit(int(w[j]))
        for j in range(len(w))
        if w[j] != 0
    ]
    if not terms:
        return F.lit(0).cast("long")
    return sum(terms[1:], terms[0])


def dot_weights_inline(x: Column, w: list[int]) -> Column:
    """``w·x`` evaluating ``x`` exactly ONCE — for scoring directly
    over the featurization EXPRESSION (un-materialized).  The literal-
    folded :func:`dot_weights` references its input once per non-zero
    dimension; over a persisted column that is pure codegen arithmetic,
    but over the raw hashed-bigram expression Catalyst's projection
    collapse would inline the whole higher-order-function subtree into
    every term (HOF subtrees defeat common-subexpression elimination —
    the minhash_signature_array lesson, ~33× here).  Zipping against
    the weight-array literal keeps one evaluation of ``x``."""
    warr = F.array(*[F.lit(int(v)).cast("long") for v in w])
    return F.aggregate(
        F.zip_with(x, warr, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def train_perceptron(
    feats: DataFrame, dims: int, steps: int, *, x_col: str = "x",
    y_col: str = "y",
) -> list[int]:
    """``steps`` full-batch perceptron steps over ``feats`` (columns
    ``y_col`` ∈ {−1,+1} and ``x_col`` = length-``dims`` long array).
    Each step is one distributed job; the misclassified-set update
    Σ y·x returns ``dims`` longs to the driver.  All-integer, so the
    weight sequence is engine-exact.  Persist ``feats`` first — the
    input is scanned once per step."""
    w = [0] * dims
    x = F.col(x_col)
    y = F.col(y_col)
    for _ in range(steps):
        row = (
            feats.filter((y * dot_weights(x, w)) <= 0)
            .agg(
                *[
                    F.sum(y * F.element_at(x, j + 1)).alias(f"d{j}")
                    for j in range(dims)
                ]
            )
            .first()
        )
        w = [w[j] + (row[f"d{j}"] or 0) for j in range(dims)]
    return w
