"""Vector math over ``array<float>`` columns — all JVM-side higher-order
functions (zip_with / aggregate / transform), no Python UDFs.

Precision contract: every product/sum is computed in DOUBLE (float32
inputs cast up before multiplying) and accumulated left-to-right, so
results are deterministic; scores surfaced to users/oracles are rounded
to 6 dp to absorb engine-level summation-order differences.

Scale notes (100 TB / billions of vectors):
- brute-force cosine is one scan of the corpus per query batch; the
  query side must be broadcast (tiny) so no shuffle of the corpus.
- the LSH path (hyperplane signatures) turns the all-pairs problem into
  a per-bucket problem: signature computation is a map-only pass, the
  only shuffle groups by bucket id, and candidate pairs are generated
  inside buckets (expected bucket size « corpus size).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential accumulation."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine(a, b) with the operand norms precomputed as columns.

    Same expression tree — ``dot(a,b) / (na · nb)`` over the same
    doubles — so the result is BIT-IDENTICAL to :func:`cosine` when
    ``na``/``nb`` are :func:`norm` of ``a``/``b``.  What changes is the
    evaluation count: inline ``cosine`` in a join projection runs THREE
    array-aggregate passes per PAIR (dot(a,b), dot(a,a), dot(b,b));
    materializing each side's norm once per ROW in a projection below
    the join leaves one pass per pair.  For a self-join scoring P pairs
    over n rows that is 3P → P + n array passes (r15 sweep:
    ann_lsh_neardup dominated by exactly this)."""
    return dot(a, b) / (na * nb)


# ---------------------------------------------------------------------------
# Hyperplane LSH (signed random projections)
# ---------------------------------------------------------------------------
# Hyperplane i has integer components h_i[j] = ((i*24 + j*2) % 97) - 48 —
# a deterministic, engine-portable pseudo-random pattern (no RNG, no
# float literals), so Spark and any SQL oracle compute bit-identical
# signatures.  Integer components keep each projection an exact double.
# The modulus must exceed both the plane count and the vector dim or the
# pattern cycles and planes repeat (the previous mod-7 pattern made
# plane 7 ≡ plane 0 — one of the 8 signature bits carried no
# information); 97 is prime and coprime to both strides, so planes
# 0..96 are pairwise-distinct patterns and all 64 components within a
# plane are distinct phases.

N_PLANES = 8

#: Target mean bucket occupancy for the adaptive plane count.  Pair work
#: inside a bucket is quadratic in its size, so holding E[|bucket|]
#: constant as the corpus grows keeps TOTAL candidate-pair work linear:
#: with p = log2(n / TARGET) planes, Σ|bucket|² ≈ n·TARGET under the
#: uniform model (skew adds a data-dependent factor on top — that part
#: is AQE skew-join's job, not the signature's).
LSH_TARGET_BUCKET = 32

#: Plane-count bounds.  The floor pins behavior at test scale (≤ ~65k
#: vectors all resolve to 8 planes, so oracle rows are stable across
#: sf0.001–0.1); the cap bounds SQL-side unrolling — 30 planes supports
#: ~34 B vectors at TARGET=32 before the cap binds.
LSH_MIN_PLANES = 8
LSH_MAX_PLANES = 30


def adaptive_n_planes(n_rows: int) -> int:
    """Plane count for a corpus of ``n_rows``: ceil(log2(n/TARGET)),
    clamped to [LSH_MIN_PLANES, LSH_MAX_PLANES].

    A FIXED plane count is the classic LSH scale trap: bucket occupancy
    grows linearly with the corpus, so candidate pairs grow
    quadratically (measured in scripts/scale_smoke.py: Σ bucket² grew
    ~95× for 10× docs at p=8).  Growing p with log2(n) holds occupancy
    ~constant.  The driver-side count() that feeds this is a
    parquet-metadata aggregate — the same statistics AQE reads, one
    cheap job, no data scan."""
    import math

    if n_rows <= 0:
        return LSH_MIN_PLANES
    p = math.ceil(math.log2(max(1.0, n_rows / LSH_TARGET_BUCKET)))
    return max(LSH_MIN_PLANES, min(LSH_MAX_PLANES, p))


def sql_adaptive_n_planes(table: str = "embeddings") -> str:
    """DuckDB twin of :func:`adaptive_n_planes` as a scalar subquery."""
    return (
        f"(SELECT GREATEST({LSH_MIN_PLANES}, LEAST({LSH_MAX_PLANES}, "
        f"CAST(CEIL(LOG2(GREATEST(1.0, COUNT(*) / {LSH_TARGET_BUCKET}.0))) AS INT))) "
        f"FROM {table})"
    )


def _plane_dot(vec: Column, plane: int) -> Column:
    """Projection of vec onto integer hyperplane `plane` (exact double)."""
    prods = F.transform(
        vec,
        lambda x, idx: x.cast("double")
        * (((F.lit(plane) * 24 + idx * 2) % 97) - 48).cast("double"),
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def lsh_bucket(vec: Column, n_planes: int = N_PLANES) -> Column:
    """LSH bucket id = packed sign bits of n_planes projections."""
    bucket = F.lit(0)
    for i in range(n_planes):
        bit = (_plane_dot(vec, i) > 0).cast("int")
        bucket = bucket + bit * (1 << i)
    return bucket


def lsh_band_bucket(vec: Column, band: int, planes_per_band: int) -> Column:
    """Bucket id for one band of a banded (AND-OR) cosine LSH.

    Band ``b`` packs the sign bits of planes ``b·k .. b·k+k-1`` (k =
    planes_per_band) — disjoint plane sets per band.  Two vectors are
    candidates when ANY band's buckets match: P(candidate) =
    1-(1-p^k)^L for p = 1-θ/π, the classic AND-OR construction that
    pushes recall toward 1 for small θ while k keeps random pairs
    apart.  Single-bucket :func:`lsh_bucket` is the L=1 special case —
    high precision, low recall; banding is what a production near-dup
    pass over embeddings should use (see
    tests/test_scale_ops.py::test_banded_lsh_recall_on_planted_neardups
    for the measured recall/cost envelope)."""
    bucket = F.lit(0)
    for i in range(planes_per_band):
        bit = (_plane_dot(vec, band * planes_per_band + i) > 0).cast("int")
        bucket = bucket + bit * (1 << i)
    return bucket


def sql_plane_dot(vec_expr: str, plane: int) -> str:
    """DuckDB twin of _plane_dot (1-based list indexing → j = i-1)."""
    return (
        f"list_sum(list_transform(range(1, len({vec_expr})+1), i -> "
        f"CAST({vec_expr}[i] AS DOUBLE) * ((({plane}*24 + (i-1)*2) % 97) - 48)))"
    )


def sql_lsh_bucket(vec_expr: str, n_planes: int = N_PLANES) -> str:
    """DuckDB twin of lsh_bucket."""
    bits = [
        f"(CASE WHEN {sql_plane_dot(vec_expr, i)} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    ]
    return "(" + " + ".join(bits) + ")"


def sql_lsh_bucket_adaptive(vec_expr: str, p_expr: str) -> str:
    """DuckDB twin of an ADAPTIVE-plane lsh_bucket: plane i contributes
    its sign bit only when ``i < p_expr`` (the corpus-sized plane count,
    normally :func:`sql_adaptive_n_planes`'s scalar subquery).  The
    outer CASE short-circuits, so planes beyond p are never computed —
    the unrolled LSH_MAX_PLANES terms cost nothing until the corpus
    actually needs them."""
    bits = [
        f"(CASE WHEN {i} < {p_expr} THEN "
        f"(CASE WHEN {sql_plane_dot(vec_expr, i)} > 0 THEN {1 << i} ELSE 0 END) "
        f"ELSE 0 END)"
        for i in range(LSH_MAX_PLANES)
    ]
    return "(" + " + ".join(bits) + ")"


SQL_DOT = (
    "list_sum(list_transform(range(1, len({a})+1), i -> "
    "CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def sql_dot(a: str, b: str) -> str:
    return SQL_DOT.format(a=a, b=b)


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"
