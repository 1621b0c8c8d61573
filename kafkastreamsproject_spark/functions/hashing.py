"""Engine-portable content hashing: token hashes, MinHash, SimHash.

Portability contract: the base token hash is the first 8 hex chars of
md5 parsed as an integer — Spark ``conv(substring(md5(t),1,8),16,10)``
and DuckDB ``('0x'||substr(md5(t),1,8))::BIGINT`` produce identical
values — so MinHash/SimHash signatures (pure integer arithmetic on top)
are bit-identical across engines and across Spark versions.  No RNG:
permutation coefficients are fixed odd multipliers.

Scale notes: signature computation is map-only (one pass per document,
no shuffle).  MinHash-LSH banding turns near-dup search into an
equi-join on (band_id, band_minhashes); SimHash pairs are confirmed by
a single ``bit_count(a XOR b)`` — both are the standard 100 TB-corpus
dedup designs (cf. MinHash banding as in Mining of Massive Datasets;
SimHash as in Charikar's similarity estimation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1 — the MinHash permutation modulus.
MINHASH_P = 2_147_483_647
N_PERMS = 8
SIMHASH_BITS = 32


def _perm_coeffs(k: int) -> tuple[int, int]:
    """Fixed permutation h_k(x) = (a_k·x + b_k) mod P coefficients."""
    return 2 * k + 1, k * 7919 + 1


# ---------------------------------------------------------------------------
# Spark columns
# ---------------------------------------------------------------------------


def token_hash32(tok: Column) -> Column:
    """Portable 32-bit token hash (md5 prefix)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def hashed_tokens(tokens: Column) -> Column:
    """Distinct-token 32-bit hashes for a token-array column."""
    return F.transform(F.array_distinct(tokens), token_hash32)


def hash_list(strings: Column) -> Column:
    """32-bit hashes of an arbitrary string-array column (e.g. shingles)."""
    return F.transform(strings, token_hash32)


def minhash(hashes: Column, k: int) -> Column:
    """k-th MinHash: min over tokens of the k-th permutation."""
    a, b = _perm_coeffs(k)
    return F.array_min(
        F.transform(hashes, lambda h: (h * a + b) % MINHASH_P)
    )


def minhash_signature(hashes: Column, n_perms: int = N_PERMS) -> list[Column]:
    return [minhash(hashes, k).alias(f"mh{k}") for k in range(n_perms)]


def minhash_signature_array(hashes: Column, n_perms: int = N_PERMS) -> Column:
    """All n_perms MinHashes as ONE array column in ONE expression.

    The per-column form (:func:`minhash_signature`) references the
    ``hashes`` expression once per permutation; after Catalyst collapses
    projections the upstream shingle+md5 pipeline is embedded in every
    one of them, and higher-order-function subtrees defeat Spark's
    per-project common-subexpression elimination — measured ~3× slower
    than this single-expression form at 10× local scale.  The
    permutation coefficients (a=2k+1, b=7919k+1, _perm_coeffs) are
    computed arithmetically from the lambda variable so the whole
    signature is one pass over one evaluation of ``hashes``."""
    ks = F.array(*[F.lit(k) for k in range(n_perms)])
    return F.transform(
        ks,
        lambda k: F.array_min(
            F.transform(hashes, lambda h: (h * (k * 2 + 1) + (k * 7919 + 1)) % MINHASH_P)
        ),
    )


def simhash32(hashes: Column) -> Column:
    """32-bit SimHash: per bit, sum ±1 over token hashes; bit set iff
    the weight is positive."""
    sig = F.lit(0)
    for j in range(SIMHASH_BITS):
        weight = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1),
        )
        sig = sig + (weight > 0).cast("long") * (1 << j)
    return sig


def hamming32(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_block_bounds(
    n_bits: int = SIMHASH_BITS, max_hamming: int = 6
) -> list[tuple[int, int]]:
    """Pigeonhole banding bounds: ``max_hamming + 1`` disjoint (start,
    length) bit-blocks covering the signature.  A pair within
    ``max_hamming`` differs in at most ``max_hamming`` bits, which can
    dirty at most ``max_hamming`` blocks — so at least one block matches
    EXACTLY, and candidate generation becomes an equi-join on
    (block index, block value) with zero false negatives (Manku,
    Jarlin & Sarma's simhash dedup design).  Width-generic: the
    production configuration is a 64-bit signature with max_hamming 3
    (four 16-bit blocks → 65k bucket values per block); the local
    oracle-checked query keeps 32/6 (seven 4-5-bit blocks) for
    cross-engine signature portability."""
    n_blocks = max_hamming + 1
    if n_blocks > n_bits:
        raise ValueError(f"{n_blocks} blocks > {n_bits} signature bits")
    base, extra = divmod(n_bits, n_blocks)
    bounds, start = [], 0
    for k in range(n_blocks):
        length = base + (1 if k < extra else 0)
        bounds.append((start, length))
        start += length
    return bounds


def simhash_block_structs(
    sig: Column, n_bits: int = SIMHASH_BITS, max_hamming: int = 6
) -> Column:
    """Array of (blk, val) structs for :func:`simhash_block_bounds` —
    ``explode`` it to get the banding relation for the candidate
    equi-join."""
    return F.array(
        *[
            F.struct(
                F.lit(k).alias("blk"),
                F.shiftright(sig, start)
                .bitwiseAND(F.lit((1 << length) - 1))
                .alias("val"),
            )
            for k, (start, length) in enumerate(
                simhash_block_bounds(n_bits, max_hamming)
            )
        ]
    )


# ---------------------------------------------------------------------------
# DuckDB SQL twins
# ---------------------------------------------------------------------------

SQL_HASHED_TOKENS = (
    "list_transform(list_distinct(string_split_regex(trim({text}), ' +')), "
    "t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)"
)


def sql_hashed_tokens(text: str = "text") -> str:
    return SQL_HASHED_TOKENS.format(text=text)


def sql_hash_list(list_expr: str) -> str:
    """DuckDB twin of :func:`hash_list`."""
    return (
        f"list_transform({list_expr}, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)"
    )


def sql_minhash(hashes_expr: str, k: int) -> str:
    a, b = _perm_coeffs(k)
    return f"list_min(list_transform({hashes_expr}, h -> (h * {a} + {b}) % {MINHASH_P}))"


def sql_simhash32(hashes_expr: str) -> str:
    bits = []
    for j in range(SIMHASH_BITS):
        weight = f"list_sum(list_transform({hashes_expr}, h -> ((h >> {j}) & 1) * 2 - 1))"
        bits.append(f"(CASE WHEN {weight} > 0 THEN {1 << j}::BIGINT ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"
