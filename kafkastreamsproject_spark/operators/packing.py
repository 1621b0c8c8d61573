"""Sequence packing — token-budget bin packing for training shards.

A training-data pipeline ends by packing variable-length documents into
fixed-token-budget sequences (shards) so accelerator batches waste as
little padding as possible.  Bin packing is NP-hard and inherently
sequential, so the distributed shape is the standard compromise:

1. **shard** documents deterministically by id hash into N independent
   packing problems (N sized so one shard's metadata — ids and token
   counts only, never text — fits one task);
2. **pack** each shard with first-fit-decreasing (FFD) inside one
   ``applyInPandas`` task: sort by token count descending (id ascending
   as the tie-break), place each doc in the first open pack with room,
   open a new pack otherwise.  FFD uses at most 11/9·OPT + 6/9 packs
   per shard, and sharding by hash keeps the per-shard size
   distributions statistically identical, so the global fill ratio
   tracks the single-machine answer;
3. documents larger than the budget each get their own pack, flagged
   ``overflow`` — the caller decides whether to split or drop them.

Only (id, n_tokens) ever moves: the shuffle carries ~16 B/doc, and the
pack assignment joins back to the text by id.  Packing is fully
deterministic — same corpus, budget, and shard count ⇒ byte-identical
assignment — which is what makes a packed corpus reproducible across
reruns and resumable mid-pipeline.

At 100 TB: 10¹⁰ docs at 16 B of metadata is ~160 GB of shuffle spread
over N≈10⁴ shards of ~10⁶ docs each; the FFD inner loop is a
vectorized numpy first-fit sweep (one C-speed comparison pass per
doc).  ``docs_per_shard`` bounds the worst case, and a
capacity-indexed search tree is the drop-in refinement if a shard's
open-pack count ever dominates.

No reference analogue (the reference is a Kafka Streams trip pipeline);
this belongs to the training-data operator family alongside dedup and
ANN.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "doc_id long, n_tokens long, shard_id int, pack_id string, "
    "pack_tokens long, overflow boolean"
)


def _ffd_pack(
    pdf_iter_key: tuple,
    pdf: pd.DataFrame,
    budget: int,
    best_fit: bool = False,
) -> pd.DataFrame:
    """Pack one shard's (doc_id, n_tokens) rows with first-fit-decreasing
    (default) or best-fit-decreasing (``best_fit=True``: place each doc
    in the open pack with the SMALLEST remaining capacity that fits,
    ties to the lowest pack index — trades a second comparison pass for
    tighter packs on adversarial size mixes)."""
    shard = int(pdf_iter_key[0])
    pdf = pdf.sort_values(
        ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    ids = pdf["doc_id"].to_numpy()
    toks = pdf["n_tokens"].to_numpy()

    n = len(ids)
    # remaining capacity per open pack; -1 marks oversize-owned (closed)
    # packs.  The first-fit scan is vectorized: one C-speed comparison
    # sweep per doc instead of a Python loop over open packs — the
    # difference between O(docs·packs) interpreter steps and the same
    # bound in numpy, which holds to ~10^6 docs/shard.
    remaining = np.empty(n, dtype=np.int64)
    n_packs = 0
    assign = np.zeros(n, dtype=np.int64)
    overflow = np.zeros(n, dtype=bool)
    for i in range(n):
        t = int(toks[i])
        if t > budget:
            remaining[n_packs] = -1  # closed: oversize doc owns the pack
            assign[i] = n_packs
            overflow[i] = True
            n_packs += 1
            continue
        fits = remaining[:n_packs] >= t
        if fits.any():
            if best_fit:
                # smallest fitting remainder, ties to the lowest index
                # (np.argmin returns the first minimum)
                cand = np.where(fits, remaining[:n_packs], np.iinfo(np.int64).max)
                p = int(np.argmin(cand))
            else:
                p = int(np.argmax(fits))
            remaining[p] -= t
            assign[i] = p
        else:
            remaining[n_packs] = budget - t
            assign[i] = n_packs
            n_packs += 1

    out = pd.DataFrame(
        {
            "doc_id": ids,
            "n_tokens": toks,
            "shard_id": shard,
            "pack_id": [f"{shard}-{p}" for p in assign],
            "overflow": overflow,
        }
    )
    out["pack_tokens"] = out.groupby("pack_id")["n_tokens"].transform("sum")
    return out[
        ["doc_id", "n_tokens", "shard_id", "pack_id", "pack_tokens", "overflow"]
    ]


def pack_documents(
    docs_with_tokens: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    docs_per_shard: int = 100_000,
    n_shards: int | None = None,
    shard_col: str | None = None,
    policy: str = "ffd",
) -> DataFrame:
    """Assign every document to a token-budgeted pack.

    ``docs_with_tokens`` needs only (id_col, tokens_col) — compute the
    token count upstream (e.g. ``functions.text.n_bpe_tokens``) so the
    shuffle never carries text.  Returns one row per document:
    (doc_id, n_tokens, shard_id, pack_id, pack_tokens, overflow) with
    ``pack_tokens <= budget`` for every non-overflow pack.

    ``policy``: ``"ffd"`` (first-fit-decreasing, default) or ``"bfd"``
    (best-fit-decreasing) — identical distributed shape, different
    within-shard placement rule.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if policy not in ("ffd", "bfd"):
        raise ValueError(f"policy must be 'ffd' or 'bfd', got {policy!r}")
    best_fit = policy == "bfd"
    if shard_col is not None:
        # caller-supplied sharding (e.g. an md5-derived column when the
        # packing must be replayable in an engine without xxhash64);
        # the default hash sharding is equivalent for balance
        shards = docs_with_tokens.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
            F.col(shard_col).cast("int").alias("shard_id"),
        )
        return shards.groupBy("shard_id").applyInPandas(
            lambda key, pdf: _ffd_pack(key, pdf, budget, best_fit),
            schema=_OUT_SCHEMA,
        )
    meta = docs_with_tokens.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    if n_shards is None:
        n_docs = meta.count()
        n_shards = max(1, math.ceil(n_docs / docs_per_shard))
    shards = meta.withColumn(
        "shard_id",
        F.pmod(F.xxhash64("doc_id", F.lit(0x5E9)), F.lit(n_shards)).cast("int"),
    )
    return shards.groupBy("shard_id").applyInPandas(
        lambda key, pdf: _ffd_pack(key, pdf, budget, best_fit),
        schema=_OUT_SCHEMA,
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One row per pack: size, token sum, fill ratio — the padding-waste
    audit a packing run is judged by."""
    return (
        packed.groupBy("shard_id", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.max(F.col("overflow").cast("int")).cast("boolean").alias("overflow"),
        )
        .withColumn("fill_ratio", F.round(F.col("pack_tokens") / F.lit(budget), 6))
    )
