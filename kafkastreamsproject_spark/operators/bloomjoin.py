"""Bloom-filtered semi-join: cut a huge probe side down with a compact
hashed-bit-position sketch of the build side BEFORE the exact join.

Spark's own runtime row-level filtering does exactly this for shuffle
joins (``spark.sql.optimizer.runtime.bloomFilter.enabled``), but the
``bloom_filter_agg`` / ``might_contain`` expressions it uses are not
registered for end users (probed on Spark 4.1: UNRESOLVED_ROUTINE), so
this operator builds the same shape from public primitives:

- every build key is hashed to ``n_hashes`` bit positions in
  ``[0, n_bits)`` via ``xxhash64(key, seed)`` — all JVM-side;
- the "filter" is the DISTINCT position table: at most
  ``min(n_hashes * |build|, n_bits)`` longs, i.e. its broadcast size is
  CAPPED at 8·n_bits bytes no matter how large the build side grows —
  unlike broadcasting the build keys themselves, which is unbounded and
  impossible for wide string keys;
- the probe survives iff ALL of its ``n_hashes`` positions appear in
  the table — ``n_hashes`` broadcast left-semi equi-joins, no UDF, no
  driver collect;
- (optional, default) an exact confirm join removes the bloom's false
  positives, so the operator's output is EXACTLY the semi-join — which
  is what makes it oracle-checkable with a plain ``IN`` subquery.

A Bloom filter has no false negatives (every build key set all of its
own positions), so the pre-filter can only pass supersets; the confirm
join only ever removes rows.  Sizing: for ~1% false-positive rate with
``n_hashes=2`` keep ``n_bits >= 14 * |distinct build keys|``; at 100 TB
the win is that the confirm join shuffles only the pre-filtered probe
remnant instead of the full fact table.

Reference parity note: the reference engine has no bloom operator; this
is part of the M4/M5 scale surface (SURVEY.md §2.7) a training-data
pipeline needs when the "small" side of a semi-join stops being
broadcastable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafkastreamsproject_spark.operators.cache import scoped_persist


def bloom_positions(key: Column, n_hashes: int, n_bits: int) -> list[Column]:
    """The ``n_hashes`` bit positions of one key (long columns in
    ``[0, n_bits)``), seeded by hash index."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)).alias(f"pos{i}")
        for i in range(n_hashes)
    ]


def bloom_filter_table(
    build: DataFrame, build_key: str, n_hashes: int, n_bits: int
) -> DataFrame:
    """The sketch: one ``pos`` column holding every distinct bit
    position set by any build key.  Row count is capped at ``n_bits``."""
    pos = bloom_positions(F.col(build_key), n_hashes, n_bits)
    stacked = build.select(
        F.explode(F.array(*pos)).alias("pos")
    )
    return stacked.distinct()


def bloom_semi_join(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    *,
    n_hashes: int = 2,
    n_bits: int = 1 << 20,
    exact_confirm: bool = True,
) -> DataFrame:
    """``probe`` rows whose key appears in ``build`` (left semi join),
    evaluated as bloom pre-filter + (optional) exact confirm.

    With ``exact_confirm=True`` the result is exactly
    ``probe LEFT SEMI JOIN build``; with ``False`` it is a superset
    containing bloom false positives (useful when a downstream exact
    join exists anyway and only the shuffle reduction is wanted).

    The sketch is persisted when it feeds more than one semi-join
    (r16): Catalyst cannot share a subtree across joins, so the
    unpersisted form re-ran the build scan + explode + distinct
    aggregate once PER HASH (plans/r16/bloom_semi_lineitem_before.txt
    nodes 3-11 vs 13-21 are byte-identical twins).  The cache holds ≤
    min(n_hashes·|build|, n_bits) longs and follows the module's
    scoped-release contract (registry consumers; wrap direct callers
    in ``cache_scope``)."""
    sketch_df = bloom_filter_table(build, build_key, n_hashes, n_bits)
    if n_hashes > 1:
        sketch_df = scoped_persist(sketch_df)
    sketch = F.broadcast(sketch_df)
    survivors = probe
    for i in range(n_hashes):
        pos_i = F.pmod(
            F.xxhash64(F.col(probe_key), F.lit(i)), F.lit(n_bits)
        )
        survivors = survivors.join(
            sketch, pos_i == sketch["pos"], "left_semi"
        )
    if exact_confirm:
        # No .distinct() on the build side: a left-semi join emits a
        # probe row on ≥1 match regardless of build multiplicity, and
        # the join's own hash build dedups keys — an explicit distinct
        # would add a full shuffle + two aggregates for nothing.
        survivors = survivors.join(
            build.select(build_key),
            survivors[probe_key] == F.col(build_key),
            "left_semi",
        )
    return survivors


# ---------------------------------------------------------------------------
# Batch-bloom pushdown for anti-join store probes (ingest-store path)
# ---------------------------------------------------------------------------


def md5_bloom_positions(key: Column, n_hashes: int, n_bits: int) -> list[Column]:
    """Portable (DuckDB-replicable) bloom positions: md5-prefix hash of
    ``i || ':' || key`` mod ``n_bits`` — the oracle-twin variant of
    :func:`bloom_positions` for queries whose false-positive COUNTS are
    part of the checked result (xxhash64 has no DuckDB twin; exact md5
    does)."""
    return [
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % n_bits
        for i in range(n_hashes)
    ]


def sql_md5_bloom_position(key_expr: str, i: int, n_bits: int) -> str:
    """DuckDB twin of one :func:`md5_bloom_positions` component."""
    return (
        f"(('0x' || substr(md5('{i}:' || CAST({key_expr} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {n_bits})"
    )


def bloom_pruned_anti_join(
    batch: DataFrame,
    batch_key: str,
    store: DataFrame,
    store_key: str,
    *,
    n_hashes: int = 2,
    n_bits: int = 1 << 18,
) -> DataFrame:
    """``batch LEFT ANTI JOIN store`` with the STORE side pre-pruned by
    a bloom of the BATCH keys — the ingest-store probe's scale device.

    The per-epoch probe is small-vs-huge: a micro-batch of keys against
    a corpus-sized store.  Spark's runtime row-level bloom does exactly
    this pruning for shuffle joins but its ``bloom_filter_agg`` is not
    user-invocable (see module header), so this composes the same shape
    from public primitives: sketch the batch's bit positions (≤
    ``min(n_hashes·|batch|, n_bits)`` longs — bounded by the BATCH, so
    no persistence, no staleness, rebuilt each epoch), broadcast it,
    and keep only store rows whose positions all hit before the exact
    anti-join.

    EXACT by construction: a store row dropped by the sketch shares no
    key with the batch (no false negatives), so it cannot affect the
    anti-join's result — the reduction only shrinks the store-side rows
    entering the join (from |store| to true-matches + bloom false
    positives).  Pays when the join is costlier per store row than two
    hash probes: SMJ sorts, wide store rows, or any store side that
    would otherwise shuffle; on an already-bucketed store it trims the
    sort input.  Sizing: FPR ≈ (1 − e^(−n_hashes·|batch|/n_bits))^n_hashes;
    keep n_bits ≳ 14·|batch| for ~1%.

    Persisted for the same reason as :func:`bloom_semi_join` (r16):
    the sketch feeds one semi-join per hash, and without the cache the
    batch scan + explode + distinct re-ran per hash."""
    sketch_df = batch.select(
        F.explode(
            F.array(*md5_bloom_positions(F.col(batch_key), n_hashes, n_bits))
        ).alias("pos")
    ).distinct()
    if n_hashes > 1:
        sketch_df = scoped_persist(sketch_df)
    sketch = F.broadcast(sketch_df)
    pruned = store
    for i in range(n_hashes):
        pos_i = md5_bloom_positions(F.col(store_key), n_hashes, n_bits)[i]
        pruned = pruned.join(sketch, pos_i == sketch["pos"], "left_semi")
    return batch.join(
        pruned,
        batch[batch_key] == pruned[store_key],
        "left_anti",
    )
