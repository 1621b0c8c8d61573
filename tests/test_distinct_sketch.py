"""Mergeable HLL sketch store (streaming/distinctsketch.py): the three
properties the module's exactly-once story rests on — fold-order
invariance (associativity), replay idempotency (register max), and the
3σ error envelope — plus the streaming foreachBatch form end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamsproject_spark.streaming.distinctsketch import (
    batch_group_sketches,
    read_sketch_store,
    sketch_estimates,
    sketch_ingest_batch,
    to_sketch_ingest_sink,
)


def _rows(spark, lo, hi):
    """Synthetic (g, k) slice: group = id % 3, key = id // 7 — groups
    interleave and keys repeat both within and across slices."""
    return spark.range(lo, hi).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") / 7).cast("long").alias("k"),
    )


def _est(df):
    return {r.g: r.n_distinct_est for r in df.collect()}


def _exact(spark, lo, hi):
    return {
        r.g: r.n
        for r in _rows(spark, lo, hi)
        .groupBy("g")
        .agg(F.countDistinct("k").alias("n"))
        .collect()
    }


def test_epoch_folds_are_permutation_invariant(spark, tmp_path):
    """Folding the same three slices in ANY epoch order reads out
    IDENTICAL estimates (register max is commutative+associative), and
    the split path lands within 1σ of the one-shot build.  The two
    paths are NOT bit-identical — the union gadget's target
    representation differs from the direct build's, shifting registers
    by <1σ (module docstring) — so exactness is claimed only across
    fold orders, accuracy only against the envelope."""
    slices = [(0, 4000), (4000, 8000), (8000, 12000)]
    outs = []
    for tag, perm in [("a", (0, 1, 2)), ("b", (2, 0, 1)), ("c", (1, 2, 0))]:
        sp = str(tmp_path / f"s3{tag}")
        for e, si in enumerate(perm):
            final = sketch_ingest_batch(_rows(spark, *slices[si]), sp, e, "g", "k")
        outs.append(_est(final))
    assert outs[0] == outs[1] == outs[2]
    one = _est(
        sketch_ingest_batch(_rows(spark, 0, 12000), str(tmp_path / "s1"), 0, "g", "k")
    )
    for g, n in one.items():
        assert abs(outs[0][g] - n) / n <= 0.02, (g, outs[0][g], n)


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running a crashed epoch rebuilds from the predecessor's
    unchanged snapshot: estimates after the replay equal the first
    run's exactly."""
    sp = str(tmp_path / "replay")
    sketch_ingest_batch(_rows(spark, 0, 5000), sp, 0, "g", "k")
    first = _est(sketch_ingest_batch(_rows(spark, 5000, 9000), sp, 1, "g", "k"))
    replay = _est(sketch_ingest_batch(_rows(spark, 5000, 9000), sp, 1, "g", "k"))
    assert replay == first
    # and self-union inside one fold changes nothing either
    doubled = _est(
        sketch_ingest_batch(
            _rows(spark, 5000, 9000).unionAll(_rows(spark, 5000, 9000)),
            sp,
            1,
            "g",
            "k",
        )
    )
    assert doubled == first


def test_estimates_within_3sigma_envelope(spark, tmp_path):
    """lg_k=12 → rse ≈ 1.04/√4096 ≈ 1.6%; assert every per-group
    estimate lands within ±5% (~3σ) of the exact distinct count."""
    sp = str(tmp_path / "env")
    est = _est(sketch_ingest_batch(_rows(spark, 0, 30000), sp, 0, "g", "k"))
    exact = _exact(spark, 0, 30000)
    assert set(est) == set(exact)
    for g, n in exact.items():
        assert abs(est[g] - n) / n <= 0.05, (g, est[g], n)


def test_cross_group_union_estimates_global_distinct(spark, tmp_path):
    """Mergeability across GROUPS too: union-aggregating all group
    sketches estimates the global distinct count — the rollup a
    dashboard computes from the store without touching the corpus."""
    sketches = batch_group_sketches(_rows(spark, 0, 30000), "g", "k")
    glob = sketches.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("sketch", F.lit(True))
        ).alias("n")
    ).collect()[0].n
    exact = _rows(spark, 0, 30000).select("k").distinct().count()
    assert abs(glob - exact) / exact <= 0.05


def test_streaming_sink_folds_per_microbatch(spark, tmp_path):
    """The foreachBatch form over a file stream: per-epoch folds land
    in the snapshot store and the published view carries the final
    running estimates (same numbers as one batch fold)."""
    src = tmp_path / "src"
    src.mkdir()
    for i, (lo, hi) in enumerate([(0, 6000), (6000, 12000)]):
        _rows(spark, lo, hi).coalesce(1).write.parquet(
            str(src / f"b{i}.parquet")
        )
    stream = (
        spark.readStream.schema("g string, k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    sp = str(tmp_path / "stream_store")
    q = to_sketch_ingest_sink(
        stream, sp, str(tmp_path / "ckpt"), "sketch_est_t", "g", "k"
    )
    q.processAllAvailable()
    q.stop()
    # the store's last snapshot reads out exactly like a manual fold of
    # the same two slices (any order — permutation invariance)
    store = read_sketch_store(spark, sp, epoch=2)
    assert store is not None
    got = _est(sketch_estimates(store))
    manual = str(tmp_path / "manual")
    for e, (lo, hi) in enumerate([(0, 6000), (6000, 12000)]):
        want_df = sketch_ingest_batch(_rows(spark, lo, hi), manual, e, "g", "k")
    want = _est(want_df)
    assert got == want
    view = _est(spark.table("global_temp.sketch_est_t"))
    assert view == want


def test_epoch_chain_guard_rejects_gaps_and_resets(spark, tmp_path):
    """The sidecar's latest_epoch guard (r12 ADVICE): before it, ANY
    missing epoch−1 dir made read_sketch_store return None and the
    fold silently rebuilt from nothing — a fresh-checkpoint restart
    (epoch counter reset to 0) over accumulated state, or an epoch
    gap, discarded every register with no error anywhere."""
    import pytest

    sp = str(tmp_path / "chain")
    sketch_ingest_batch(_rows(spark, 0, 2000), sp, 0, "g", "k")
    sketch_ingest_batch(_rows(spark, 2000, 4000), sp, 1, "g", "k")
    with pytest.raises(ValueError, match="chain gap"):
        sketch_ingest_batch(_rows(spark, 4000, 6000), sp, 3, "g", "k")
    with pytest.raises(ValueError, match="FRESH"):
        sketch_ingest_batch(_rows(spark, 4000, 6000), sp, 0, "g", "k")
    # the contiguous fold still lands
    sketch_ingest_batch(_rows(spark, 4000, 6000), sp, 2, "g", "k")


def test_superseded_epoch_snapshots_are_pruned(spark, tmp_path):
    """Retention: after each fold only the newest retain_epochs
    snapshot dirs remain (current + the predecessor a replay rebuilds
    from); a replay older than the window raises instead of silently
    rebuilding from a missing predecessor."""
    import os

    import pytest

    sp = str(tmp_path / "prune")
    for e, (lo, hi) in enumerate(
        [(0, 2000), (2000, 4000), (4000, 6000), (6000, 8000)]
    ):
        final = sketch_ingest_batch(_rows(spark, lo, hi), sp, e, "g", "k")
    dirs = sorted(d for d in os.listdir(sp) if d.startswith("epoch="))
    assert dirs == ["epoch=2", "epoch=3"]
    # replay of the LATEST epoch still works (predecessor retained) …
    replay = _est(sketch_ingest_batch(_rows(spark, 6000, 8000), sp, 3, "g", "k"))
    assert replay == _est(final)
    # … but a replay beyond the retention window fails loudly
    with pytest.raises(ValueError, match="missing"):
        sketch_ingest_batch(_rows(spark, 2000, 4000), sp, 1, "g", "k")


def test_mismatched_lg_k_fold_is_rejected(spark, tmp_path):
    """The _sketch_meta.json sidecar guard: folding an existing store
    with a different lg_k must raise instead of letting
    allowDifferentLgConfigK silently downsample every sketch."""
    import pytest

    sp = str(tmp_path / "widths")
    sketch_ingest_batch(_rows(spark, 0, 2000), sp, 0, "g", "k", lg_k=12)
    with pytest.raises(ValueError, match="lg_k=12"):
        sketch_ingest_batch(_rows(spark, 2000, 4000), sp, 1, "g", "k", lg_k=10)
    # the matching width still folds
    sketch_ingest_batch(_rows(spark, 2000, 4000), sp, 1, "g", "k", lg_k=12)


def test_no_meta_store_with_orphan_epochs_is_rejected(spark, tmp_path):
    """The no-meta hole in the chain guard (r13 ADVICE): a store whose
    _sketch_meta.json sidecar is absent but which HOLDS epoch snapshots
    must reject a fold whose predecessor snapshot is missing — before
    this, read_sketch_store returned None and the fold silently rebuilt
    from nothing while accumulated registers sat in other epoch dirs,
    then stamped latest_epoch as if the chain were intact."""
    import os

    import pytest

    sp = str(tmp_path / "nometa")
    sketch_ingest_batch(_rows(spark, 0, 2000), sp, 0, "g", "k")
    final = sketch_ingest_batch(_rows(spark, 2000, 4000), sp, 1, "g", "k")
    os.remove(f"{sp}/_sketch_meta.json")
    # epoch dirs present, epoch-4 predecessor missing: raise
    with pytest.raises(ValueError, match="no _sketch_meta.json"):
        sketch_ingest_batch(_rows(spark, 4000, 6000), sp, 5, "g", "k")
    # the sidecar-predating migration path still folds: predecessor
    # snapshot on disk, chain continuable — and re-stamps the sidecar
    os.path.exists(f"{sp}/epoch=1")
    cont = sketch_ingest_batch(_rows(spark, 4000, 6000), sp, 2, "g", "k")
    assert _est(cont).keys() == _est(final).keys()
    assert os.path.exists(f"{sp}/_sketch_meta.json")
    # a no-meta store with NO epoch dirs is a genuinely fresh path:
    # nothing to lose, any epoch number folds
    fresh = str(tmp_path / "nometa_fresh")
    out = sketch_ingest_batch(_rows(spark, 0, 2000), fresh, 7, "g", "k")
    assert _est(out)
