"""Incremental distinct counting at ingest — mergeable HyperLogLog
sketches per group, maintained as shards arrive.

A curation deployment tracks "how many DISTINCT trigram hashes / users /
urls has each source contributed so far" continuously; at 100 TB the
exact answer needs either a corpus-wide recount per epoch or a
corpus-sized distinct store.  The mergeable-sketch answer is neither:
each batch folds into one fixed-size Apache DataSketches HLL sketch per
group (Spark ships these as built-in JVM aggregates —
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` — with
map-side partial aggregation), and the persisted state is a few KB per
group at ANY corpus size.  Sketch union is a register-wise max:
associative, commutative, and IDEMPOTENT — replaying a crashed epoch
unions the same registers again and changes nothing, so exactly-once
accounting needs no dedup ledger (tests/test_distinct_sketch.py pins
all three properties plus the error envelope).

Exactness fine print: estimates are identical across epoch-fold ORDERS
and across replays (same registers), but a split fold is not
bit-identical to a one-shot build — the union gadget's target
representation (HLL_8 with rebuilt curMin/exception state) differs
from the direct HLL_4 build, shifting the readout by well under 1σ
(measured 0.6% at ~1.7k distinct/group, lg_k=12).  Accuracy claims
therefore go through the 3σ envelope, never through cross-path
equality.

Store species: SNAPSHOT store (streaming/centroids.py discipline, the
opposite of the bucketed append stores): |groups| rows of
(g, sketch binary), overwritten whole under ``epoch=<n>/`` — replay
rebuilds from the predecessor's unchanged snapshot and rewrites the
same registers.  The batch side aggregates before anything shuffles
(partial sketches per partition, one |groups|-row merge); the store is
read whole and written whole, never shuffled.

Reference scope: the reference's stateful aggregations
(processing/src/main logic re-expressed in plans/reference.py) keep
exact per-key state; this module is the scale extension for the
distinct-counting family where exact state is corpus-sized
(plans/relational.py:approx_distinct_users is the one-shot batch twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamsproject_spark.storeconfig import DEFAULTS

_SKETCH_SCHEMA = "g string, sketch binary"
#: 2^12 registers → relative standard error ≈ 1.04/√4096 ≈ 1.6%; the
#: 3σ envelope the tests assert is ±5%.  One sketch ≈ 2-4 KB.  Value
#: owned by storeconfig.py (the shared store-config surface).
LG_K = DEFAULTS.hll_lg_k


def batch_group_sketches(
    batch: DataFrame, group_col: str, key_col: str, lg_k: int = LG_K
) -> DataFrame:
    """|groups| rows of (g, sketch) for ONE batch: partial sketches
    build map-side per partition (the aggregate's partial-merge path),
    so only |groups|·|partitions| fixed-size register blocks shuffle —
    never the keys themselves."""
    return batch.groupBy(F.col(group_col).cast("string").alias("g")).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch")
    )


def _epoch_dir(store_path: str, epoch: int) -> str:
    return f"{store_path}/epoch={epoch}"


def _meta_path(store_path: str) -> str:
    return f"{store_path}/_sketch_meta.json"


def _read_meta(spark: SparkSession, store_path: str) -> dict | None:
    import json

    from kafkastreamsproject_spark.operators.fs import hadoop_read_text

    text = hadoop_read_text(spark, _meta_path(store_path))
    return json.loads(text) if text else None


def _write_meta(spark: SparkSession, store_path: str, meta: dict) -> None:
    import json

    from kafkastreamsproject_spark.operators.fs import hadoop_write_text

    hadoop_write_text(spark, _meta_path(store_path), json.dumps(meta))


def _check_meta(
    spark: SparkSession, store_path: str, lg_k: int, epoch: int
) -> dict | None:
    """Sidecar guard (the sources/bucketed.py discipline), two checks:

    - **lg_k**: every fold against one store must use the width it was
      created with.  Without this, ``hll_union_agg(...,
      allowDifferentLgConfigK=True)`` would ABSORB a mismatched width
      by silently downsampling every sketch to the smaller register
      count — estimates would degrade with no error anywhere.
    - **epoch chain**: the sidecar tracks ``latest_epoch`` so a fold
      whose predecessor snapshot cannot exist FAILS instead of
      silently rebuilding from nothing.  Before this guard,
      ``read_sketch_store`` returned None on ANY missing
      epoch−1 dir — so restarting a stream with a fresh checkpoint
      (epoch counter reset to 0) over a non-empty store, or an
      epoch-number gap, discarded all accumulated registers without
      any error (r12 ADVICE).  Allowed folds: epoch == latest+1 (the
      next fold) or epoch <= latest with the predecessor snapshot
      still on disk (a crashed-epoch replay).

    A store predating the sidecar is stamped on first touch with the
    caller's lg_k and ``epoch - 1`` as latest (the bucketed.py
    migration assumption: the first post-upgrade fold continues the
    original chain) — but ONLY when the chain is actually continuable:
    a no-meta store that HOLDS epoch snapshots yet lacks the
    predecessor this fold needs (a lost sidecar over a pruned chain,
    or a resumed checkpoint pointed at a foreign/emptied store) would
    silently rebuild from nothing, the exact loss class the sidecar
    guard exists for (r13 ADVICE).  A no-meta store with NO epoch dirs
    at all is a genuinely fresh path (nothing to lose) and folds
    freely at any epoch number."""
    from kafkastreamsproject_spark.operators.fs import hadoop_has_files

    meta = _read_meta(spark, store_path)
    if meta is None:
        if (
            epoch > 0
            and not hadoop_has_files(spark, _epoch_dir(store_path, epoch - 1))
            and _has_epoch_dirs(spark, store_path)
        ):
            raise ValueError(
                f"sketch store at {store_path} has no _sketch_meta.json "
                f"sidecar but holds epoch snapshots, and the epoch="
                f"{epoch - 1} predecessor this fold of epoch={epoch} "
                "needs is missing — folding would silently rebuild from "
                "nothing while accumulated registers sit in other epoch "
                "dirs.  Restore the sidecar (or rebuild the store "
                "deliberately)"
            )
        return None
    if meta["lg_k"] != lg_k:
        raise ValueError(
            f"sketch store at {store_path} was created with "
            f"lg_k={meta['lg_k']}; caller supplied lg_k={lg_k} — all "
            "folds against one store must use the width it was created "
            "with"
        )
    latest = meta["latest_epoch"]
    if epoch > latest + 1:
        raise ValueError(
            f"sketch store at {store_path} has latest_epoch={latest}; "
            f"fold of epoch={epoch} would leave a chain gap — epochs "
            "must fold contiguously (replay the missing epochs or "
            "rebuild the store)"
        )
    if epoch == 0 and latest > 0:
        raise ValueError(
            f"sketch store at {store_path} has latest_epoch={latest}; "
            "an epoch-0 fold means the stream restarted with a FRESH "
            "checkpoint over accumulated state — it would silently "
            "rebuild from nothing.  Point the restart at a new "
            "store_path (or delete the old store deliberately)"
        )
    if epoch > 0 and not hadoop_has_files(
        spark, _epoch_dir(store_path, epoch - 1)
    ):
        raise ValueError(
            f"sketch store at {store_path}: replay of epoch={epoch} "
            f"needs the epoch={epoch - 1} snapshot, which is missing "
            f"(pruned? latest_epoch={latest}) — the fold would "
            "silently drop all state before this epoch"
        )
    return meta


def _has_epoch_dirs(spark: SparkSession, store_path: str) -> bool:
    """Any ``epoch=<n>/`` snapshot dirs under the store root?"""
    from kafkastreamsproject_spark.operators.fs import _fs_and_path

    fs, root = _fs_and_path(spark, store_path)
    if not fs.exists(root):
        return False
    return any(
        status.getPath().getName().startswith("epoch=")
        for status in fs.listStatus(root)
    )


def _prune_epochs(
    spark: SparkSession, store_path: str, latest: int, retain: int
) -> int:
    """Delete snapshot dirs superseded beyond the retention window
    (keep ``retain`` newest: the current snapshot plus enough
    predecessors for a crashed-epoch replay).  Returns dirs deleted.
    Without this, every epoch's |groups|-row snapshot accumulates
    forever (r12 ADVICE)."""
    from kafkastreamsproject_spark.operators.fs import _fs_and_path

    fs, root = _fs_and_path(spark, store_path)
    if not fs.exists(root):
        return 0
    n = 0
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith("epoch="):
            continue
        try:
            e = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if e <= latest - retain:
            fs.delete(status.getPath(), True)
            n += 1
    return n


def read_sketch_store(
    spark: SparkSession, store_path: str, epoch: int
) -> DataFrame | None:
    """The snapshot written by ``epoch``'s predecessor (None before the
    first fold)."""
    from kafkastreamsproject_spark.operators.fs import hadoop_has_files

    prev = _epoch_dir(store_path, epoch - 1)
    if epoch <= 0 or not hadoop_has_files(spark, prev):
        return None
    return spark.read.schema(_SKETCH_SCHEMA).parquet(prev)


def sketch_estimates(store: DataFrame) -> DataFrame:
    """(g, n_distinct_est) — the readout; estimation is a pure function
    of the registers, so equal-register stores read out identically."""
    return store.select(
        "g", F.hll_sketch_estimate("sketch").alias("n_distinct_est")
    ).orderBy("g")


def sketch_ingest_batch(
    batch: DataFrame,
    store_path: str,
    epoch: int,
    group_col: str,
    key_col: str,
    lg_k: int = LG_K,
    retain_epochs: int = DEFAULTS.sketch_retain_epochs,
) -> DataFrame:
    """Fold one micro-batch into the per-group sketch store and return
    the post-fold estimates (g, n_distinct_est).

    Union discipline: the previous snapshot's |groups| rows union with
    the batch's |groups| rows through ``hll_union_agg`` — register max,
    so a replayed epoch t rebuilds from epoch t−1's (unchanged)
    snapshot and overwrites epoch t with identical registers.  The
    sidecar guard (:func:`_check_meta`) rejects lg_k mismatches, chain
    gaps, and epoch-0 folds over accumulated state; snapshots older
    than ``retain_epochs`` are pruned after each fold (the newest
    ``retain_epochs`` dirs stay: the current snapshot plus the
    predecessor a crashed-epoch replay rebuilds from)."""
    spark = batch.sparkSession
    meta = _check_meta(spark, store_path, lg_k, epoch)
    cur = batch_group_sketches(batch, group_col, key_col, lg_k)
    prev = read_sketch_store(spark, store_path, epoch)
    merged = (
        cur
        if prev is None
        else prev.unionByName(cur)
        .groupBy("g")
        .agg(F.hll_union_agg("sketch", F.lit(True)).alias("sketch"))
    )
    # pin the snapshot before writing: the merged plan reads epoch-1,
    # never the directory being written
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(_epoch_dir(store_path, epoch))
    latest = max(meta["latest_epoch"], epoch) if meta else epoch
    _write_meta(spark, store_path, {"lg_k": lg_k, "latest_epoch": latest})
    _prune_epochs(spark, store_path, latest, retain_epochs)
    return sketch_estimates(merged)


def to_sketch_ingest_sink(
    rows: DataFrame,
    store_path: str,
    checkpoint: str,
    out_table: str,
    group_col: str,
    key_col: str,
    lg_k: int = LG_K,
):
    """Streaming form: fold each micro-batch through
    :func:`sketch_ingest_batch` and publish the running per-group
    estimates to a global temp view (test double for a metrics sink)."""

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        est = sketch_ingest_batch(
            batch_df, store_path, int(epoch_id), group_col, key_col, lg_k
        )
        est.createOrReplaceGlobalTempView(out_table)

    return (
        rows.writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .start()
    )
