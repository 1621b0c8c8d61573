"""Incremental k-means centroid maintenance at ingest — the serving
half of the IVF index kept fresh as shards arrive.

``kmeans_int8_lloyd`` (plans/similarity.py) trains centroids in full
batch passes; a 100 TB ingest pipeline cannot re-run Lloyd over the
corpus per shard.  Mini-batch k-means (Sculley 2010, "Web-Scale
K-Means Clustering") folds each arriving batch into per-centroid
SUFFICIENT STATISTICS instead: assign the batch to the current
centroids, add (count, per-dimension sum) into the store, re-derive
centroids as round(sum/n).  On int8 codes every quantity is an exact
integer (sums of longs, counts) except the one IEEE-portable
round(sum/n) — so the whole trajectory replays engine-exact in the
DuckDB oracle (plans/ingest.py:streaming_centroid_ingest), the same
exactness discipline as the perceptron trainer.

Store species: a SNAPSHOT store, deliberately unlike the append
stores (neardup/linededup/novelty).  The state is K rows of
(cid, n, sums[dim], cv[dim]) — kilobytes at any corpus size — so each
epoch OVERWRITES a complete snapshot under ``epoch=<n>/`` and replay
idempotency is structural: re-running epoch t rebuilds from epoch
t−1's (unchanged) snapshot and overwrites the same directory with the
same bytes.  The bucketed-append discipline exists for corpus-sized
stores; a K-row relation needs the opposite layout (broadcastable,
rewritten whole).

Scale shape: the batch-side assignment is the sanctioned
bounded-broadcast shape of the ANN family — K centroid rows broadcast
against the scanning batch, argmin in-row over the broadcast array;
per-centroid stats come back via ONE partial-aggregated shuffle of
(cid, dim) partial sums (K·dim rows per partition, batch-size
independent).  The store never shuffles: it is read whole (K rows)
and written whole.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CENTROID_SCHEMA = (
    "cid long, n long, s array<long>, cv array<long>"
)
K_CENTROIDS = 8


def quantize_codes(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """int8-scale codes: round(x*127) per component (the global-scale
    quantization kmeans_int8_lloyd standardizes on)."""
    return df.withColumn(
        "qv",
        F.transform(
            vec_col, lambda x: F.round(x.cast("double") * 127).cast("long")
        ),
    )


def _epoch_dir(store_path: str, epoch: int) -> str:
    return f"{store_path}/epoch={epoch}"


def read_centroid_store(
    spark: SparkSession, store_path: str, epoch: int
) -> DataFrame | None:
    """The snapshot written by ``epoch``'s predecessor (None before the
    first fold)."""
    from kafkastreamsproject_spark.operators.fs import hadoop_has_files

    prev = _epoch_dir(store_path, epoch - 1)
    if epoch <= 0 or not hadoop_has_files(spark, prev):
        return None
    return spark.read.schema(_CENTROID_SCHEMA).parquet(prev)


def centroid_ingest_batch(
    batch: DataFrame,
    store_path: str,
    epoch: int,
    k: int = K_CENTROIDS,
) -> DataFrame:
    """Fold one micro-batch of (vec_id, qv) into the centroid store;
    returns the per-centroid summary (cid, n_assigned, n_total, c_dot)
    for this epoch, where c_dot = Σ cv_i² of the UPDATED centroid (the
    integer drift signal a monitor tracks).

    Epoch 0 seeds the centroids with the codes of the batch's k lowest
    vec_ids (kmeans_int8_lloyd's deterministic init) at n=0 — seeds
    then assign like any other row, so nothing is double-counted.
    A centroid that attracts no rows keeps its previous cv (n stays,
    standard mini-batch behavior)."""
    spark = batch.sparkSession
    store = read_centroid_store(spark, store_path, epoch)
    if store is None:
        dim_row = batch.select(F.size("qv").alias("d")).first()
        dim = dim_row.d if dim_row else 0
        seeds = (
            batch.orderBy("vec_id")
            .limit(k)
            .select(
                F.col("vec_id").alias("cid"),
                F.lit(0).cast("long").alias("n"),
                F.array_repeat(F.lit(0).cast("long"), dim).alias("s"),
                F.col("qv").alias("cv"),
            )
        )
        store = seeds
    store = store.localCheckpoint(eager=True)  # pin pre-fold snapshot

    cents = store.select("cid", "cv")
    d = batch.join(F.broadcast(cents), how="cross").select(
        "vec_id",
        "qv",
        "cid",
        F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dist2"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("vec_id").orderBy("dist2", "cid")
    assigned = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "qv", "cid")
    )
    bstats_long = assigned.select(
        "cid", F.posexplode("qv").alias("pos", "v")
    ).groupBy("cid", "pos").agg(
        F.sum("v").alias("sv"), F.count(F.lit(1)).alias("cnt")
    )
    bstats = bstats_long.groupBy("cid").agg(
        F.max("cnt").alias("n_assigned"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sv"))),
            lambda st: st["sv"],
        ).alias("bs"),
    )
    merged = (
        store.join(bstats, "cid", "left")
        .select(
            "cid",
            (F.col("n") + F.coalesce("n_assigned", F.lit(0))).alias("n"),
            F.coalesce(
                F.zip_with("s", "bs", lambda a, b: a + b), F.col("s")
            ).alias("s"),
            F.col("cv").alias("cv_old"),
            F.coalesce("n_assigned", F.lit(0)).alias("n_assigned"),
        )
        .select(
            "cid",
            "n",
            "s",
            F.when(
                F.col("n") > 0,
                F.transform(
                    "s",
                    lambda x: F.round(
                        x / F.col("n").cast("double")
                    ).cast("long"),
                ),
            )
            .otherwise(F.col("cv_old"))
            .alias("cv"),
            "n_assigned",
        )
        .localCheckpoint(eager=True)
    )
    (
        merged.select("cid", "n", "s", "cv")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(_epoch_dir(store_path, epoch))
    )
    c_dot = F.aggregate(
        F.transform("cv", lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return merged.select(
        "cid",
        "n_assigned",
        F.col("n").alias("n_total"),
        c_dot.alias("c_dot"),
    )
