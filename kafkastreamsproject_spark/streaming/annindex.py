"""Incremental IVF-PQ vector-index maintenance at ingest — the ANN
serving store kept fresh as embedding shards arrive.

``plans/similarity.py:ivf_pq_search`` demonstrates the billion-vector
search TOPOLOGY (coarse inverted-file pruning → PQ asymmetric
distance) as a batch query that re-derives cells and codes from the
corpus every run.  This module persists that state instead — the
vector-side counterpart of ``streaming/bm25index.py``:

- **codebooks** (snapshot, written once at :func:`create_ann_store`):
  the coarse centroids (C rows) and the PQ codebook (M·K rows) are
  FROZEN at store creation — codes from different epochs are only
  comparable under one codebook.  Training them is out-of-band
  (kmeans_int8_lloyd / streaming/centroids.py are this repo's
  trainers); the deterministic first-C/first-K convention of the
  batch family is used here so the incrementally-built index must
  EQUAL the batch search exactly.  A production deployment retrains
  periodically and rebuilds the store under a new version directory.
- **codes** (bucketed append store keyed on the coarse cell): one row
  ``(cell, vec_id, s, cid)`` per subspace code — the inverted file.
  A query probes only its nprobe cells: the candidate equi-join hits
  the store ON ITS BUCKET KEY, so the store side plans zero Exchange
  (the sources/bucketed.py discipline); everything shuffled after
  pruning is (query, vec, long) triples.
- **seen** (bucketed append store keyed on vec_id): the doc-granular
  freshness ledger — replayed or re-delivered vectors are dropped at
  a bucket-key anti-join, exactly the bm25index contract (same write
  order, same crash-window analysis, same epoch-marker streaming
  wrapper pattern; codes append first, seen is the commit point).

Exactness: quantization (round(x·127)), subspacing (ceil(dim/M)
slices), cell assignment (integer L2 argmin, cid tie-break), and ADC
(integer subvector distances summed per candidate) reproduce the
batch family's conventions bit-for-bit, so
``plans/ingest.py:streaming_ann_index`` verifies the two-epoch fold
against ivf_pq_search's own DuckDB oracle — identical rows, identical
integers.  Store behavior is pytest-pinned in tests/test_ann_index.py.

Reference scope: the reference engine has no vector surface; this is
part of the similarity-search extension family (SURVEY §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafkastreamsproject_spark.sources.bucketed import (
    append_bucketed_store,
    compact_bucketed_store,
    read_bucketed_store,
    shuffle_scoped_to_buckets,
    store_table_name,
)

_CODES_SCHEMA = "cell int, vec_id long, s int, cid int"
_SEEN_SCHEMA = "vec_id long"
_CB_SCHEMA = "s int, cid int, cv array<bigint>"
_COARSE_SCHEMA = "ccid int, cv2 array<bigint>"

#: batch-family conventions (plans/similarity.py) — frozen here so the
#: incremental index equals the batch search exactly
M_SUBSPACES = 4
K_CODES = 16
C_CELLS = 8
N_BUCKETS = 8


def quantize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """int8-scale codes: round(x·127) per component (the family-wide
    quantization)."""
    return df.select(
        "vec_id",
        F.transform(
            vec_col, lambda x: F.round(x.cast("double") * 127).cast("long")
        ).alias("qv"),
    )


def _subspaces(base: DataFrame) -> DataFrame:
    """(vec_id, s, sv): ceil(dim/M) slices, the PQ subspace split."""
    sub_len = F.ceil(F.size("qv") / M_SUBSPACES).cast("int")
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(M_SUBSPACES - 1)),
        lambda s: F.struct(
            s.cast("int").alias("s"),
            F.slice(
                "qv",
                s * sub_len + 1,
                F.least(sub_len, F.size("qv") - s * sub_len).cast("int"),
            ).alias("sv"),
        ),
    )
    return base.select("vec_id", F.explode(subs).alias("p")).select(
        "vec_id", "p.s", "p.sv"
    )


def _int_dist2(a, b):
    """Exact-integer squared L2 between two long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _cb_dir(store_path: str) -> str:
    return f"{store_path}/codebooks"


def create_ann_store(
    spark: SparkSession, store_path: str, train: DataFrame
) -> None:
    """Freeze the coarse centroids and PQ codebook from ``train``
    (vec_id, embedding) — the deterministic first-C/first-K convention
    — and write them as the store's codebook snapshot.  Codes appended
    later are only meaningful under THIS snapshot."""
    base = quantize(train)
    coarse = base.filter(F.col("vec_id") < C_CELLS).select(
        F.col("vec_id").cast("int").alias("ccid"), F.col("qv").alias("cv2")
    )
    cb = _subspaces(base.filter(F.col("vec_id") < K_CODES)).select(
        "s", F.col("vec_id").cast("int").alias("cid"), F.col("sv").alias("cv")
    )
    coarse.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        f"{_cb_dir(store_path)}/coarse"
    )
    cb.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        f"{_cb_dir(store_path)}/pq"
    )


def read_codebooks(
    spark: SparkSession, store_path: str
) -> tuple[DataFrame, DataFrame]:
    coarse = spark.read.schema(_COARSE_SCHEMA).parquet(
        f"{_cb_dir(store_path)}/coarse"
    )
    cb = spark.read.schema(_CB_SCHEMA).parquet(f"{_cb_dir(store_path)}/pq")
    return coarse, cb


def assign_cells(base: DataFrame, coarse: DataFrame) -> DataFrame:
    """(vec_id, qv, cell): integer L2 argmin over the broadcast coarse
    centroids, ties to the lowest ccid — the batch family's assignment
    as a partial-aggregating min(struct) instead of a per-vector
    window (same result, batch-size-independent shuffle)."""
    d = base.crossJoin(F.broadcast(coarse)).select(
        "vec_id",
        "qv",
        F.struct(
            _int_dist2(F.col("qv"), F.col("cv2")).alias("dist2"),
            F.col("ccid").alias("ccid"),
        ).alias("dc"),
    )
    return (
        d.groupBy("vec_id")
        # qv is identical on every replicated row of a vec_id, so
        # first() is deterministic here
        .agg(F.first("qv").alias("qv"), F.min("dc").alias("dc"))
        .select("vec_id", "qv", F.col("dc.ccid").alias("cell"))
    )


def encode_pq(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, s, cid): nearest codebook entry per subspace, integer
    argmin with cid tie-break (plans/similarity.py:_pq_codes)."""
    d = sub.join(
        F.broadcast(cb.select(F.col("s").alias("s_cb"), "cid", "cv")),
        F.col("s") == F.col("s_cb"),
    ).select(
        "vec_id",
        "s",
        F.struct(
            _int_dist2(F.col("sv"), F.col("cv")).alias("dist2"),
            F.col("cid").alias("cid"),
        ).alias("dc"),
    )
    return (
        d.groupBy("vec_id", "s")
        .agg(F.min("dc").alias("dc"))
        .select("vec_id", "s", F.col("dc.cid").alias("cid"))
    )


def _codes_path(store_path: str) -> str:
    return f"{store_path}/codes"


def _seen_path(store_path: str) -> str:
    return f"{store_path}/seen"


def read_codes(
    spark: SparkSession, store_path: str, n_buckets: int = N_BUCKETS
) -> DataFrame:
    path = _codes_path(store_path)
    return read_bucketed_store(
        spark, path, store_table_name("ann_codes", path),
        _CODES_SCHEMA, ["cell"], n_buckets,
    )


def read_seen(
    spark: SparkSession, store_path: str, n_buckets: int = N_BUCKETS
) -> DataFrame:
    path = _seen_path(store_path)
    return read_bucketed_store(
        spark, path, store_table_name("ann_seen", path),
        _SEEN_SCHEMA, ["vec_id"], n_buckets,
    )


def ann_ingest_batch(
    batch: DataFrame,
    store_path: str,
    n_buckets: int = N_BUCKETS,
) -> dict:
    """Fold one micro-batch of (vec_id, embedding) into the index.
    Returns {"vecs_indexed": n, "codes_appended": m}.  Same layered
    idempotency as bm25index: bucket-key seen probe (zero store-side
    Exchange), codes append first, seen append is the commit point."""
    spark = batch.sparkSession
    coarse, cb = read_codebooks(spark, store_path)

    with shuffle_scoped_to_buckets(spark, n_buckets):
        seen = read_seen(spark, store_path, n_buckets)
        fresh = batch.join(
            seen.select("vec_id"), "vec_id", "left_anti"
        ).localCheckpoint(eager=True)

        assigned = assign_cells(quantize(fresh), coarse)
        codes = (
            encode_pq(_subspaces(assigned.select("vec_id", "qv")), cb)
            .join(assigned.select("vec_id", "cell"), "vec_id")
            .select("cell", "vec_id", "s", "cid")
            .localCheckpoint(eager=True)
        )

        c_path = _codes_path(store_path)
        append_bucketed_store(
            spark, codes, c_path, store_table_name("ann_codes", c_path),
            ["cell"], n_buckets,
        )
        s_path = _seen_path(store_path)
        append_bucketed_store(
            spark, fresh.select("vec_id"), s_path,
            store_table_name("ann_seen", s_path), ["vec_id"], n_buckets,
        )
    return {
        "vecs_indexed": fresh.count(),
        "codes_appended": codes.count(),
    }


def compact_codes(
    spark: SparkSession, store_path: str, n_buckets: int = N_BUCKETS
) -> int:
    """Bound per-epoch small files in both stores; run between epochs."""
    s_path = _seen_path(store_path)
    compact_bucketed_store(
        spark, s_path, store_table_name("ann_seen", s_path),
        _SEEN_SCHEMA, ["vec_id"], n_buckets,
    )
    c_path = _codes_path(store_path)
    return compact_bucketed_store(
        spark, c_path, store_table_name("ann_codes", c_path),
        _CODES_SCHEMA, ["cell"], n_buckets,
    )


def ann_query_index(
    spark: SparkSession,
    store_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """IVF-PQ search FROM THE STORE: assign each query its nprobe
    nearest cells (broadcast coarse centroids), equi-join the probes
    against the cell-bucketed codes store (store side scans its
    buckets in place — zero Exchange under the scoped shuffle conf),
    ADC-score the candidates against the broadcast codebook + query
    subvectors, and emit the top-k per query.  ``queries`` is
    (vec_id, embedding); a query never matches itself (the batch
    family's convention for corpus-member queries).

    Returns (query_id, vec_id, cell, adc_dist2, rnk) — identical rows
    to plans/similarity.py:ivf_pq_search over the same corpus, which
    is exactly what the streaming_ann_index oracle asserts."""
    coarse, cb = read_codebooks(spark, store_path)
    qbase = quantize(queries)
    qd = qbase.crossJoin(F.broadcast(coarse)).select(
        F.col("vec_id").alias("query_id"),
        "qv",
        "ccid",
        _int_dist2(F.col("qv"), F.col("cv2")).alias("dist2"),
    )
    wq = W.partitionBy("query_id").orderBy("dist2", "ccid")
    probes = (
        qd.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("ccid").alias("cell"))
    )
    qsub = _subspaces(
        qbase.select(F.col("vec_id").alias("vec_id"), "qv")
    ).select(
        F.col("vec_id").alias("query_id"), "s", F.col("sv").alias("qsv")
    )

    with shuffle_scoped_to_buckets(spark, n_buckets):
        codes = read_codes(spark, store_path, n_buckets)
        cand = (
            F.broadcast(probes)
            .join(codes, "cell")
            .filter(F.col("vec_id") != F.col("query_id"))
        )
        adc = (
            cand.join(F.broadcast(cb.select("s", "cid", "cv")), ["s", "cid"])
            .join(F.broadcast(qsub), ["query_id", "s"])
            .select(
                "query_id",
                "vec_id",
                "cell",
                _int_dist2(F.col("qsv"), F.col("cv")).alias("part"),
            )
            .groupBy("query_id", "vec_id", "cell")
            .agg(F.sum("part").alias("adc_dist2"))
        )
        wr = W.partitionBy("query_id").orderBy("adc_dist2", "vec_id")
        out = (
            adc.withColumn("rnk", F.row_number().over(wr))
            .filter(F.col("rnk") <= k)
            .select(
                "query_id",
                "vec_id",
                F.col("cell").cast("long").alias("cell"),
                "adc_dist2",
                F.col("rnk").cast("int").alias("rnk"),
            )
            .localCheckpoint(eager=True)
        )
    return out


def to_ann_ingest_sink(
    vectors: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_every: int | None = None,
    n_buckets: int = N_BUCKETS,
):
    """Streaming form: fold each micro-batch through
    :func:`ann_ingest_batch`, skipping replayed epochs via
    ``_applied_epochs`` markers (the to_rollup_store_sink idiom)."""
    from kafkastreamsproject_spark.operators.fs import (
        hadoop_exists,
        hadoop_touch,
    )

    markers = f"{store_path}/_applied_epochs"
    applied = {"n": 0}

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        marker = f"{markers}/{epoch_id}.done"
        if hadoop_exists(spark, marker):
            return
        ann_ingest_batch(batch_df, store_path, n_buckets)
        hadoop_touch(spark, marker)
        applied["n"] += 1
        if compact_every and applied["n"] % compact_every == 0:
            compact_codes(spark, store_path, n_buckets)

    return (
        vectors.writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def forget_vectors_in_index(
    spark: SparkSession,
    vec_ids: DataFrame,
    store_path: str,
    n_buckets: int = N_BUCKETS,
) -> dict:
    """Erase ``vec_ids`` (one column, ``vec_id``) from the index — the
    bm25index erasure contract applied to the vector side: the
    victims' code rows leave the cell-bucketed store via a
    bucket-local (cell, vec_id) row-level forget (each vector lives in
    exactly ONE cell, so the rewrite touches at most |victims| buckets
    — tighter than the text case), and their ledger rows via the
    key-level forget.  Codes first, ledger last; replay is a no-op;
    erased ids are re-indexable.  Returns per-store deletion counts."""
    from kafkastreamsproject_spark.sources.bucketed import (
        forget_keys_in_store,
        forget_rows_in_store,
    )

    victims = vec_ids.select("vec_id").distinct().localCheckpoint(eager=True)
    c_path = _codes_path(store_path)
    victim_keys = (
        read_codes(spark, store_path, n_buckets)
        .select("cell", "vec_id")
        .join(F.broadcast(victims), "vec_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = {
        "codes": forget_rows_in_store(
            spark, victim_keys, c_path,
            store_table_name("ann_codes", c_path),
            _CODES_SCHEMA, ["cell"], n_buckets,
            match_cols=["cell", "vec_id"],
        ),
        "seen": forget_keys_in_store(
            spark, victims, _seen_path(store_path),
            store_table_name("ann_seen", _seen_path(store_path)),
            _SEEN_SCHEMA, ["vec_id"], n_buckets,
        ),
    }
    return out
