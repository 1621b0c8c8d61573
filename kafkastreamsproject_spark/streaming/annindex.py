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
- **tombstones** (tiny plain-parquet append set, r14): PENDING
  logical deletes.  :func:`tombstone_vectors_in_index` is the O(1)
  delete tier — one small append, no store rewrite — and every query
  anti-joins the pending set out of its candidates pre-ADC, so a
  deleted vector disappears from results at the NEXT query.
  :func:`apply_tombstones` makes the delete physical (the
  :func:`forget_vectors_in_index` bucket-local rewrite) and clears
  the set — the Kafka-log-compaction delete model (reference
  semantics: a null-valued record tombstones its key in a compacted
  topic until log cleaning drops both) re-expressed over parquet.

Geometry is a STORE-CREATION PARAMETER, not a module constant (r12
verdict #1: frozen ``C_CELLS = 8`` made every query ADC-score a fixed
nprobe/C = 25% of the corpus — O(N) by construction).  The geometry
``{c_cells, k_codes, m_subspaces, n_buckets}`` is chosen at
:func:`create_ann_store`, persisted in the ``_ann_meta.json`` sidecar
next to the codebooks (the ``_store_meta.json`` discipline), and
every fold/query/erasure reads it from there — a caller-supplied
expectation is ASSERTED against the sidecar, never trusted.  Sizing
rule (the standard IVF guidance): **C ≈ √N**, so a query's candidate
set is ≈ nprobe·N/C ≈ nprobe·√N — sublinear in the corpus — and each
cell's posting list is ≈ √N rows.  :func:`sized_geometry` encodes the
rule; ``scripts/r13_ann_geometry_smoke.py`` measures it (query wall
across 10× corpus growth, corpus-sized C vs the old frozen C).

Exactness: quantization (round(x·127)), subspacing (ceil(dim/M)
slices), cell assignment (integer L2 argmin, cid tie-break), and ADC
(integer subvector distances summed per candidate) reproduce the
batch family's conventions bit-for-bit, so
``plans/ingest.py:streaming_ann_index`` verifies the two-epoch fold
against ivf_pq_search's own DuckDB oracle — identical rows, identical
integers — and ``streaming_ann_index_geo`` repeats the check at a
NON-DEFAULT geometry against a re-parameterized oracle.  Store
behavior is pytest-pinned in tests/test_ann_index.py.

Reference scope: the reference engine has no vector surface; this is
part of the similarity-search extension family (SURVEY §2.7).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafkastreamsproject_spark.storeconfig import DEFAULTS
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
#: IVF-Flat sidecar: the quantized vectors themselves, cell-bucketed
#: like the codes, so exact rerank can read ONLY the probed cells
#: (pushed ``cell IN`` scan filter) instead of one pass over the
#: upstream corpus.  Opt-in at store creation (it doubles-ish the
#: store's footprint: dim int64s per vector vs M codes).
_VECS_SCHEMA = "cell int, vec_id long, qv array<bigint>"
_VECS_MARKER = "_vector_sidecar"

#: DEFAULT geometry = the batch-family test-SF convention
#: (plans/similarity.py) — the default-geometry store must equal the
#: batch search exactly.  These are creation-time defaults only
#: (values owned by storeconfig.py, the shared config surface); the
#: sidecar is the source of truth for an existing store.
M_SUBSPACES = DEFAULTS.ann_m_subspaces
K_CODES = DEFAULTS.ann_k_codes
C_CELLS = DEFAULTS.ann_c_cells
N_BUCKETS = DEFAULTS.n_buckets

_GEO_KEYS = ("c_cells", "k_codes", "m_subspaces", "n_buckets")
_GEO_FILE = "_ann_meta.json"


def default_geometry() -> dict:
    return {
        "c_cells": C_CELLS,
        "k_codes": K_CODES,
        "m_subspaces": M_SUBSPACES,
        "n_buckets": N_BUCKETS,
    }


def sized_geometry(
    n_vectors: int,
    m_subspaces: int = M_SUBSPACES,
    k_codes: int = K_CODES,
) -> dict:
    """Corpus-sized geometry: **C ≈ √N** (the standard IVF sizing rule
    — candidates per query ≈ nprobe·N/C ≈ nprobe·√N, cell posting
    lists ≈ √N), never below the family-default 8.  ``n_buckets``
    tracks C up to 64 so the codes store's buckets stay ≥1 cell wide
    while each holds a bounded slice of the corpus; at 100 TB widen
    further per the sources/bucketed.py rule (≥ ingest parallelism,
    128–512 MB per bucket).  M and K are quantization-fidelity knobs,
    not corpus-size knobs (production PQ uses K=256, M=dim/4); they
    pass through unchanged."""
    c = max(C_CELLS, int(round(math.sqrt(max(1, n_vectors)))))
    return {
        "c_cells": c,
        "k_codes": k_codes,
        "m_subspaces": m_subspaces,
        "n_buckets": max(8, min(64, c)),
    }


def write_ann_geometry(
    spark: SparkSession, store_path: str, geo: dict
) -> None:
    import json

    from kafkastreamsproject_spark.operators.fs import hadoop_write_text

    hadoop_write_text(
        spark,
        f"{store_path}/{_GEO_FILE}",
        json.dumps({k: int(geo[k]) for k in _GEO_KEYS}),
    )


def ann_geometry(spark: SparkSession, store_path: str) -> dict:
    """The geometry the store at ``store_path`` was created with — the
    single source of truth for every fold/query/erasure.  A store
    predating the sidecar is stamped with the module defaults on first
    touch (the bucketed.py migration assumption: pre-sidecar stores
    were all built at the frozen default geometry)."""
    import json

    from kafkastreamsproject_spark.operators.fs import hadoop_read_text

    text = hadoop_read_text(spark, f"{store_path}/{_GEO_FILE}")
    if text:
        return json.loads(text)
    geo = default_geometry()
    write_ann_geometry(spark, store_path, geo)
    return geo


def check_ann_geometry(
    spark: SparkSession, store_path: str, expect: dict | None
) -> dict:
    """Load the sidecar geometry, asserting any caller-supplied
    expectation against it — a fold or query built for one geometry
    must FAIL on a store created with another (codes are only
    meaningful under their own codebooks/cell count), never silently
    mis-assign."""
    geo = ann_geometry(spark, store_path)
    if expect:
        bad = {
            k: (expect[k], geo[k])
            for k in expect
            if k in _GEO_KEYS and int(expect[k]) != int(geo[k])
        }
        if bad:
            raise ValueError(
                f"ANN store at {store_path} was created with geometry "
                f"{geo}; caller expected "
                + ", ".join(f"{k}={e}" for k, (e, _g) in sorted(bad.items()))
                + " — all folds/queries against one store must use the "
                "geometry it was created with (streaming/annindex.py)"
            )
    return geo


def quantize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """int8-scale codes: round(x·127) per component (the family-wide
    quantization)."""
    return df.select(
        "vec_id",
        F.transform(
            vec_col, lambda x: F.round(x.cast("double") * 127).cast("long")
        ).alias("qv"),
    )


def _subspaces(base: DataFrame, m_subspaces: int) -> DataFrame:
    """(vec_id, s, sv): ceil(dim/M) slices, the PQ subspace split."""
    sub_len = F.ceil(F.size("qv") / m_subspaces).cast("int")
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m_subspaces - 1)),
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


#: an explicit C this far below the √N rule draws a warning: sized C
#: > 4·explicit C means every query ADC-scores ≥4× the candidates the
#: sized store would — the O(N)-query regression r12 flagged, creeping
#: back through a hand-me-down constant.  Test-SF stores (≤1024
#: vectors at the C=8 family default) stay under it by design.
_SIZE_WARN_FACTOR = 4

_BASELINE_FILE = "_ann_baseline.json"


def _write_baseline(
    spark: SparkSession, store_path: str, rec: dict
) -> None:
    import json

    from kafkastreamsproject_spark.operators.fs import hadoop_write_text

    hadoop_write_text(
        spark, f"{store_path}/{_BASELINE_FILE}", json.dumps(rec)
    )


def ann_baseline(spark: SparkSession, store_path: str) -> dict | None:
    """The store's training-time fidelity record
    ({"baseline_err2": float, "trained_n": int}), or ``None`` for a
    store predating the sidecar."""
    import json

    from kafkastreamsproject_spark.operators.fs import hadoop_read_text

    text = hadoop_read_text(spark, f"{store_path}/{_BASELINE_FILE}")
    return json.loads(text) if text else None


def _mean_pq_err2(sub: DataFrame, cb: DataFrame) -> float | None:
    """Mean per-vector PQ reconstruction error under codebook ``cb``:
    for each (vector, subspace) the distance² to the NEAREST code —
    the argmin dist2 IS the reconstruction error, no codes join needed
    — summed over subspaces, averaged over vectors.  ``None`` on an
    empty input."""
    per_sub = (
        sub.join(
            F.broadcast(
                cb.select(F.col("s").alias("s_cb"), "cid", "cv")
            ),
            F.col("s") == F.col("s_cb"),
        )
        .groupBy("vec_id", "s")
        .agg(F.min(_int_dist2(F.col("sv"), F.col("cv"))).alias("e"))
    )
    row = (
        per_sub.groupBy("vec_id")
        .agg(F.sum("e").alias("err2"))
        .agg(F.avg("err2"))
        .first()
    )
    return None if row is None or row[0] is None else float(row[0])


def create_ann_store(
    spark: SparkSession,
    store_path: str,
    train: DataFrame,
    c_cells: int | None = None,
    k_codes: int = K_CODES,
    m_subspaces: int = M_SUBSPACES,
    n_buckets: int | None = None,
    store_vectors: bool = False,
) -> dict:
    """Freeze the coarse centroids and PQ codebook from ``train``
    (vec_id, embedding) — the deterministic first-C/first-K convention
    — write them as the store's codebook snapshot, and persist the
    geometry in the ``_ann_meta.json`` sidecar.  Codes appended later
    are only meaningful under THIS snapshot + geometry.

    Geometry defaults to **corpus-sized** (r13 verdict #1): with no
    ``c_cells``, C and the bucket width come from
    :func:`sized_geometry` of ``train``'s count — a bare creation can
    no longer silently build the frozen test-SF C=8 store whose query
    cost is O(N).  Pass ``**default_geometry()`` to opt into the
    batch-family test-SF convention explicitly (the default-geometry
    oracle-equality queries do); an explicit C more than
    ``_SIZE_WARN_FACTOR``× below the √N rule draws a UserWarning.
    Creation prices in one counting pass over ``train`` (plus the
    codebook-prefix scans) — it is the rare, out-of-band step of the
    store lifecycle.

    ``store_vectors=True`` enables the IVF-Flat sidecar: every fold
    also appends the fresh vectors' quantized embeddings to a
    cell-bucketed ``vecs`` store, so :func:`ann_rerank_index` with
    ``vectors_from_store=True`` re-ranks from the probed cells alone
    instead of re-scanning the upstream corpus.  The flag persists as
    the ``_vector_sidecar`` marker — folds pick it up with no caller
    args.  Returns the geometry dict."""
    import warnings

    n_train = train.count()
    if c_cells is None:
        sized = sized_geometry(
            n_train, m_subspaces=m_subspaces, k_codes=k_codes
        )
        c_cells = sized["c_cells"]
        if n_buckets is None:
            n_buckets = sized["n_buckets"]
    elif n_train > (_SIZE_WARN_FACTOR * int(c_cells)) ** 2:
        warnings.warn(
            f"create_ann_store: explicit c_cells={c_cells} over a "
            f"{n_train}-vector corpus — sized_geometry would pick "
            f"C={sized_geometry(n_train)['c_cells']}, so every query "
            f"will ADC-score ≥{_SIZE_WARN_FACTOR}× the candidates of a "
            "√N-sized store (nprobe·N/C supralinear in √N).  Omit "
            "c_cells to size to the corpus, or pass the intended "
            "geometry deliberately",
            UserWarning,
            stacklevel=2,
        )
    if n_buckets is None:
        n_buckets = N_BUCKETS
    geo = {
        "c_cells": int(c_cells),
        "k_codes": int(k_codes),
        "m_subspaces": int(m_subspaces),
        "n_buckets": int(n_buckets),
    }
    base = quantize(train)
    # training set = the FIRST C/K vectors of ``train`` by vec_id —
    # on a contiguous-id corpus this is exactly the batch family's
    # ``vec_id < C`` convention (so the default-geometry oracle
    # equality holds), and on a gapped corpus (a post-erasure rebuild
    # over survivors) it stays deterministic.  Training ids become the
    # int32 ccid/cid codebook keys (_COARSE_SCHEMA/_CB_SCHEMA) — a
    # training vec_id past int32 would overflow the cast SILENTLY,
    # corrupting every codes join and the erasure residue guard (r13
    # ADVICE), so creation fails loudly instead.
    max_train_id = (
        base.orderBy("vec_id")
        .limit(max(c_cells, k_codes))
        .agg(F.max("vec_id"))
        .first()[0]
    )
    if max_train_id is not None and max_train_id > 2**31 - 1:
        raise ValueError(
            f"codebook training vec_id {max_train_id} exceeds int32: "
            "ccid/cid codebook keys are int32 — remap vec_ids below "
            "2^31 (or train on a lower-id prefix) before creating the "
            "store (streaming/annindex.py)"
        )
    coarse = (
        base.orderBy("vec_id")
        .limit(c_cells)
        .select(
            F.col("vec_id").cast("int").alias("ccid"),
            F.col("qv").alias("cv2"),
        )
    )
    cb = _subspaces(
        base.orderBy("vec_id").limit(k_codes), m_subspaces
    ).select(
        "s", F.col("vec_id").cast("int").alias("cid"), F.col("sv").alias("cv")
    )
    coarse.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        f"{_cb_dir(store_path)}/coarse"
    )
    cb.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        f"{_cb_dir(store_path)}/pq"
    )
    write_ann_geometry(spark, store_path, geo)
    # training-time quantization fidelity, persisted for drift
    # detection: the mean per-vector PQ reconstruction error over the
    # training corpus is what "in-distribution" costs under THIS
    # codebook — codebook_drift() prices every later batch against it
    # (one extra training-set pass; creation is the rare out-of-band
    # step)
    baseline = _mean_pq_err2(_subspaces(base, m_subspaces), cb)
    _write_baseline(
        spark, store_path,
        {"baseline_err2": baseline, "trained_n": int(n_train)},
    )
    if store_vectors:
        from kafkastreamsproject_spark.operators.fs import hadoop_write_text

        hadoop_write_text(spark, f"{store_path}/{_VECS_MARKER}", "1")
    # new codebooks under this path: drop any cached coarse broadcast
    # (a rebuild under a NEW version dir simply never hits its entry)
    _invalidate_coarse_cache(store_path)
    return geo


def has_vector_sidecar(spark: SparkSession, store_path: str) -> bool:
    from kafkastreamsproject_spark.operators.fs import hadoop_exists

    return hadoop_exists(spark, f"{store_path}/{_VECS_MARKER}")


def read_codebooks(
    spark: SparkSession, store_path: str
) -> tuple[DataFrame, DataFrame]:
    coarse = spark.read.schema(_COARSE_SCHEMA).parquet(
        f"{_cb_dir(store_path)}/coarse"
    )
    cb = spark.read.schema(_CB_SCHEMA).parquet(f"{_cb_dir(store_path)}/pq")
    return coarse, cb


#: above this coarse-codebook size the brute-force expression-tree
#: assignment (crossJoin + per-pair zip_with aggregate, cost ∝ C rows
#: PER VECTOR) loses to the Arrow-vectorized matmul path — measured at
#: C=447: fold walls 20-44 s/epoch expression vs ~flat vectorized
#: (smokes/r13.json ann_geometry).  Both paths are EXACT-integer and
#: pytest-pinned equal; the JVM path stays default for small C so the
#: common case keeps a Python-free plan.
_VECTORIZED_ASSIGN_MIN_C = 64

#: one collected-coarse-matrix broadcast per STORE PATH (r13 verdict
#: #3): before this, every micro-batch fold re-collected the coarse
#: codebook to the driver — C·dim int64 per fold, a ~10⁵-row pull per
#: micro-batch at 10¹⁰-vector scale.  The cache holds the
#: sc.broadcast handle; create_ann_store invalidates its path (a
#: rebuild writes under a NEW version dir, so its fresh path simply
#: misses).  Driver + per-executor memory bound: C·dim·8 B ≈ √N·dim·8
#: B under the sizing rule (storeconfig.py) — ~80 MB at N=10¹⁰,
#: dim=1024.
_COARSE_BC_CACHE: dict[str, object] = {}
#: test spy: driver collects of the coarse codebook (one per store
#: lifetime, not per fold — pinned in tests/test_ann_index.py)
_COARSE_COLLECTS = {"n": 0}


def _collect_coarse_mats(coarse: DataFrame):
    """(ccids, cent, cent_sq) int64 numpy snapshot of the coarse
    codebook, sorted by ccid (numpy's first-min argmin then IS the
    lowest-ccid tie-break)."""
    import numpy as np

    rows = coarse.orderBy("ccid").collect()
    _COARSE_COLLECTS["n"] += 1
    ccids = np.array([r.ccid for r in rows], dtype=np.int64)
    cent = np.array([list(r.cv2) for r in rows], dtype=np.int64)
    return ccids, cent, (cent * cent).sum(axis=1)


def coarse_broadcast(spark: SparkSession, store_path: str, coarse: DataFrame):
    """The store's coarse codebook as a Spark broadcast variable —
    collected ONCE per store path and reused by every later fold (the
    stream's whole lifetime), instead of a per-micro-batch driver
    pull.  Executors fetch the broadcast once per JVM, not once per
    task, and the handle survives plan re-use across foreachBatch
    invocations."""
    bc = _COARSE_BC_CACHE.get(store_path)
    if bc is None:
        bc = spark.sparkContext.broadcast(_collect_coarse_mats(coarse))
        _COARSE_BC_CACHE[store_path] = bc
    return bc


def _invalidate_coarse_cache(store_path: str) -> None:
    bc = _COARSE_BC_CACHE.pop(store_path, None)
    if bc is not None:
        try:
            bc.unpersist()
        except Exception:
            pass  # session already gone — nothing to free


def _assign_cells_vectorized(
    base: DataFrame, coarse: DataFrame, mats_bc=None
) -> DataFrame:
    """Exact-integer argmin assignment as ONE Arrow-batched Pandas UDF:
    ‖q−c‖² = ‖q‖² − 2·q·cᵀ + ‖c‖² over int64 numpy (a C×dim matmul per
    batch instead of C expression-tree rows per vector).  Centroids
    sort by ccid so numpy's first-min argmin IS the lowest-ccid
    tie-break — bit-identical to the expression path (pytest-pinned).
    With ``mats_bc`` (a :func:`coarse_broadcast` handle) the UDF reads
    the matrices from the broadcast — zero driver work here; without
    it the codebook collects inline (ad-hoc/test path) and ships in
    the closure — the perceptron-weights idiom: a model snapshot,
    C·dim longs, small by construction relative to the corpus
    (C ≈ √N)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mats_local = _collect_coarse_mats(coarse) if mats_bc is None else None

    # no type hints: under `from __future__ import annotations` they
    # stringify and the pandas_udf inferrer can't resolve them; the
    # unannotated form is the scalar Series→Series UDF
    @pandas_udf("int")
    def cell_of(qv):
        ccids, cent, cent_sq = (
            mats_local if mats_bc is None else mats_bc.value
        )
        # empty Arrow batch: np.array([]) is 1-D, so the axis=1
        # reductions below would raise inside the UDF (r13 ADVICE)
        if len(qv) == 0:
            return pd.Series([], dtype=np.int32)
        m = np.array(qv.tolist(), dtype=np.int64)
        d = (
            (m * m).sum(axis=1)[:, None]
            - 2 * (m @ cent.T)
            + cent_sq[None, :]
        )
        return pd.Series(ccids[d.argmin(axis=1)].astype(np.int32))

    return base.select("vec_id", "qv", cell_of(F.col("qv")).alias("cell"))


def _probe_cells_vectorized(
    base: DataFrame, coarse: DataFrame, nprobe: int, mats_bc=None
) -> DataFrame:
    """Top-``nprobe`` coarse cells per query as ONE Arrow-batched
    Pandas UDF — the query-side twin of :func:`_assign_cells_vectorized`
    (r14): the expression path's crossJoin costs |queries|·C rows,
    fine for a 10-query probe but explosive for BULK query batches at
    C = √N (a dedup-by-ANN join of 10⁶ queries against C = 10⁵ is
    10¹¹ expression rows).  Ranking is by (distance², ccid): the
    centroid matrix sorts by ccid, so a STABLE argsort's tie order IS
    the lowest-ccid tie-break — bit-identical to the window path
    (pytest-pinned).  Returns (query_id, cell) probe rows."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mats_local = _collect_coarse_mats(coarse) if mats_bc is None else None

    @pandas_udf("array<int>")
    def cells_of(qv):
        ccids, cent, cent_sq = (
            mats_local if mats_bc is None else mats_bc.value
        )
        if len(qv) == 0:
            return pd.Series([], dtype=object)
        m = np.array(qv.tolist(), dtype=np.int64)
        d = (
            (m * m).sum(axis=1)[:, None]
            - 2 * (m @ cent.T)
            + cent_sq[None, :]
        )
        idx = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(
            [ccids[row].astype(np.int32).tolist() for row in idx]
        )

    return base.select(
        F.col("vec_id").alias("query_id"),
        F.explode(cells_of(F.col("qv"))).alias("cell"),
    )


def assign_cells(
    base: DataFrame,
    coarse: DataFrame,
    c_cells: int | None = None,
    mats_bc=None,
) -> DataFrame:
    """(vec_id, qv, cell): integer L2 argmin over the broadcast coarse
    centroids, ties to the lowest ccid — the batch family's assignment
    as a partial-aggregating min(struct) instead of a per-vector
    window (same result, batch-size-independent shuffle).  With
    ``c_cells`` known and large, the exact vectorized path takes over
    (see :data:`_VECTORIZED_ASSIGN_MIN_C`) — same integers, ∝C matmul
    instead of ∝C rows per vector; pass ``mats_bc`` to reuse a
    per-store :func:`coarse_broadcast` instead of re-collecting."""
    if c_cells is not None and c_cells > _VECTORIZED_ASSIGN_MIN_C:
        return _assign_cells_vectorized(base, coarse, mats_bc)
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


def _vecs_path(store_path: str) -> str:
    return f"{store_path}/vecs"


def read_vecs(
    spark: SparkSession, store_path: str, n_buckets: int | None = None
) -> DataFrame:
    if n_buckets is None:
        n_buckets = ann_geometry(spark, store_path)["n_buckets"]
    path = _vecs_path(store_path)
    return read_bucketed_store(
        spark, path, store_table_name("ann_vecs", path),
        _VECS_SCHEMA, ["cell"], n_buckets,
    )


def read_codes(
    spark: SparkSession, store_path: str, n_buckets: int | None = None
) -> DataFrame:
    if n_buckets is None:
        n_buckets = ann_geometry(spark, store_path)["n_buckets"]
    path = _codes_path(store_path)
    return read_bucketed_store(
        spark, path, store_table_name("ann_codes", path),
        _CODES_SCHEMA, ["cell"], n_buckets,
    )


def read_seen(
    spark: SparkSession, store_path: str, n_buckets: int | None = None
) -> DataFrame:
    if n_buckets is None:
        n_buckets = ann_geometry(spark, store_path)["n_buckets"]
    path = _seen_path(store_path)
    return read_bucketed_store(
        spark, path, store_table_name("ann_seen", path),
        _SEEN_SCHEMA, ["vec_id"], n_buckets,
    )


def ann_ingest_batch(
    batch: DataFrame,
    store_path: str,
    geometry: dict | None = None,
    max_drift_ratio: float | None = None,
) -> dict:
    """Fold one micro-batch of (vec_id, embedding) into the index.
    Returns {"vecs_indexed": n, "codes_appended": m}.  Same layered
    idempotency as bm25index: bucket-key seen probe (zero store-side
    Exchange), codes append first, seen append is the commit point.
    Geometry comes from the store's sidecar; a caller-supplied
    ``geometry`` expectation is asserted against it.

    ``max_drift_ratio`` arms the codebook-drift gate: the fresh rows'
    mean PQ reconstruction error is priced against the store's
    training baseline (:func:`codebook_drift`) BEFORE anything is
    appended, and the fold RAISES past the threshold — refusing to
    fill the index with codes the frozen codebooks can't represent
    (each would be served with silently degraded distances forever).
    The remedy is a codebook retrain (:func:`rebuild_ann_store`).
    Opt-in because it prices one extra batch pass and because some
    deployments prefer alerting on the measured ratio to hard-failing
    the pipeline."""
    spark = batch.sparkSession
    geo = check_ann_geometry(spark, store_path, geometry)
    n_buckets = geo["n_buckets"]
    coarse, cb = read_codebooks(spark, store_path)

    with shuffle_scoped_to_buckets(spark, n_buckets):
        seen = read_seen(spark, store_path, n_buckets)
        # intra-batch dedup FIRST: two rows sharing a vec_id inside one
        # micro-batch would both pass the store-side freshness probe —
        # duplicate ledger rows, inflated vecs_indexed (r12 ADVICE).
        # One arbitrary representative per vec_id survives, matching
        # the cross-batch first-writer-wins contract.
        fresh = batch.dropDuplicates(["vec_id"]).join(
            seen.select("vec_id"), "vec_id", "left_anti"
        ).localCheckpoint(eager=True)

        if max_drift_ratio is not None:
            drift = codebook_drift(spark, store_path, fresh).first()
            if (
                drift is not None
                and drift.n_vectors > 0
                and drift.drift_ratio is not None
                and drift.drift_ratio > max_drift_ratio
            ):
                raise ValueError(
                    f"codebook drift gate: batch mean PQ reconstruction "
                    f"error is {drift.drift_ratio}× the training "
                    f"baseline (limit {max_drift_ratio}) — the frozen "
                    "codebooks no longer fit the arriving distribution; "
                    "retrain + rebuild the store (rebuild_ann_store) "
                    "instead of appending degraded codes"
                )

        # large-C stores assign through the per-store codebook
        # broadcast — ONE driver collect for the stream's lifetime,
        # not one per micro-batch (r13 verdict #3)
        mats_bc = (
            coarse_broadcast(spark, store_path, coarse)
            if geo["c_cells"] > _VECTORIZED_ASSIGN_MIN_C
            else None
        )
        assigned = assign_cells(
            quantize(fresh), coarse, geo["c_cells"], mats_bc
        )
        if has_vector_sidecar(spark, store_path):
            # the sidecar append below reuses `assigned` wholesale —
            # pin it so assignment runs once, not once per consumer
            assigned = assigned.localCheckpoint(eager=True)
        codes = (
            encode_pq(
                _subspaces(
                    assigned.select("vec_id", "qv"), geo["m_subspaces"]
                ),
                cb,
            )
            .join(assigned.select("vec_id", "cell"), "vec_id")
            .select("cell", "vec_id", "s", "cid")
            .localCheckpoint(eager=True)
        )

        c_path = _codes_path(store_path)
        append_bucketed_store(
            spark, codes, c_path, store_table_name("ann_codes", c_path),
            ["cell"], n_buckets,
        )
        if has_vector_sidecar(spark, store_path):
            # IVF-Flat sidecar: the fresh vectors' quantized
            # embeddings, cell-bucketed like the codes — appended
            # BEFORE the seen commit point (same crash-window order:
            # an uncommitted doc is fully re-indexed on replay)
            v_path = _vecs_path(store_path)
            append_bucketed_store(
                spark,
                assigned.select("cell", "vec_id", "qv"),
                v_path,
                store_table_name("ann_vecs", v_path),
                ["cell"],
                n_buckets,
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


def compact_codes(spark: SparkSession, store_path: str) -> int:
    """Bound per-epoch small files in every store of the index
    (seen + codes + the vecs sidecar when present); run between
    epochs."""
    n_buckets = ann_geometry(spark, store_path)["n_buckets"]
    s_path = _seen_path(store_path)
    compact_bucketed_store(
        spark, s_path, store_table_name("ann_seen", s_path),
        _SEEN_SCHEMA, ["vec_id"], n_buckets,
    )
    if has_vector_sidecar(spark, store_path):
        v_path = _vecs_path(store_path)
        compact_bucketed_store(
            spark, v_path, store_table_name("ann_vecs", v_path),
            _VECS_SCHEMA, ["cell"], n_buckets,
        )
    c_path = _codes_path(store_path)
    return compact_bucketed_store(
        spark, c_path, store_table_name("ann_codes", c_path),
        _CODES_SCHEMA, ["cell"], n_buckets,
    )


def _query_probes(
    spark: SparkSession,
    store_path: str,
    qbase: DataFrame,
    coarse: DataFrame,
    geo: dict,
    nprobe: int,
) -> DataFrame:
    """Each query's nprobe nearest coarse cells as (query_id, cell) —
    the probe-assignment stage shared by top-k, rerank, and range
    search.  Small C: broadcast cross-join + window (whole-stage
    codegen).  Large C (> _VECTORIZED_ASSIGN_MIN_C): the per-store
    codebook broadcast and Arrow matmul the ingest side uses — ∝C
    work per batch row instead of |queries|·C expression rows
    (bit-identical ranking, pytest-pinned)."""
    if nprobe > geo["c_cells"]:
        raise ValueError(
            f"nprobe={nprobe} exceeds the store's c_cells="
            f"{geo['c_cells']} — a probe list can't be wider than the "
            "coarse codebook"
        )
    if geo["c_cells"] > _VECTORIZED_ASSIGN_MIN_C:
        return _probe_cells_vectorized(
            qbase,
            coarse,
            nprobe,
            coarse_broadcast(spark, store_path, coarse),
        )
    qd = qbase.crossJoin(F.broadcast(coarse)).select(
        F.col("vec_id").alias("query_id"),
        "qv",
        "ccid",
        _int_dist2(F.col("qv"), F.col("cv2")).alias("dist2"),
    )
    wq = W.partitionBy("query_id").orderBy("dist2", "ccid")
    return (
        qd.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("ccid").alias("cell"))
    )


#: default cap on the literal ``cell IN (...)`` pruning list — see
#: :func:`_pruned_to_probes`.  8192 ints is a few-hundred-KB predicate,
#: well under plan-bloat territory, and a sized store (C ≈ √N) with
#: that many PROBED cells is being read mostly anyway.
_MAX_PRUNE_CELLS = 8192


def _max_prune_cells() -> int:
    return int(
        os.environ.get("SPARK_GRAFT_MAX_PRUNE_CELLS", _MAX_PRUNE_CELLS)
    )


def _pruned_to_probes(store_df: DataFrame, probes: DataFrame) -> DataFrame:
    """Push the probed cells into the codes/vecs scan as a literal
    ``cell IN (...)`` parquet filter (r14 verdict #1) — the sidecar
    rerank path's discipline applied to every store read.  The
    broadcast-hash join on ``cell`` alone eliminates the Exchange but
    NOT the scan: every store file is read and non-probed cells are
    discarded after the fact, an O(N)-bytes read per query batch that
    inverts the IVF contract at 10¹⁰ vectors.  The distinct probed
    cells are driver-bounded (≤ |queries|·nprobe ≤ C ints; ``probes``
    is already materialized and broadcast), and a literal IN on the
    clustering column both bucket-prunes the scan and row-group-skips
    inside the kept buckets (files are SORTED BY cell) — bytes read
    become ∝ probed cells, rows ≈ nprobe·√N under sized geometry.

    Adversarial probe widths (r15): past ``_max_prune_cells()``
    distinct cells the literal IN stops being a win — the IN-list
    bloats the plan (parse/codegen cost per query) while pruning
    little, because probing ≳10⁴ distinct cells means the batch
    touches most of the store anyway.  Beyond the cap this returns
    the scan unfiltered and the existing broadcast-hash join on
    ``cell`` (zero Exchange) remains the row bound — the pre-r15
    shape, now the documented wide-batch fallback instead of the
    only path.  Cap overridable via $SPARK_GRAFT_MAX_PRUNE_CELLS
    (scale posture: the serving contract bounds probe sets to
    broadcast size, so the cap should never bind in production)."""
    cells = [int(r.cell) for r in probes.select("cell").distinct().collect()]
    if not cells:
        # no probes (empty query batch) — nothing can match; an empty
        # IN-list would be degenerate, so prune to nothing explicitly
        return store_df.filter(F.lit(False))
    if len(cells) > _max_prune_cells():
        return store_df
    return store_df.filter(F.col("cell").isin(cells))


def codebook_drift(
    spark: SparkSession,
    store_path: str,
    batch: DataFrame,
    geometry: dict | None = None,
) -> DataFrame:
    """Price a batch's distribution against the store's FROZEN
    codebooks — the retrain gauge.  The codebooks quantize well only
    what they were trained on; as the ingested distribution drifts,
    PQ reconstruction error climbs, ADC distances degrade, and recall
    decays SILENTLY (queries still return k rows — they're just
    worse).  This measures it: the batch's mean per-vector
    reconstruction error under the store's codebooks, against the
    training-time baseline persisted at :func:`create_ann_store`.

    Returns one row ``(n_vectors, mean_err2, baseline_err2,
    drift_ratio)`` (6-dp rounds — cross-engine stable).  A ratio near
    1 is in-distribution; a sustained climb says the codebooks no
    longer fit the corpus and :func:`rebuild_ann_store` should retrain
    them (the versioned-rebuild path).  The standard deployment calls
    this per epoch and alerts on a threshold — or passes
    ``max_drift_ratio`` to :func:`ann_ingest_batch` to enforce it AT
    ingest.  Cost: one pass over the batch (M·K broadcast distances
    per vector — the same work as encoding it)."""
    geo = check_ann_geometry(spark, store_path, geometry)
    rec = ann_baseline(spark, store_path)
    if rec is None or rec.get("baseline_err2") is None:
        raise ValueError(
            f"ANN store at {store_path} has no training-fidelity "
            "baseline (_ann_baseline.json) — recreate the store (or "
            "rebuild_ann_store) to stamp one before measuring drift"
        )
    _coarse, cb = read_codebooks(spark, store_path)
    sub = _subspaces(quantize(batch), geo["m_subspaces"])
    per = (
        sub.join(
            F.broadcast(
                cb.select(F.col("s").alias("s_cb"), "cid", "cv")
            ),
            F.col("s") == F.col("s_cb"),
        )
        .groupBy("vec_id", "s")
        .agg(F.min(_int_dist2(F.col("sv"), F.col("cv"))).alias("e"))
        .groupBy("vec_id")
        .agg(F.sum("e").alias("err2"))
    )
    b = float(rec["baseline_err2"])
    # a 0 baseline (the codebook memorized its training set verbatim —
    # only possible on tiny/degenerate corpora, K ≥ distinct vectors)
    # makes the ratio undefined: emit NULL rather than Infinity/NaN,
    # and let callers treat "unpriceable" explicitly (the ingest gate
    # passes it through — it cannot price what has no scale)
    ratio = (
        F.round(F.col("mean_err2") / F.lit(b), 6)
        if b > 0
        else F.lit(None).cast("double")
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(F.avg("err2"), 6).alias("mean_err2"),
    ).select(
        "n_vectors",
        "mean_err2",
        F.round(F.lit(b), 6).alias("baseline_err2"),
        ratio.alias("drift_ratio"),
    )


def ann_query_index(
    spark: SparkSession,
    store_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    geometry: dict | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ search FROM THE STORE: assign each query its nprobe
    nearest cells (broadcast coarse centroids), push the probed cells
    into the cell-bucketed codes scan as a literal ``cell IN (...)``
    parquet filter (bucket pruning + SORTED-BY row-group skipping —
    bytes read ∝ probed cells, r14 verdict #1), equi-join the probes
    against the pruned scan (zero store-side Exchange under the
    scoped shuffle conf), ADC-score the candidates against the
    broadcast codebook + query subvectors, and emit the top-k per
    query.  ``queries`` is
    (vec_id, embedding); a query never matches itself (the batch
    family's convention for corpus-member queries).

    ``allowed`` (one column, ``vec_id``) is the FILTERED-search
    predicate (r13 verdict #5): candidates outside it leave at a
    semi-join INSIDE the cell-probe stage — after the probe equi-join,
    BEFORE any ADC work — so the top-k ranks only eligible vectors and
    always fills k when ≥k eligible candidates sit in the probed
    cells.  Post-filtering the unfiltered top-k instead silently
    under-fills it (pinned in tests/test_ann_index.py) and wastes ADC
    on vectors the caller will discard.  The predicate set broadcasts
    (driver-boundable — the pattern for label/source/lang-style
    predicates resolved from a metadata table); a store-scale
    predicate belongs in a vec_id-bucketed store semi-joined on its
    bucket key, the sources/bucketed.py discipline.

    Geometry comes from the store's sidecar (a caller expectation is
    asserted); with the C ≈ √N sizing rule the candidate set is
    ≈ nprobe·√N — the scan fraction SHRINKS as the corpus grows,
    where the old frozen C=8 pinned it at nprobe/8 of everything.

    Returns (query_id, vec_id, cell, adc_dist2, rnk) — identical rows
    to plans/similarity.py:ivf_pq_search over the same corpus, which
    is exactly what the streaming_ann_index oracle asserts
    (``ann_filtered_topk`` asserts the filtered form)."""
    geo = check_ann_geometry(spark, store_path, geometry)
    n_buckets = geo["n_buckets"]
    coarse, cb = read_codebooks(spark, store_path)
    qbase = quantize(queries)
    # materialized once: the probe set feeds BOTH the scan-pruning
    # cell collect below and the candidate equi-join — without the
    # checkpoint the probe assignment (a |queries|·C window or Arrow
    # matmul) would run twice
    probes = _query_probes(
        spark, store_path, qbase, coarse, geo, nprobe
    ).localCheckpoint(eager=True)
    qsub = _subspaces(
        qbase.select(F.col("vec_id").alias("vec_id"), "qv"),
        geo["m_subspaces"],
    ).select(
        F.col("vec_id").alias("query_id"), "s", F.col("sv").alias("qsv")
    )

    tombs = read_tombstones(spark, store_path)
    with shuffle_scoped_to_buckets(spark, n_buckets):
        codes = _pruned_to_probes(
            read_codes(spark, store_path, n_buckets), probes
        )
        cand = (
            F.broadcast(probes)
            .join(codes, "cell")
            .filter(F.col("vec_id") != F.col("query_id"))
        )
        if tombs is not None:
            # pending logical deletes leave BEFORE any ADC work — a
            # tombstoned vector is unrankable, not post-filtered, so
            # the top-k fills from survivors (same seam as `allowed`;
            # the pending set is broadcast-bounded between applies)
            cand = cand.join(F.broadcast(tombs), "vec_id", "left_anti")
        if allowed is not None:
            # pre-ADC: ineligible candidates never reach the scoring
            # join, and the per-query top-k ranks eligible vectors only
            cand = cand.join(
                F.broadcast(allowed.select("vec_id").distinct()),
                "vec_id",
                "left_semi",
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


def ann_rerank_index(
    spark: SparkSession,
    store_path: str,
    queries: DataFrame,
    corpus: DataFrame | None = None,
    k: int = 5,
    nprobe: int = 2,
    r_shortlist: int = 50,
    geometry: dict | None = None,
    allowed: DataFrame | None = None,
    vectors_from_store: bool = False,
) -> DataFrame:
    """Exact-reranked store search — the standard production fix for
    quantization loss (the batch family's ivf_pq_rerank), run FROM THE
    STORE: :func:`ann_query_index` produces the ADC top-``r_shortlist``
    per query, then the shortlist's ORIGINAL vectors come back and the
    final top-k ranks by exact integer L2 on the quantized vectors,
    the family-wide rerank convention.  The store's own recall curve
    (``ann_store_recall_curve``) shows why this stage exists: ADC
    recall is quantization-bounded (flat-to-declining in nprobe),
    while the shortlist's CANDIDATE recall rises with nprobe — rerank
    converts candidate recall into delivered recall for |queries|·R
    exact distances.

    The shortlist's vectors come from one of two places:

    - ``corpus`` (default): the upstream embedding source — the
      |queries|·R shortlist BROADCASTS into one equi-join against the
      corpus scan, so rerank costs one corpus pass however large the
      store is.
    - ``vectors_from_store=True``: the IVF-Flat sidecar written at
      ingest (``create_ann_store(store_vectors=True)``) — the probed
      cells' ids push into the vecs scan as a ``cell IN (...)``
      parquet filter (the bm25 term-probe discipline: bucketed+sorted
      by cell, so row-group stats prune everything else), and rerank
      reads ≈ nprobe·√N vectors per query batch instead of the
      corpus.  The IN-list is the shortlist's distinct cells
      (≤ |queries|·nprobe, ≤ C); a deployment probing ≳10⁵ distinct
      cells per batch swaps the literal filter for a broadcast
      semi-join on cell.  Raises if the store has no sidecar.  Both
      paths return IDENTICAL rows (the sidecar holds the same
      quantized vectors — pytest-pinned; ``ann_rerank_sidecar``
      oracle-checks the sidecar path).

    Returns (query_id, vec_id, exact_dist2, rnk)."""
    short = ann_query_index(
        spark,
        store_path,
        queries,
        k=r_shortlist,
        nprobe=nprobe,
        geometry=geometry,
        allowed=allowed,
    )
    qa = quantize(queries).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qav")
    )
    if vectors_from_store:
        if not has_vector_sidecar(spark, store_path):
            raise ValueError(
                f"ANN store at {store_path} was created without the "
                "IVF-Flat vector sidecar (store_vectors=True) — rerank "
                "needs `corpus` here, or recreate the store with the "
                "sidecar (streaming/annindex.py)"
            )
        cells = [
            int(r.cell) for r in short.select("cell").distinct().collect()
        ]
        vectors = (
            read_vecs(spark, store_path)
            .filter(F.col("cell").isin(cells))
            .select("vec_id", "qv")
        )
    else:
        if corpus is None:
            raise ValueError(
                "ann_rerank_index needs the upstream `corpus` unless "
                "vectors_from_store=True"
            )
        vectors = quantize(corpus)
    rescored = (
        vectors
        .join(F.broadcast(short.select("query_id", "vec_id")), "vec_id")
        .join(F.broadcast(qa), "query_id")
        .select(
            "query_id",
            "vec_id",
            _int_dist2(F.col("qv"), F.col("qav")).alias("exact_dist2"),
        )
    )
    wr = W.partitionBy("query_id").orderBy("exact_dist2", "vec_id")
    return (
        rescored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "vec_id",
            "exact_dist2",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def ann_range_index(
    spark: SparkSession,
    store_path: str,
    queries: DataFrame,
    radius2: int,
    nprobe: int = 2,
    corpus: DataFrame | None = None,
    geometry: dict | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """RANGE search from the store: every indexed vector within
    integer L2 distance² ``radius2`` of each query, among the probed
    cells — the second standard serving shape next to top-k (the
    FAISS ``range_search``-on-IVF semantics): dedup radii, "all
    matches above a similarity floor", recall-oriented candidate
    generation where the CALLER sets the quality bar instead of a
    count.  Top-k under-reports in dense neighborhoods and pads with
    junk in sparse ones; range search returns exactly what qualifies
    (possibly zero rows — an empty neighborhood is an answer).

    Distances are EXACT (quantized-integer L2), not ADC: a radius is
    a promise about the true distance, and PQ reconstruction error
    would make the boundary fuzzy in both directions.  The candidate
    vectors come from the IVF-Flat sidecar when the store has one —
    the probed cells push into the vecs scan as a literal ``cell IN``
    parquet filter plus the bucket-key join (zero store-side
    Exchange), so both the rows retained AND the bytes read are
    ∝ probed cells, ≈ nprobe·√N vectors per query batch under sized
    geometry (r14 verdict #1) — else from ``corpus`` via the
    same-pruned codes store's (cell, vec_id) pairs (one corpus join,
    the no-sidecar fallback).  Pending tombstones and the ``allowed``
    predicate apply at the same pre-scoring seams as top-k.

    Like every IVF query, recall is probe-bounded: a true neighbor
    assigned to an unprobed cell is missed, and the nprobe sweep in
    ``ann_store_recall_curve`` prices that.  Returns
    (query_id, vec_id, cell, exact_dist2) with no rank column — a
    range result is a SET; impose order downstream if wanted."""
    geo = check_ann_geometry(spark, store_path, geometry)
    n_buckets = geo["n_buckets"]
    coarse, _cb = read_codebooks(spark, store_path)
    qbase = quantize(queries)
    # materialized once — feeds the scan-pruning collect AND the join
    probes = _query_probes(
        spark, store_path, qbase, coarse, geo, nprobe
    ).localCheckpoint(eager=True)
    qa = qbase.select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qav")
    )
    tombs = read_tombstones(spark, store_path)
    with shuffle_scoped_to_buckets(spark, n_buckets):
        if has_vector_sidecar(spark, store_path):
            cand = F.broadcast(probes).join(
                _pruned_to_probes(
                    read_vecs(spark, store_path, n_buckets), probes
                ),
                "cell",
            )
        else:
            if corpus is None:
                raise ValueError(
                    "ann_range_index needs the upstream `corpus` when "
                    f"the store at {store_path} has no IVF-Flat vector "
                    "sidecar (create_ann_store(store_vectors=True))"
                )
            pairs = F.broadcast(probes).join(
                _pruned_to_probes(
                    read_codes(spark, store_path, n_buckets), probes
                )
                .select("cell", "vec_id")
                .distinct(),
                "cell",
            )
            cand = pairs.join(quantize(corpus), "vec_id")
        cand = cand.filter(F.col("vec_id") != F.col("query_id"))
        if tombs is not None:
            cand = cand.join(F.broadcast(tombs), "vec_id", "left_anti")
        if allowed is not None:
            cand = cand.join(
                F.broadcast(allowed.select("vec_id").distinct()),
                "vec_id",
                "left_semi",
            )
        out = (
            cand.join(F.broadcast(qa), "query_id")
            .select(
                "query_id",
                "vec_id",
                F.col("cell").cast("long").alias("cell"),
                _int_dist2(F.col("qv"), F.col("qav")).alias("exact_dist2"),
            )
            .filter(F.col("exact_dist2") <= F.lit(int(radius2)))
            .localCheckpoint(eager=True)
        )
    return out


def to_ann_ingest_sink(
    vectors: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_every: int | None = None,
    compact_files_per_bucket: int | None = DEFAULTS.compact_files_per_bucket,
):
    """Streaming form: fold each micro-batch through
    :func:`ann_ingest_batch`, skipping replayed epochs via
    ``_applied_epochs`` markers (the to_rollup_store_sink idiom).
    Geometry (incl. the stores' bucket width) comes from the sidecar
    written at :func:`create_ann_store` — the stream carries no
    geometry of its own.  Compaction cadence is ADAPTIVE by default
    (r12 verdict #6): when any codes bucket exceeds
    ``compact_files_per_bucket`` data files, both stores compact
    between folds; ``compact_every=k`` remains as an explicit fixed
    cadence (either trigger fires)."""
    from kafkastreamsproject_spark.operators.fs import (
        hadoop_exists,
        hadoop_touch,
    )
    from kafkastreamsproject_spark.sources.bucketed import (
        max_files_per_bucket,
    )

    markers = f"{store_path}/_applied_epochs"
    applied = {"n": 0}

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        marker = f"{markers}/{epoch_id}.done"
        if hadoop_exists(spark, marker):
            return
        ann_ingest_batch(batch_df, store_path)
        hadoop_touch(spark, marker)
        applied["n"] += 1
        if (compact_every and applied["n"] % compact_every == 0) or (
            compact_files_per_bucket
            and max_files_per_bucket(spark, _codes_path(store_path))
            > compact_files_per_bucket
        ):
            compact_codes(spark, store_path)

    return (
        vectors.writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def rebuild_ann_store(
    spark: SparkSession,
    corpus: DataFrame,
    vec_ids: DataFrame,
    new_store_path: str,
    c_cells: int | None = None,
    k_codes: int = K_CODES,
    m_subspaces: int = M_SUBSPACES,
    n_buckets: int | None = None,
    store_vectors: bool = False,
) -> dict:
    """FULL GDPR erasure for the vector index: retrain the codebooks
    on the survivors and build a fresh store under
    ``new_store_path`` — the rebuild path
    :func:`forget_vectors_in_index`'s codebook-residue guard points
    at.  In-place erasure removes a victim's code rows and ledger row
    but cannot touch the codebook snapshot (the training vectors'
    quantized embeddings persist there VERBATIM); this path can,
    because the new codebooks train on ``corpus`` MINUS ``vec_ids``
    (deterministic first-C/first-K survivors by vec_id) — no victim
    byte reaches the new directory.

    ``corpus`` is the upstream embedding source (vec_id, embedding):
    the store holds only quantized codes, so a codebook retrain needs
    the vectors back — the standard versioned-rebuild deployment
    (build under a new version dir, swap readers, drop the old dir).
    Geometry defaults to :func:`sized_geometry` of the survivor
    count.  Returns {"survivors": n, "geometry": geo}.  Verified
    oracle-exact against a survivors-only batch recompute by
    ``plans/ingest.py:ann_forget_rebuild``."""
    survivors = corpus.join(
        F.broadcast(vec_ids.select("vec_id").distinct()),
        "vec_id",
        "left_anti",
    )
    n = survivors.count()
    if c_cells is None or n_buckets is None:
        sized = sized_geometry(n, m_subspaces=m_subspaces, k_codes=k_codes)
        c_cells = c_cells if c_cells is not None else sized["c_cells"]
        n_buckets = n_buckets if n_buckets is not None else sized["n_buckets"]
    geo = create_ann_store(
        spark,
        new_store_path,
        survivors,
        c_cells=c_cells,
        k_codes=k_codes,
        m_subspaces=m_subspaces,
        n_buckets=n_buckets,
        store_vectors=store_vectors,
    )
    ann_ingest_batch(survivors, new_store_path)
    return {"survivors": n, "geometry": geo}


def forget_vectors_in_index(
    spark: SparkSession,
    vec_ids: DataFrame,
    store_path: str,
    allow_codebook_residue: bool = False,
) -> dict:
    """Erase ``vec_ids`` (one column, ``vec_id``) from the index — the
    bm25index erasure contract applied to the vector side: the
    victims' code rows leave the cell-bucketed store via a
    bucket-local (cell, vec_id) row-level forget (each vector lives in
    exactly ONE cell, so the rewrite touches at most |victims| buckets
    — tighter than the text case), and their ledger rows via the
    key-level forget.  Codes first, ledger last; replay is a no-op;
    erased ids are re-indexable.  Returns per-store deletion counts
    plus ``codebook_residue`` (see below).

    **Codebook retention caveat (r12 ADVICE):** the codebook snapshot
    stores the TRAINING vectors' quantized embeddings VERBATIM — the
    first-C coarse centroids and first-K PQ rows ARE those vectors.
    Erasing a training vec_id removes it from search results (codes +
    ledger), but its embedding remains recoverable from codebooks/ —
    this function is NOT full GDPR erasure for codebook-training
    members.  It therefore RAISES when the victims intersect the
    codebook training ids, unless ``allow_codebook_residue=True``
    acknowledges the retention (the count comes back as
    ``codebook_residue``).  Full erasure of a training member requires
    retraining the codebooks on survivors and rebuilding the store
    under a new version directory (the module-docstring rebuild
    path)."""
    from kafkastreamsproject_spark.sources.bucketed import (
        forget_keys_in_store,
        forget_rows_in_store,
    )

    geo = ann_geometry(spark, store_path)
    n_buckets = geo["n_buckets"]
    victims = vec_ids.select("vec_id").distinct().localCheckpoint(eager=True)

    coarse, cb = read_codebooks(spark, store_path)
    train_ids = (
        coarse.select(F.col("ccid").cast("long").alias("vec_id"))
        .union(cb.select(F.col("cid").cast("long").alias("vec_id")))
        .distinct()
    )
    n_residue = victims.join(
        F.broadcast(train_ids), "vec_id", "left_semi"
    ).count()
    if n_residue and not allow_codebook_residue:
        raise ValueError(
            f"{n_residue} victim vec_id(s) are codebook TRAINING vectors "
            f"(the first c_cells={geo['c_cells']} / k_codes="
            f"{geo['k_codes']} ids): their quantized embeddings persist "
            "verbatim in codebooks/ after this erasure.  Pass "
            "allow_codebook_residue=True to acknowledge the retention, "
            "or retrain + rebuild the store for full erasure "
            "(streaming/annindex.py docstring)"
        )

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
        "codebook_residue": n_residue,
    }
    if has_vector_sidecar(spark, store_path):
        # the sidecar holds the victims' quantized embeddings VERBATIM
        # — erasing codes+ledger but not these rows would be the exact
        # retention this function exists to prevent; same bucket-local
        # (cell, vec_id) rewrite, same |victims|-bucket bound
        v_path = _vecs_path(store_path)
        out["vecs"] = forget_rows_in_store(
            spark, victim_keys, v_path,
            store_table_name("ann_vecs", v_path),
            _VECS_SCHEMA, ["cell"], n_buckets,
            match_cols=["cell", "vec_id"],
        )
    return out


def upsert_vectors_in_index(
    spark: SparkSession,
    vectors: DataFrame,
    store_path: str,
    geometry: dict | None = None,
    allow_codebook_residue: bool = False,
) -> dict:
    """REINDEX arriving vectors — the re-embedding/CDC shape the
    first-writer-wins fold deliberately excludes (a model refresh
    re-embeds existing ids; raw :func:`ann_ingest_batch` would drop
    every one of them as already-seen).  The arriving vec_ids'
    existing codes/sidecar/ledger rows leave via
    :func:`forget_vectors_in_index` (a no-op for new ids), then the
    batch folds as fresh under the store's FROZEN codebooks.

    The codebook-residue guard applies: re-embedding a TRAINING
    member cannot update the codebook snapshot (its old embedding
    persists there verbatim) — that raises unless acknowledged, and
    the true fix is a retrain (:func:`rebuild_and_publish_ann_store`,
    which a bulk re-embedding should prefer anyway: new model ⇒ new
    distribution ⇒ the drift gauge climbs — see
    :func:`codebook_drift`).  Crash window and convergence exactly as
    the bm25 twin (`streaming/bm25index.py:upsert_docs_in_index`).
    Returns the forget counts plus the fold counts.

    RAISES when any arriving vec_id has a PENDING tombstone (r14
    ADVICE): silently proceeding would lose the update — the forget
    removes the seen row, the re-folded rows are anti-joined out of
    every query by the pending set, and the next
    :func:`apply_tombstones` physically deletes the NEW rows.  Run
    apply_tombstones first (delete wins, then the upsert re-creates
    the vector), the module's delete-then-reinsert ordering."""
    ids = vectors.select("vec_id").distinct().localCheckpoint(eager=True)
    pending = read_tombstones(spark, store_path)
    if pending is not None:
        n_pending = ids.join(F.broadcast(pending), "vec_id", "left_semi").count()
        if n_pending:
            raise ValueError(
                f"{n_pending} arriving vec_id(s) have PENDING tombstones "
                f"at {store_path} — upserting them now would be silently "
                "swallowed by the pending set and the next apply.  Run "
                "apply_tombstones first, then retry the upsert "
                "(streaming/annindex.py:upsert_vectors_in_index)"
            )
    out = {
        "forgotten": forget_vectors_in_index(
            spark, ids, store_path,
            allow_codebook_residue=allow_codebook_residue,
        )
    }
    out.update(ann_ingest_batch(vectors, store_path, geometry))
    return out


def rebuild_and_publish_ann_store(
    spark: SparkSession,
    corpus: DataFrame,
    vec_ids: DataFrame,
    base_path: str,
    **rebuild_kwargs,
) -> dict:
    """The versioned-rebuild deployment as CODE, not narrative:
    retrain + rebuild under ``base_path/v{n+1}``
    (:func:`rebuild_ann_store` — full GDPR erasure including codebook
    bytes), then atomically repoint ``base_path``'s readers at it
    (``publish_store_version`` — one tiny pointer write, the commit
    point).  A crash anywhere before the publish leaves the previous
    version serving, complete and untouched; readers resolve
    ``resolve_store_version(spark, base_path)`` and never see a
    half-built store.  Old versions stay on disk as rollback targets
    until ``retire_store_versions`` drops them.

    Version names are ``v0001, v0002, …`` (sortable, deterministic:
    1 + the highest existing ``v``-number).  Returns the rebuild
    record plus {"version": name}."""
    from kafkastreamsproject_spark.operators.fs import _fs_and_path
    from kafkastreamsproject_spark.sources.bucketed import (
        publish_store_version,
    )

    fs, hbase = _fs_and_path(spark, base_path)
    highest = 0
    if fs.exists(hbase):
        for st in fs.listStatus(hbase):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("v") and name[1:].isdigit():
                highest = max(highest, int(name[1:]))
    version = f"v{highest + 1:04d}"
    out = rebuild_ann_store(
        spark, corpus, vec_ids, f"{base_path}/{version}", **rebuild_kwargs
    )
    publish_store_version(spark, base_path, version)
    out["version"] = version
    return out


# ---------------------------------------------------------------------------
# Tombstone tier (r14): O(1) logical delete, physical at compaction
# ---------------------------------------------------------------------------

_TOMB_SCHEMA = "vec_id long"


def _tomb_path(store_path: str) -> str:
    return f"{store_path}/tombstones"


def read_tombstones(
    spark: SparkSession, store_path: str
) -> DataFrame | None:
    """The store's PENDING logical deletes as a one-column
    (``vec_id``) DataFrame, or ``None`` when nothing is pending.
    Replayed tombstone appends leave duplicate rows in the files; the
    read de-duplicates, so the set is idempotent under crash-replay
    by construction."""
    from kafkastreamsproject_spark.operators.fs import hadoop_has_files

    path = _tomb_path(store_path)
    if not hadoop_has_files(spark, path):
        return None
    return (
        spark.read.schema(_TOMB_SCHEMA).parquet(path)
        .select("vec_id")
        .distinct()
    )


def tombstone_vectors_in_index(
    spark: SparkSession, vec_ids: DataFrame, store_path: str
) -> dict:
    """LOGICAL delete: append ``vec_ids`` (one column, ``vec_id``) to
    the store's pending-tombstone set — one tiny parquet append,
    O(|victims|) regardless of store size, no bucket rewrite.  From
    the next query on, :func:`ann_query_index` (and everything built
    on it: rerank, filtered search, hybrid fusion) anti-joins the
    pending set out of its candidates BEFORE any ADC work, so the
    deleted vectors are unrankable, not merely hidden — the top-k
    fills from survivors (pytest-pinned against post-filtering, which
    silently under-fills k).

    This is the delete tier between "do nothing" and the two physical
    paths: :func:`forget_vectors_in_index` (bucket-local rewrite, for
    when bytes must leave NOW) and :func:`rebuild_ann_store` (codebook
    retrain, for training-member victims).  Deployments batch deletes
    here and let :func:`apply_tombstones` make them physical on the
    compaction cadence.  Until then the victim's ``seen`` row remains,
    so re-ingest of a tombstoned id stays blocked (first-writer-wins)
    — a delete-then-reinsert cycle completes only after apply, which
    is the unambiguous ordering (the reinserted vector can never race
    the pending delete that would silently swallow it).

    Scale bound: the pending set is broadcast at query time, so it
    must stay driver-boundable — deletes between compactions are a
    vanishing fraction of any real corpus, and ``pending`` in the
    return value is the gauge; apply when it grows past broadcast
    comfort (~10⁷ ids).  Returns {"tombstoned": n, "pending": total}.
    """
    check_ann_geometry(spark, store_path, None)  # store must exist
    victims = (
        vec_ids.select(F.col("vec_id").cast("long").alias("vec_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = victims.count()
    if n:
        victims.coalesce(1).write.mode("append").parquet(
            _tomb_path(store_path)
        )
    pending = read_tombstones(spark, store_path)
    return {
        "tombstoned": n,
        "pending": pending.count() if pending is not None else 0,
    }


def apply_tombstones(
    spark: SparkSession,
    store_path: str,
    allow_codebook_residue: bool = False,
) -> dict:
    """Make the pending logical deletes PHYSICAL and clear the set —
    the log-cleaning half of the tombstone model, run on the
    compaction cadence (or explicitly, for GDPR deadlines).

    Delegates the rewrite to :func:`forget_vectors_in_index` — same
    bucket-local (cell, vec_id) codes/vecs rewrite, same ledger
    forget, same codebook-residue guard (a pending training-member
    delete RAISES here unless ``allow_codebook_residue=True``; the
    full fix is :func:`rebuild_ann_store`, after which the old
    store's tombstones are moot).  The tombstone files are removed
    LAST, as the commit point: a crash after the rewrite but before
    the clear replays the forget as a no-op and clears on the retry —
    queries are correct throughout, since pending ids are excluded
    whether or not their bytes are gone.  After apply, the erased ids
    are re-ingestable (their ``seen`` rows left with the rewrite).

    Returns the forget counts plus {"applied": n}; {"applied": 0}
    when nothing was pending."""
    from kafkastreamsproject_spark.operators.fs import _fs_and_path

    tombs = read_tombstones(spark, store_path)
    if tombs is None:
        return {"applied": 0}
    victims = tombs.localCheckpoint(eager=True)
    n = victims.count()
    out = forget_vectors_in_index(
        spark,
        victims,
        store_path,
        allow_codebook_residue=allow_codebook_residue,
    )
    fs, hpath = _fs_and_path(spark, _tomb_path(store_path))
    fs.delete(hpath, True)
    out["applied"] = n
    return out
