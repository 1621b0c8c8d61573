#!/usr/bin/env python
"""Delete-tier pricing smoke (r14): tombstone vs forget vs rebuild.

The ANN store now has three delete tiers, each claiming a cost class:

- ``tombstone_vectors_in_index`` — O(|victims|) logical delete: one
  tiny parquet append, victims invisible from the next query via a
  pre-ADC broadcast anti-join.
- ``forget_vectors_in_index`` / ``apply_tombstones`` — the physical
  bucket-local rewrite: cost ∝ the victims' cells' buckets.
- ``rebuild_ann_store`` — codebook retrain + full re-index: cost ∝
  the surviving corpus (the only tier that erases training members'
  codebook bytes).

This smoke prices all three on one 48k-vector sized-geometry store
(C = 219, vector sidecar ON so the physical tiers pay the full
two-store rewrite) with ~500 victims each, plus the query-side rent of
a pending set (64-query wall with and without pending tombstones).
Verdict fields: the three walls, their ratios, the pending-query
overhead ratio, and ``ordering_holds`` = tombstone < forget < rebuild.
Results merge into ``smokes/r14.json`` under ``delete_tiers``.
Manual diagnostic — not part of the suite.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from kafkastreamsproject_spark.session import get_spark  # noqa: E402
from kafkastreamsproject_spark.sources.bucketed import (  # noqa: E402
    store_table_name,
)
from kafkastreamsproject_spark.streaming import annindex as AX  # noqa: E402

TOTAL = 48_000
FOLDS = 4
N_VICTIMS = 500
N_QUERIES = 64


def emb(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: (
                F.pmod(F.hash(F.col("id") * 31 + i), F.lit(1000)) / 1000.0
            ).cast("float"),
        ).alias("embedding"),
    )


def victims(spark, salt: int):
    # spread across cells, clear of the codebook training prefix
    # (sized C=219 trains on vec_id < 219)
    return (
        spark.range(TOTAL)
        .filter((F.col("id") % 97 == salt) & (F.col("id") >= 1000))
        .limit(N_VICTIMS)
        .select(F.col("id").alias("vec_id"))
    )


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 2), out


def main() -> None:
    spark = get_spark(app_name="r14-delete-tiers-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    td = tempfile.mkdtemp(prefix="r14_delete_tiers_")
    store = f"{td}/store"
    corpus = emb(spark, 0, TOTAL)
    AX.create_ann_store(spark, store, corpus, store_vectors=True)
    per = TOTAL // FOLDS
    for e in range(FOLDS):
        AX.ann_ingest_batch(emb(spark, e * per, (e + 1) * per), store)
    AX.compact_codes(spark, store)

    q = emb(spark, 0, N_QUERIES)
    # warm-up + clean-query baseline (min of 2: JIT noise)
    t_q1, _ = timed(lambda: AX.ann_query_index(spark, store, q, k=10).count())
    t_q2, _ = timed(lambda: AX.ann_query_index(spark, store, q, k=10).count())
    t_query_clean = min(t_q1, t_q2)

    v1 = victims(spark, 3).localCheckpoint(eager=True)
    n1 = v1.count()
    t_tombstone, rec = timed(
        lambda: AX.tombstone_vectors_in_index(spark, v1, store)
    )
    assert rec["tombstoned"] == n1, rec

    t_qp1, _ = timed(lambda: AX.ann_query_index(spark, store, q, k=10).count())
    t_qp2, _ = timed(lambda: AX.ann_query_index(spark, store, q, k=10).count())
    t_query_pending = min(t_qp1, t_qp2)

    t_apply, rec = timed(lambda: AX.apply_tombstones(spark, store))
    assert rec["applied"] == n1, rec

    v2 = victims(spark, 7).localCheckpoint(eager=True)
    n2 = v2.count()
    t_forget, rec = timed(
        lambda: AX.forget_vectors_in_index(spark, v2, store)
    )
    assert rec["codes"]["rows_deleted"] == n2 * 4, rec

    survivors = corpus.join(
        v1.unionByName(v2), "vec_id", "left_anti"
    )
    t_rebuild, rec = timed(
        lambda: AX.rebuild_ann_store(
            spark, corpus, v1.unionByName(v2), f"{td}/rebuilt",
            store_vectors=True,
        )
    )
    assert rec["survivors"] == TOTAL - n1 - n2, rec
    _ = survivors  # documented above; rebuild derives its own

    for prefix, sub in (
        ("ann_codes", "codes"), ("ann_seen", "seen"), ("ann_vecs", "vecs"),
    ):
        for s in (store, f"{td}/rebuilt"):
            spark.sql(
                "DROP TABLE IF EXISTS "
                + store_table_name(prefix, f"{s}/{sub}")
            )
    shutil.rmtree(td, ignore_errors=True)

    record = {
        "kind": "r14_delete_tiers_same_jvm",
        "corpus": TOTAL,
        "victims_per_tier": [n1, n2],
        "geometry": AX.sized_geometry(TOTAL),
        "walls_s": {
            "tombstone": t_tombstone,
            "apply_tombstones": t_apply,
            "forget_direct": t_forget,
            "rebuild": t_rebuild,
            "query_clean": t_query_clean,
            "query_with_pending": t_query_pending,
        },
        "forget_over_tombstone": round(t_forget / t_tombstone, 1),
        "rebuild_over_tombstone": round(t_rebuild / t_tombstone, 1),
        "pending_query_overhead": round(
            t_query_pending / t_query_clean, 2
        ),
        "ordering_holds": t_tombstone < t_forget < t_rebuild,
    }
    smokes = ROOT / "smokes" / "r14.json"
    existing = json.loads(smokes.read_text()) if smokes.exists() else {}
    existing["delete_tiers"] = record
    smokes.write_text(json.dumps(existing, indent=1))
    print(json.dumps(record), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
