#!/usr/bin/env python
"""Scale smoke for the round-12 additions: priority_sample_topk and
the mergeable-HLL distinct-sketch family, each at sf0.01 vs sf0.1
(10x data) with a discarded warm-up pass so the ratio is signal, not
JVM warm-up (VERDICT r11 "what's wrong" #2).  Also folds the sketch
store over a 10x batch series to show per-epoch cost is flat as the
store grows (the whole point of a KB-sized snapshot state).

Results merge into smokes/r12.json under ``new_ops``.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kafkastreamsproject_spark.plans.registry import shadow_queries
from kafkastreamsproject_spark.session import get_spark
from kafkastreamsproject_spark.streaming.distinctsketch import (
    sketch_ingest_batch,
)

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


def _wall(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def query_leg(spark, name: str) -> dict:
    spec = shadow_queries()[name]
    _wall(lambda: spec.spark(spark, SF_SMALL).count())  # warm-up, discarded
    small = _wall(lambda: spec.spark(spark, SF_SMALL).count())
    big = _wall(lambda: spec.spark(spark, SF_BIG).count())
    return {"sf001_s": small, "sf01_s": big, "ratio_10x": round(big / small, 2)}


def sketch_fold_leg(spark) -> dict:
    """Per-epoch sketch-fold wall as the covered corpus grows 10x:
    epoch k folds an equal-sized slice; flat walls = store-size
    independence (the snapshot is KB regardless of history)."""

    def rows(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 8).cast("string").alias("g"),
            (F.col("id") / 3).cast("long").alias("k"),
        )

    n = 2_000_000  # per-epoch slice
    with tempfile.TemporaryDirectory(prefix="r12_sketch_") as td:
        sketch_ingest_batch(rows(0, n), td + "/warm", 0, "g", "k")  # warm-up
        walls = []
        for e in range(10):
            est = None

            def fold(e=e):
                nonlocal est
                est = sketch_ingest_batch(
                    rows(e * n, (e + 1) * n), td + "/s", e, "g", "k"
                ).collect()

            walls.append(_wall(fold))
        total_est = sum(r.n_distinct_est for r in est)
    return {
        "epoch_rows": n,
        "epoch_walls_s": walls,
        "wall_ratio_last_vs_first": round(walls[-1] / walls[0], 2),
        "final_total_estimate": int(total_est),
    }


def bm25_fold_leg(spark) -> dict:
    """Per-epoch BM25 index-fold wall as the indexed corpus grows 10x
    (20k docs x ~50 tokens per epoch): flat walls = ingest cost is
    batch-proportional (the seen probe is bucket-local and postings
    are pure append); plus the query wall after 1 vs 10 epochs."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.bm25index import (
        index_ingest_batch,
        query_index,
    )

    def docs(lo, hi):
        body = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(50)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.hash(F.col("id") * 53 + i), F.lit(997)),
                ),
            ),
        )
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"), body.alias("text")
        )

    n = 20_000
    terms = ("w1", "w2", "w3")
    td = tempfile.mkdtemp(prefix="r12_bm25_")
    store = td + "/s"
    try:
        from kafkastreamsproject_spark.streaming.bm25index import (
            compact_postings,
        )

        index_ingest_batch(docs(0, 2000), td + "/warm")  # warm-up
        walls = []
        q_after_1 = None
        for e in range(10):
            t0 = time.perf_counter()
            index_ingest_batch(docs(e * n, (e + 1) * n), store)
            walls.append(round(time.perf_counter() - t0, 2))
            if e == 0:
                q_after_1 = _wall(
                    lambda: query_index(spark, store, terms).count()
                )
            # the production cadence (compact_every=3): without it the
            # fold wall climbs with the append-log file count
            # (measured 3.3 -> 8.3 s over 10 epochs); with it the
            # series is flat
            if (e + 1) % 3 == 0:
                compact_postings(spark, store)
        q_after_10 = _wall(lambda: query_index(spark, store, terms).count())
        n_hits = query_index(spark, store, terms).count()
    finally:
        for prefix, sub in [
            ("bm25_postings", "postings"), ("bm25_seen", "seen"),
        ]:
            for root in (store, td + "/warm"):
                spark.sql(
                    "DROP TABLE IF EXISTS "
                    + store_table_name(prefix, f"{root}/{sub}")
                )
        import shutil

        shutil.rmtree(td, ignore_errors=True)
    return {
        "epoch_docs": n,
        "epoch_walls_s": walls,
        "fold_wall_ratio_last_vs_first": round(walls[-1] / walls[0], 2),
        "query_after_1_epoch_s": q_after_1,
        "query_after_10_epochs_s": q_after_10,
        "query_matched_docs": n_hits,
    }


def ann_fold_leg(spark) -> dict:
    """Per-epoch IVF-PQ index-fold wall as the indexed corpus grows
    10x (50k synthetic vectors, dim 16, per epoch): flat walls =
    ingest cost is batch-proportional; plus the 10-query wall after
    1 vs 10 epochs (candidates grow ~10x — nprobe/C of the corpus —
    so the query wall may grow with REAL work, reported honestly)."""
    from kafkastreamsproject_spark.sources.bucketed import store_table_name
    from kafkastreamsproject_spark.streaming.annindex import (
        ann_ingest_batch,
        ann_query_index,
        compact_codes,
        create_ann_store,
    )

    def emb(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda i: (
                    F.pmod(F.hash(F.col("id") * 31 + i), F.lit(1000))
                    / 1000.0
                ).cast("float"),
            ).alias("embedding"),
        )

    n = 50_000
    td = tempfile.mkdtemp(prefix="r12_ann_")
    store = td + "/s"
    try:
        create_ann_store(spark, td + "/warm", emb(0, 5000))
        ann_ingest_batch(emb(0, 5000), td + "/warm")  # warm-up
        create_ann_store(spark, store, emb(0, n))
        walls = []
        q_after_1 = None
        for e in range(10):
            t0 = time.perf_counter()
            ann_ingest_batch(emb(e * n, (e + 1) * n), store)
            walls.append(round(time.perf_counter() - t0, 2))
            if e == 0:
                q_after_1 = _wall(
                    lambda: ann_query_index(
                        spark, store, emb(0, 10)
                    ).count()
                )
            if (e + 1) % 3 == 0:
                compact_codes(spark, store)
        q_after_10 = _wall(
            lambda: ann_query_index(spark, store, emb(0, 10)).count()
        )
    finally:
        for prefix, sub in [("ann_codes", "codes"), ("ann_seen", "seen")]:
            for root in (store, td + "/warm"):
                spark.sql(
                    "DROP TABLE IF EXISTS "
                    + store_table_name(prefix, f"{root}/{sub}")
                )
        import shutil

        shutil.rmtree(td, ignore_errors=True)
    return {
        "epoch_vectors": n,
        "epoch_walls_s": walls,
        "fold_wall_ratio_last_vs_first": round(walls[-1] / walls[0], 2),
        "query_after_1_epoch_s": q_after_1,
        "query_after_10_epochs_s": q_after_10,
    }


def main() -> None:
    spark = get_spark(app_name="r12-newops-smoke")
    out = {
        "warmup": "per-leg discarded warm-up pass (same query, small SF)",
        "priority_sample_topk": query_leg(spark, "priority_sample_topk"),
        "sketch_distinct_trigrams_by_source": query_leg(
            spark, "sketch_distinct_trigrams_by_source"
        ),
        "sketch_store_fold_flatness": sketch_fold_leg(spark),
        "bm25_index_fold_flatness": bm25_fold_leg(spark),
        "ann_index_fold_flatness": ann_fold_leg(spark),
    }
    print(json.dumps(out, indent=2), flush=True)
    repo = Path(__file__).resolve().parent.parent
    target = repo / "smokes" / "r12.json"
    existing = json.loads(target.read_text())
    existing["new_ops"] = out
    target.write_text(json.dumps(existing, indent=2) + "\n")


if __name__ == "__main__":
    main()
