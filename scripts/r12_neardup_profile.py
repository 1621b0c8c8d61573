#!/usr/bin/env python
"""Attribute the funnel's neardup_dedup stage wall (51% of the 100×
funnel run, smokes/r12.json) to its components: signature
materialization, band self-join + candidate distinct, Jaccard confirm,
connected components, and the anti-join + checkpoint.  Run on a quiet
box; N picks the corpus multiple (default 20× = 100k docs for
iteration, 100× to confirm).

Manual diagnostic — not part of the test suite.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

from kafkastreamsproject_spark.functions.clustering import connected_components
from kafkastreamsproject_spark.operators.cache import (
    cache_scope,
    release_persisted,
    scoped_persist,
)
from kafkastreamsproject_spark.session import get_spark
from kafkastreamsproject_spark.streaming.neardup import (
    _confirmed_pairs,
    doc_signatures,
)

from r12_scale_smoke import SF_DIR, _funnel_corpus

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def main() -> None:
    spark = get_spark(app_name="r12-neardup-profile")
    docs = _funnel_corpus(spark, SF_DIR, N).localCheckpoint(eager=True)
    n = docs.count()
    print(f"corpus: {n} docs ({N}x)", flush=True)

    walls: dict[str, float] = {}

    def mark(stage: str, t0: float) -> float:
        now = time.perf_counter()
        walls[stage] = round(now - t0, 2)
        print(f"  {stage}: {walls[stage]}s", flush=True)
        return now

    with cache_scope():
        t0 = time.perf_counter()
        sigs = scoped_persist(doc_signatures(docs))
        n_sigs = sigs.count()
        t0 = mark("signatures_materialize", t0)

        pairs = _confirmed_pairs(sigs, sigs, within_batch=True).select(
            F.col("matched_doc_id").alias("id_a"),
            F.col("new_doc_id").alias("id_b"),
        )
        pairs = scoped_persist(pairs)
        n_pairs = pairs.count()
        t0 = mark("band_join_and_confirm", t0)

        clusters = connected_components(pairs)
        losers = clusters.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        n_losers = losers.count()
        t0 = mark("connected_components", t0)

        neardup = docs.join(losers, "doc_id", "left_anti")
        neardup = neardup.localCheckpoint(eager=True)
        n_out = neardup.count()
        t0 = mark("anti_join_checkpoint", t0)

    release_persisted()
    total = sum(walls.values())
    print(
        f"sigs={n_sigs} pairs={n_pairs} losers={n_losers} out={n_out}",
        flush=True,
    )
    print(f"total {round(total, 2)}s; shares:", flush=True)
    for k, v in sorted(walls.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {round(100 * v / total)}%", flush=True)


if __name__ == "__main__":
    main()
