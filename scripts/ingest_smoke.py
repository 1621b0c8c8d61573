#!/usr/bin/env python
"""Scale-smoke for streaming near-dup ingest: per-batch cost vs store size.

The design claim (streaming/neardup.py): the store-probe is an
equi-join on LSH bands, so per-batch work scales with signature
COLLISIONS, never with |store| × |batch|.  Measured here by folding K
successive batches of salted documents (per-word replica salt →
cross-batch shingle sets are disjoint → zero true collisions) into one
growing store and recording each fold's wall time.  A flat curve means
the probe really is collision-bound; linear growth would mean the
store side is being rescanned per batch pair-wise.

Manual diagnostic; appends one {"kind": "ingest_smoke", ...} line to
PROGRESS.jsonl.

Usage: python scripts/ingest_smoke.py [K]    # default 8 batches
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kafkastreamsproject_spark.session import get_spark
from kafkastreamsproject_spark.sources.testdata import load_table
from kafkastreamsproject_spark.streaming.neardup import ingest_batch


def _salted_batch(docs, i: int):
    """Replica i of the documents table: per-word salt makes its shingle
    sets disjoint from every other replica's (zero true near-dups
    across batches), ids shifted so the store keys stay unique."""
    salted = F.array_join(
        F.transform(
            F.split(F.trim(F.col("text")), " +"),
            lambda w: F.concat(w, F.lit(str(i))),
        ),
        " ",
    )
    return docs.select(
        (F.col("doc_id") + i * 100_000_000).alias("doc_id"),
        salted.alias("text"),
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="ingest-smoke")
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    n_docs = docs.count()

    store = tempfile.mkdtemp(prefix="ingest_smoke_store_")
    walls: list[float] = []
    accepted_total = 0
    try:
        for i in range(k):
            batch = _salted_batch(docs, i)
            t0 = time.perf_counter()
            matches, accepted = ingest_batch(batch, store)
            n_acc = accepted.count()
            wall = time.perf_counter() - t0
            walls.append(round(wall, 2))
            accepted_total += n_acc
            print(
                f"  batch {i}: store={i * n_acc:,} sigs before, "
                f"accepted {n_acc:,}, matches {matches.count():,}, "
                f"{wall:.2f}s",
                flush=True,
            )
    finally:
        shutil.rmtree(store, ignore_errors=True)

    record = {
        "kind": "ingest_smoke",
        "ts": time.time(),
        "batches": k,
        "docs_per_batch": n_docs,
        "store_sigs_final": accepted_total,
        "batch_walls_s": walls,
        # last-batch cost over second-batch cost (batch 0 pays JVM+plan
        # warmup): flat ≈ 1.0 means probe cost is collision-bound, not
        # store-size-bound
        "wall_last_over_second": round(walls[-1] / max(walls[1], 1e-9), 2),
    }
    print(json.dumps(record))
    with open(Path(__file__).resolve().parent.parent / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
