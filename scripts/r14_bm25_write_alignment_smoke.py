#!/usr/bin/env python
"""Cross-species check of the r14 bucketed-write alignment (the ANN
ingest-slope smoke found Spark's bucketed write emitting one file per
bucket PER TASK; ``append_bucketed_store`` now repartitions onto the
bucket key first).  The fix lives in ``sources/bucketed.py``, so every
store species inherits it — this smoke demonstrates it on the SECOND
species, the BM25 inverted index, by folding 12 constant-size batches
(4k synthetic docs each) two ways in one JVM:

- ``aligned``   — the shipping writer;
- ``unaligned`` — a local replica of the pre-r14 writer (no
  repartition), monkeypatched into the bm25index module, reproducing
  the write amplification.

Reported per leg: per-epoch fold walls and the hottest postings/seen
bucket's data-file count.  Expected: the unaligned legs' file counts
grow ∝ epochs×tasks and walls climb; the aligned legs' file counts
grow ∝ epochs and walls stay flat.  Results merge into
``smokes/r14.json``.  Manual diagnostic — not part of the suite.
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
from kafkastreamsproject_spark.sources import bucketed as BK  # noqa: E402
from kafkastreamsproject_spark.sources.bucketed import (  # noqa: E402
    max_files_per_bucket,
    store_table_name,
)
from kafkastreamsproject_spark.streaming import bm25index as BX  # noqa: E402

EPOCHS = 12
PER_EPOCH = 4_000


def docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.hash(F.col("id") * 17 + i), F.lit(5000)),
                ),
            ),
        ).alias("text"),
    )


def unaligned_append(spark, df, path, table_name, bucket_cols, n_buckets):
    """The pre-r14 writer, verbatim minus the repartition."""
    from kafkastreamsproject_spark.operators.fs import hadoop_has_files

    if hadoop_has_files(spark, path):
        BK.check_store_meta(spark, path, bucket_cols, n_buckets)
    writer = (
        df.write.mode("append")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if not spark.catalog.tableExists(table_name):
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
    BK.write_store_meta(spark, path, bucket_cols, n_buckets)


def run_leg(spark, td: str, tag: str, aligned: bool) -> dict:
    BX.append_bucketed_store = (
        BK.append_bucketed_store if aligned else unaligned_append
    )
    store = f"{td}/{tag}"
    walls, files_post, files_seen = [], [], []
    for e in range(EPOCHS):
        t0 = time.perf_counter()
        BX.index_ingest_batch(
            docs(spark, e * PER_EPOCH, (e + 1) * PER_EPOCH), store
        )
        walls.append(round(time.perf_counter() - t0, 2))
        files_post.append(max_files_per_bucket(spark, f"{store}/postings"))
        files_seen.append(max_files_per_bucket(spark, f"{store}/seen"))
    for prefix, sub in (("bm25_postings", "postings"), ("bm25_seen", "seen")):
        spark.sql(
            "DROP TABLE IF EXISTS "
            + store_table_name(prefix, f"{store}/{sub}")
        )
    return {
        "fold_walls_s": walls,
        "max_files_per_bucket_postings": files_post,
        "max_files_per_bucket_seen": files_seen,
    }


def main() -> None:
    spark = get_spark(app_name="r14-bm25-write-alignment-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    td = tempfile.mkdtemp(prefix="r14_bm25_align_")
    original = BX.append_bucketed_store
    try:
        run_leg(spark, td, "warm", aligned=True)  # discarded warm-up
        legs = {}
        for tag, aligned in (("unaligned", False), ("aligned", True)):
            legs[tag] = run_leg(spark, td, tag, aligned)
            print(tag, json.dumps(legs[tag]), flush=True)
    finally:
        BX.append_bucketed_store = original

    un, al = legs["unaligned"]["fold_walls_s"], legs["aligned"]["fold_walls_s"]
    record = {
        "kind": "r14_bm25_write_alignment_same_jvm",
        "epochs": EPOCHS,
        "docs_per_epoch": PER_EPOCH,
        "legs": legs,
        "unaligned_last3_mean_s": round(sum(un[-3:]) / 3, 2),
        "aligned_last3_mean_s": round(sum(al[-3:]) / 3, 2),
        "aligned_files_grow_with_epochs_only": (
            legs["aligned"]["max_files_per_bucket_postings"][-1] <= EPOCHS
            and legs["aligned"]["max_files_per_bucket_seen"][-1] <= EPOCHS
        ),
    }
    shutil.rmtree(td, ignore_errors=True)
    smokes = ROOT / "smokes" / "r14.json"
    existing = json.loads(smokes.read_text()) if smokes.exists() else {}
    existing["bm25_write_alignment"] = record
    smokes.write_text(json.dumps(existing, indent=1))
    print(json.dumps({k: record[k] for k in (
        "unaligned_last3_mean_s", "aligned_last3_mean_s",
        "aligned_files_grow_with_epochs_only")}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
