#!/usr/bin/env python
"""Scale smoke for the bucket-local MERGE (sources/bucketed.py:
merge_upsert_in_store): the 100 TB claim is cost ∝ affected buckets ·
bucket size — so a FIXED-width CDC batch against a 10× bigger store at
10× the bucket count should cost about the same wall (same number of
bucket files rewritten, each the same size), not 10× more.

Two stores (100k and 1M rows; n_buckets 32 and 320 per the sizing rule
"bucket ≈ one task of data", so bucket SIZE is equal across legs), the
same BOUNDED 20-key CDC batch (10 updates, 5 deletes, 5 inserts — a
localized change set touches ≤ 20 buckets on either store, the shape
the locality claim is about; a corpus-wide batch would rightly cost a
near-full rewrite on both), warm-up merge discarded on a throwaway
store.  Results merge into smokes/r12.json `merge_scale`.
Manual diagnostic — not part of the test suite.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
import sys
import tempfile

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kafkastreamsproject_spark.session import get_spark
from kafkastreamsproject_spark.sources.bucketed import (
    append_bucketed_store,
    merge_upsert_in_store,
    store_table_name,
)

SCHEMA = "k bigint, v bigint, tag string"


def build_store(spark, root: str, n_rows: int, n_buckets: int) -> tuple[str, str]:
    path = f"{root}/rows"
    table = store_table_name(f"msmoke_{n_rows}", path)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    rows = spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.concat(F.lit("tag"), (F.col("id") % 97).cast("string")).alias("tag"),
    )
    append_bucketed_store(spark, rows, path, table, ["k"], n_buckets)
    return path, table


def cdc_batch(spark, n_store_rows: int):
    # 10 updates + 5 deletes inside the key range, 5 inserts above
    upd = spark.range(10).select(
        (F.col("id") * (n_store_rows // 10)).alias("k"),
        F.lit(-1).cast("long").alias("v"),
        F.lit("upd").alias("tag"),
        F.lit(False).alias("deleted"),
    )
    dele = spark.range(5).select(
        (F.col("id") * (n_store_rows // 5) + 1).alias("k"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("string").alias("tag"),
        F.lit(True).alias("deleted"),
    )
    ins = spark.range(5).select(
        (F.col("id") + 10 * n_store_rows).alias("k"),
        F.lit(7).cast("long").alias("v"),
        F.lit("ins").alias("tag"),
        F.lit(False).alias("deleted"),
    )
    return upd.unionByName(dele).unionByName(ins)


def run_leg(spark, n_rows: int, n_buckets: int, label: str) -> dict:
    from kafkastreamsproject_spark.sources.bucketed import (
        compact_bucketed_store,
    )

    root = tempfile.mkdtemp(prefix=f"r12_merge_{label}_")
    t0 = time.perf_counter()
    path, table = build_store(spark, root, n_rows, n_buckets)
    # compact to ~1 file per bucket — the documented between-epoch
    # maintenance; without it the parallel build leaves ~|tasks| files
    # PER bucket and the merge goes metadata-bound (measured: 512
    # files rewritten for 16 affected buckets)
    n_files = compact_bucketed_store(
        spark, path, table, SCHEMA, ["k"], n_buckets
    )
    t_build = round(time.perf_counter() - t0, 2)
    changes = cdc_batch(spark, n_rows)
    t0 = time.perf_counter()
    stats = merge_upsert_in_store(
        spark, changes, path, table, SCHEMA, ["k"], n_buckets,
        tombstone_col="deleted",
    )
    t_merge = round(time.perf_counter() - t0, 2)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    return {
        "store_rows": n_rows,
        "n_buckets": n_buckets,
        "files_after_compact": n_files,
        "build_s": t_build,
        "merge_s": t_merge,
        **stats,
    }


def main() -> None:
    spark = get_spark(app_name="r12-merge-smoke")
    run_leg(spark, 50_000, 16, "warm")  # discarded warm-up
    small = run_leg(spark, 100_000, 32, "small")
    big = run_leg(spark, 1_000_000, 320, "big")
    out = {
        "batch": "20 keys: 10 updates / 5 deletes / 5 inserts (localized)",
        "warmup": "50k-row store merge, discarded",
        "small": small,
        "big": big,
        "merge_wall_ratio_10x_store": round(
            big["merge_s"] / small["merge_s"], 2
        ),
    }
    print(json.dumps(out, indent=2), flush=True)
    repo = Path(__file__).resolve().parent.parent
    target = repo / "smokes" / "r12.json"
    existing = json.loads(target.read_text())
    existing["merge_scale"] = out
    target.write_text(json.dumps(existing, indent=2) + "\n")


if __name__ == "__main__":
    main()
