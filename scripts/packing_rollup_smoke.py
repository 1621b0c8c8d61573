#!/usr/bin/env python
"""Scale-smoke for sequence packing and incremental rollup maintenance.

Two claims the design docs make, measured instead of asserted
(round-2 advice item 6):

1. **Sequence packing is linear in corpus size** — FFD runs per hash
   shard over (id, n_tokens) only, so 10× the docs ≈ 10× the wall with
   flat docs/sec.  Measured at 1M and 10M docs.
2. **Rollup merge cost is O(batch + affected days), independent of
   store HISTORY size** — the merge reads only the affected days'
   partitions (partition-pruned scan) and dynamically overwrites only
   those.  Measured by merging an identical 1-day batch into stores
   holding 10, 100, and 300 days of history: the wall-time curve vs
   history must be flat.

Manual diagnostic, not part of the test suite.  Appends one
``{"kind": "packing_smoke", ...}`` and one
``{"kind": "rollup_merge_smoke", ...}`` line to PROGRESS.jsonl.
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

from kafkastreamsproject_spark.operators.incremental import (
    merge_daily_rollup,
    partial_daily_rollup,
)
from kafkastreamsproject_spark.operators.packing import (
    pack_documents,
    packing_stats,
)
from kafkastreamsproject_spark.session import get_spark

BUDGET = 2048


def _synthetic_tokens(spark, n_docs: int):
    """(doc_id, n_tokens) with a deterministic long-tailed length mix —
    xxhash-derived so every run and every scale sees the same
    distribution family."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (
            F.pmod(F.xxhash64("id", F.lit(7)), F.lit(900)) + 64
            + F.when(F.pmod(F.xxhash64("id", F.lit(13)), F.lit(20)) == 0,
                     F.pmod(F.xxhash64("id", F.lit(17)), F.lit(1400)))
             .otherwise(F.lit(0))
        ).cast("long").alias("n_tokens"),
    )


def smoke_packing(spark) -> dict:
    out: dict = {"kind": "packing_smoke_scaling", "budget": BUDGET}
    for n in (1_000_000, 10_000_000):
        docs = _synthetic_tokens(spark, n)
        t0 = time.perf_counter()
        packed = pack_documents(docs, BUDGET)
        stats = packing_stats(packed, BUDGET)
        agg = stats.agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.avg(F.when(~F.col("overflow"), F.col("fill_ratio"))).alias("fill"),
        ).first()
        wall = time.perf_counter() - t0
        label = f"{n // 1_000_000}m"
        out[f"docs_{label}"] = n
        out[f"wall_{label}_s"] = round(wall, 2)
        out[f"docs_per_s_{label}"] = round(n / wall, 0)
        out[f"packs_{label}"] = agg.n_packs
        out[f"avg_fill_{label}"] = round(float(agg.fill), 4)
        print(
            f"  packing @{label}: {agg.n_packs:,} packs, fill {agg.fill:.4f}, "
            f"{wall:.2f}s ({n / wall / 1e6:.2f}M docs/s)",
            flush=True,
        )
    out["wall_growth_10x"] = round(out["wall_10m_s"] / out["wall_1m_s"], 2)
    return out


def _seed_store(spark, store_path: str, n_days: int, n_keys: int) -> None:
    """Write a history store directly in the rollup's partial shape —
    one (key, day) row per pair, partitioned by day like the merge
    writes it."""
    rows = spark.range(n_days * n_keys).select(
        F.pmod("id", F.lit(n_keys)).cast("long").alias("user_id"),
        F.date_format(
            F.date_add(F.lit("2023-01-01").cast("date"),
                       (F.col("id") / n_keys).cast("int")),
            "yyyy-MM-dd",
        ).alias("event_day"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 10).cast("decimal(28,2)").alias("sum_value"),
        F.lit(10).cast("long").alias("n_events"),
        F.lit(6).cast("long").alias("started_events"),
        F.lit(4).cast("long").alias("ended_events"),
        F.lit("2023-06-01 00:00:00").cast("timestamp").alias("update_time"),
    )
    rows.repartition("event_day").write.mode("overwrite").partitionBy(
        "event_day"
    ).parquet(store_path)


def smoke_rollup(spark) -> dict:
    n_keys = 50_000
    batch_rows = 1_000_000
    # identical one-day batch folded into every store
    batch = spark.range(batch_rows).select(
        F.pmod("id", F.lit(n_keys)).cast("long").alias("user_id"),
        (F.lit("2024-06-15 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.pmod(F.xxhash64("id", F.lit(3)), F.lit(86_400))
           .cast("double"))).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(5)), F.lit(1000)) / 10.0).alias("value"),
        F.when(F.pmod("id", F.lit(2)) == 0, F.lit("click"))
         .otherwise(F.lit("end")).alias("event_type"),
    )
    out: dict = {
        "kind": "rollup_merge_smoke",
        "batch_rows": batch_rows,
        "n_keys": n_keys,
    }
    walls = {}
    for n_days in (10, 100, 300):
        store = tempfile.mkdtemp(prefix=f"rollup_smoke_{n_days}d_")
        try:
            _seed_store(spark, store, n_days, n_keys)
            t0 = time.perf_counter()
            days = merge_daily_rollup(spark, store, batch)
            wall = time.perf_counter() - t0
            assert days == ["2024-06-15"], days
            walls[n_days] = wall
            out[f"history_{n_days}d_rows"] = n_days * n_keys
            out[f"merge_wall_{n_days}d_s"] = round(wall, 2)
            print(
                f"  rollup merge into {n_days}-day store "
                f"({n_days * n_keys:,} rows history): {wall:.2f}s",
                flush=True,
            )
        finally:
            shutil.rmtree(store, ignore_errors=True)
    out["wall_300d_over_10d"] = round(walls[300] / walls[10], 2)
    return out


def main() -> None:
    spark = get_spark(app_name="packing-rollup-smoke")
    records = [smoke_packing(spark), smoke_rollup(spark)]
    progress = Path(__file__).resolve().parent.parent / "PROGRESS.jsonl"
    with open(progress, "a") as f:
        for rec in records:
            rec["ts"] = time.time()
            print(json.dumps(rec))
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
