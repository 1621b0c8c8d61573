#!/usr/bin/env python
"""Round-6 operator scale smoke: run the round's new heavy operators at
sf0.01 and sf0.1 (10× rows) and print wall-time growth ratios, so their
scaling behavior — not just sf0.01 correctness — is on record.

Covered: semantic_dedup_keep (two-signal graph → components → keep-one),
incremental_shard_dedup (bucketed store probe), cdc_chunk_dedup_stats
(every-offset windows + mod-p selection), kmeans_int8_lloyd (two Lloyd
iterations), chunk_scrub_text (passage removal).

A healthy ratio at 10× data on a fixed 32-thread box is ≲10× wall
(fixed overheads amortize; the near-dup families' pair work grows with
true-duplicate density, which the fixtures keep linear).  Results append
to PROGRESS.jsonl as {"kind": "r6_ops_smoke", ...}.

Manual diagnostic — not part of the test suite.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafkastreamsproject_spark.session import get_spark

QUERIES = [
    "semantic_dedup_keep",
    "incremental_shard_dedup",
    "cdc_chunk_dedup_stats",
    "kmeans_int8_lloyd",
    "chunk_scrub_text",
    "embedding_covariance_int8",
    "pq_encode_int8",
    "pq_adc_topk",
]


def main() -> None:
    spark = get_spark(app_name="r6-ops-smoke")
    from kafkastreamsproject_spark.plans.registry import shadow_queries

    specs = shadow_queries()
    out = {"kind": "r6_ops_smoke", "queries": {}}
    for name in QUERIES:
        row = {}
        for sf_dir, key in (
            ("/root/testdata/sf0.01", "sf0.01"),
            ("/root/testdata/sf0.1", "sf0.1"),
        ):
            t0 = time.perf_counter()
            n = specs[name].spark(spark, sf_dir).count()
            row[key] = round(time.perf_counter() - t0, 3)
            row[f"rows_{key}"] = n
        row["ratio_10x"] = round(row["sf0.1"] / row["sf0.01"], 2)
        out["queries"][name] = row
        print(f"{name}: {row}")
    line = json.dumps(out)
    with open(Path(__file__).resolve().parent.parent / "PROGRESS.jsonl", "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
