#!/usr/bin/env python
"""Round-7 operator scale smoke: run the round's new heavy operators at
sf0.01 and sf0.1 (10× rows) and print wall-time growth ratios, so their
scaling behavior — not just sf0.01 correctness — is on record.

Covered: bpe_merge_steps (3 merge iterations over the word-count
table), neardup_triangle_stats + cluster_radius_stats (graph passes
over the confirmed-pair set), ivf_pq_search (coarse pruning + ADC),
skyline_price_quantity (two-level prefix scan), doc_surprisal_quality
and bigram_lm_predict (vocab-table probe joins), cms_token_freq
(constant-width sketch shuffle), streaming_event_pairs (two-sided join
state), linear_interpolate_gaps (densify + ignore-nulls windows).

A healthy ratio at 10× data on a fixed 32-thread box is ≲10× wall
(fixed overheads amortize; graph-pass work grows with true-duplicate
density, which the fixtures keep linear).  Results append to
PROGRESS.jsonl as {"kind": "r7_ops_smoke", ...}.

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
    "bpe_merge_steps",
    "neardup_triangle_stats",
    "cluster_radius_stats",
    "ivf_pq_search",
    "skyline_price_quantity",
    "doc_surprisal_quality",
    "bigram_lm_predict",
    "cms_token_freq",
    "streaming_event_pairs",
    "linear_interpolate_gaps",
]


def main() -> None:
    spark = get_spark(app_name="r7-ops-smoke")
    from kafkastreamsproject_spark.plans.registry import shadow_queries

    specs = shadow_queries()
    out = {"kind": "r7_ops_smoke", "queries": {}}
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
