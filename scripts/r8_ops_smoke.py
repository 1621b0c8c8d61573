#!/usr/bin/env python
"""Round-8 operator scale smoke: run the round's re-planned and new
operators at sf0.01 and sf0.1 (10× rows) and print wall-time growth
ratios, so their scaling behavior — not just sf0.01 correctness — is
on record.

Covered: the four de-global-sorted queries (peak_concurrency,
gini_revenue_concentration, customer_rfm_segments, q10_returned_item —
now bucketed prefix scans / TakeOrderedAndProject), the truncated
hybrid_retrieval_rrf, the 12-step BPE trainer and its encoder
application, the planted-offender recall readouts (stride grid vs
content-defined chunking), and the repetition/quality signals.

A healthy ratio at 10× data on a fixed 32-thread box is ≲10× wall
(fixed overheads amortize).  The prefix-scan queries are the ones to
watch: their single-task step is |buckets|/|days|-bounded, so the
ratio should track the scan, not the sort.  Results append to
PROGRESS.jsonl as {"kind": "r8_ops_smoke", ...}.

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
    "peak_concurrency",
    "gini_revenue_concentration",
    "customer_rfm_segments",
    "q10_returned_item",
    "hybrid_retrieval_rrf",
    "bpe_merge_steps",
    "bpe_encode_tokens",
    "stride_dedup_recall",
    "cdc_dedup_recall",
    "doc_repetition_stats",
    "l_diversity_audit",
    "stride_refine_recall",
    "purchase_attribution",
    "ivf_pq_recall_curve",
    "dsir_importance_weights",
]


def main() -> None:
    spark = get_spark(app_name="r8-ops-smoke")
    from kafkastreamsproject_spark.plans.registry import shadow_queries

    specs = shadow_queries()
    out = {"kind": "r8_ops_smoke", "queries": {}}
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
