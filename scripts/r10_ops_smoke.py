#!/usr/bin/env python
"""Round-10 operator scale smoke: run the round's new/changed operators
at sf0.01 and sf0.1 (10x rows) and record wall-time growth ratios, so
their scaling behavior — not just sf0.01 correctness — is on record.

Covered: the composed production ANN stack (IVF -> residual-PQ ADC ->
exact re-rank, swept over R), the BNLJ-free re-planned temperature
curve, and the two ingest folds whose stores moved to the bucketed
zero-store-side-Exchange layout this round.  A healthy ratio at 10x
data on a fixed 32-thread box is <~10x wall (fixed overheads
amortize); the dimension-bounded curve should be nearly flat.

r9 lesson: PROGRESS.jsonl is driver-rotated, so results ALSO go to the
committed ``smokes/r10.json`` — scale evidence must survive rotation.

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
    "ivf_pq_residual_rerank_r_curve",
    "mixture_temperature_curve",
    "streaming_line_dedup_ingest",
    "streaming_novelty_ingest",
    # later-r10 additions: the CCNet corpus grading and the 1-bit
    # quantization recall point
    "ccnet_perplexity_buckets",
    "embedding_binary_hamming_recall",
    # batch 3: co-bucketed warehouse join, b-bit minhash storage axis,
    # DoReMi domain reweighting, outer stream-stream join
    "bucketed_warehouse_join",
    "bbit_minhash_error_curve",
    "doremi_mixture_weights",
    "streaming_unmatched_views",
    "streaming_centroid_ingest",
    # batch 4: bloom store-probe pushdown, temporal dimension enrich,
    # bucket-local GDPR erasure
    "batch_bloom_pushdown_stats",
    "streaming_scd2_enrich",
    "line_store_forget_replay",
    "wav_fingerprint_neardup",
    "streaming_exact_dedup",
    "packing_ffd_replay",
    "boilerplate_line_extract",
]


def main() -> None:
    spark = get_spark(app_name="r10-ops-smoke")
    from kafkastreamsproject_spark.plans.registry import (
        all_queries,
        shadow_queries,
    )

    specs = {**all_queries(), **shadow_queries()}
    out = {"kind": "r10_ops_smoke", "queries": {}}
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
    root = Path(__file__).resolve().parent.parent
    with open(root / "PROGRESS.jsonl", "a") as f:
        f.write(line + "\n")
    (root / "smokes").mkdir(exist_ok=True)
    (root / "smokes" / "r10.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(line)


if __name__ == "__main__":
    main()
