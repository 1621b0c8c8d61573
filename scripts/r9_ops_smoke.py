#!/usr/bin/env python
"""Round-9 operator scale smoke: run the round's new operators at
sf0.01 and sf0.1 (10x rows) and print wall-time growth ratios, so
their scaling behavior — not just sf0.01 correctness — is on record.

Covered: the IVF-PQ exact re-rank stack and both of its sweep curves
(one ADC pass each), the t-closeness EMD audit (dimension-bounded
grid), the real binary decoders (PPM pixel stats, WAV sample moments
— mapInPandas scans), and the MinHash estimator-error pair readout
(rides the banding join).  A healthy ratio at 10x data on a fixed
32-thread box is <~10x wall (fixed overheads amortize); the
dimension-bounded audits should be nearly flat.  Results append to
PROGRESS.jsonl as {"kind": "r9_ops_smoke", ...}.

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
    "ivf_pq_rerank",
    "ivf_pq_recall_curve",
    "ivf_pq_rerank_r_curve",
    "t_closeness_audit",
    "ppm_image_stats",
    "wav_audio_stats",
    "minhash_estimator_error",
    # later-r9 additions: retrieval rerank, set-similarity join,
    # novelty audit, cluster-aware splits, the trained quality
    # classifier (train / confusion / threshold sweep), and the
    # keep-first line dedup
    "bm25_semantic_rerank",
    "prefix_filter_jaccard_pairs",
    "doc_novelty_audit",
    "cluster_aware_splits",
    "quality_classifier_train",
    "quality_classifier_confusion",
    "quality_classifier_pr_curve",
    "line_dedup_keep_first",
    "minhash_perm_error_curve",
    "bpe_fertility_curve",
    "doc_lang_mix",
    "ppm_dhash_neardup",
    "source_quality_blocklist",
    "streaming_line_dedup_ingest",
    "zipf_slope_fit",
    "editdist_neardup_pairs",
    "streaming_classifier_gate",
    "contamination_threshold_curve",
    "jaccard_threshold_curve",
]


def main() -> None:
    spark = get_spark(app_name="r9-ops-smoke")
    from kafkastreamsproject_spark.plans.registry import (
        all_queries,
        shadow_queries,
    )

    specs = {**all_queries(), **shadow_queries()}
    out = {"kind": "r9_ops_smoke", "queries": {}}
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
    # r10: PROGRESS.jsonl is driver-rotated (the r9 results were lost
    # to rotation) — results ALSO go to a committed artifact
    (root / "smokes").mkdir(exist_ok=True)
    (root / "smokes" / "r9.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(line)


if __name__ == "__main__":
    main()
