#!/usr/bin/env python
"""Round-11 operator scale smoke: run the operators this round touched
at sf0.01 and sf0.1 (10x rows) and record wall-time growth ratios.

Covered: the repaired batched-BPE trainer (bpe_merge_steps — the adj3
context bound adds a trigram aggregation per job), every query whose
expression tree was rewritten by the let1/zip_with O(L^2)->O(L)
higher-order-function fix (minhash family, chunk dedup, PMI, DSIR,
classifier), and the heavy-hitters MG pruning whose superset rule got
its adversarial property test.

A healthy ratio at 10x data on a fixed 32-thread box is well under
10x wall (fixed overheads amortize).  Results go to the committed
``smokes/r11_ops.json`` (PROGRESS.jsonl is driver-rotated).

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
    # repaired BPE commit rule (rule-4 adj3 bound)
    "bpe_merge_steps",
    "bpe_encode_tokens",
    "bpe_fertility_by_lang",
    # let1/zip_with HOF rewrite beneficiaries
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "chunk_dedup_stats",
    "pmi_collocations",
    "dsir_importance_weights",
    "quality_classifier_train",
    "doc_repetition_stats",
    # MG heavy hitters (superset rule property-tested this round)
    "token_heavy_hitters",
]


def main() -> None:
    spark = get_spark(app_name="r11-ops-smoke")
    from kafkastreamsproject_spark.plans.registry import (
        all_queries,
        shadow_queries,
    )

    specs = {**all_queries(), **shadow_queries()}
    out = {"kind": "r11_ops_smoke", "queries": {}}
    for name in QUERIES:
        if name not in specs:
            out["queries"][name] = {"error": "not registered"}
            continue
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
        print(f"{name}: {row}", flush=True)
    line = json.dumps(out)
    root = Path(__file__).resolve().parent.parent
    (root / "smokes").mkdir(exist_ok=True)
    (root / "smokes" / "r11_ops.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(line)


if __name__ == "__main__":
    main()
