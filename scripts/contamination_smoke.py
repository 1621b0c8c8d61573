#!/usr/bin/env python
"""Scale-smoke for the round-5 curation operators.

Design claims measured (not asserted):

- ``contamination_ngram_overlap`` — eval set broadcast, probe is
  map-side: wall should grow ~linearly with the corpus (the eval slice
  grows with it here, the worst case for the broadcast).
- ``token_rarity_quality`` — two grouped aggs + a vocab join; the
  salted replicas multiply the vocab n×, so this measures the
  freq-join's behavior as the dictionary grows, not just the scan.
- ``hybrid_neardup_fusion`` — bucketed LSH candidates + hash-array
  confirm joins; pair work must track Σ bucket², not corpus².

Runs each at 1× and N× on the salted-replica corpus (scale_smoke's
generator: cross-replica shingles disjoint, embeddings shifted, so true
structure grows linearly) and records the growth ratio.

Usage:  python scripts/contamination_smoke.py [N]    # default N=10

Manual diagnostic, not part of the test suite.  Appends one
``{"kind": "contamination_smoke", ...}`` line to PROGRESS.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from scale_smoke import _scaled_corpus_dir

from kafkastreamsproject_spark.operators.cache import release_persisted
from kafkastreamsproject_spark.plans.llmdata import (
    contamination_ngram_overlap,
    hybrid_neardup_fusion,
    token_rarity_quality,
)
from kafkastreamsproject_spark.session import get_spark

QUERIES = [
    ("contamination_ngram_overlap", contamination_ngram_overlap),
    ("token_rarity_quality", token_rarity_quality),
    ("hybrid_neardup_fusion", hybrid_neardup_fusion),
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="contamination-smoke")

    out: dict = {"kind": "contamination_smoke", "n": n}
    walls: dict[tuple[str, int], float] = {}
    for factor in (1, n):
        d = _scaled_corpus_dir(spark, sf_dir, factor)
        label = f"{factor}x"
        for qname, fn in QUERIES:
            release_persisted()
            t0 = time.perf_counter()
            rows = fn(spark, d).count()
            wall = time.perf_counter() - t0
            walls[(qname, factor)] = wall
            out[f"{qname}_{label}_s"] = round(wall, 2)
            out[f"{qname}_{label}_rows"] = rows
            print(f"  {qname} @{label}: {rows:,} rows in {wall:.2f}s", flush=True)
    for qname, _ in QUERIES:
        out[f"{qname}_growth_{n}x"] = round(
            walls[(qname, n)] / walls[(qname, 1)], 2
        )
    out["ts"] = time.time()
    print(json.dumps(out))
    with open(Path(__file__).resolve().parent.parent / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
