#!/usr/bin/env python
"""Scale-smoke for the end-to-end curation funnel.

The design claim (pipelines/curation.py): every stage shuffles hashes,
ids, or ~16 B/doc metadata — never text bodies — so funnel wall-time
should grow ~linearly with corpus size.  Measured here instead of
asserted: run ``curate_corpus`` over the salted-replica corpus (built
by scale_smoke's generator, cross-replica shingle sets disjoint so true
near-dup structure grows linearly) at 1× and N× and record the growth
ratio.  The holdout is a deterministic ~0.5% sample of the corpus
itself, so decontamination provably fires (those docs self-contain at
100%) at every scale.

Usage:  python scripts/curation_smoke.py [N]    # default N=10

Manual diagnostic, not part of the test suite.  Appends one
``{"kind": "curation_smoke", ...}`` line to PROGRESS.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

from scale_smoke import _scaled_corpus_dir

from kafkastreamsproject_spark.pipelines.curation import curate_corpus
from kafkastreamsproject_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="curation-smoke")

    out: dict = {"kind": "curation_smoke", "n": n}
    walls: dict[int, float] = {}
    for factor in (1, n):
        d = _scaled_corpus_dir(spark, sf_dir, factor)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        holdout = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(200)) == 0)
        t0 = time.perf_counter()
        packed, stats = curate_corpus(
            docs,
            quality_min=0.3,
            holdout=holdout,
            containment_max=0.5,
            pack_budget=2048,
        )
        wall = time.perf_counter() - t0
        walls[factor] = wall
        label = f"{factor}x"
        out[f"input_{label}"] = stats.input
        out[f"survivors_{label}"] = stats.after_decontamination
        out[f"decontaminated_{label}"] = stats.after_lang - stats.after_decontamination
        out[f"packs_{label}"] = stats.packs
        out[f"wall_{label}_s"] = round(wall, 2)
        out[f"docs_per_s_{label}"] = round(stats.input / wall, 0)
        print(
            f"  curation @{label}: {stats.input:,} docs -> "
            f"{stats.after_decontamination:,} survivors "
            f"({stats.after_lang - stats.after_decontamination:,} decontaminated), "
            f"{stats.packs:,} packs, {wall:.2f}s "
            f"({stats.input / wall:,.0f} docs/s)",
            flush=True,
        )
    out[f"wall_growth_{n}x"] = round(walls[n] / walls[1], 2)
    out["ts"] = time.time()
    print(json.dumps(out))
    with open(Path(__file__).resolve().parent.parent / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
