#!/usr/bin/env python
"""Round-11 funnel smoke: the COMPOSED 12-stage curation funnel at
sf0.1 with EVERY optional stage on (VERDICT r10 #6).

The r10 blocklist and auto-τ classifier stages are unit-tested, but
the full composition had not been re-run at scale since they landed.
This runs ``curate_corpus`` over the 5k-doc sf0.1 documents table with
all stages enabled:

  exact dedup → near-dup dedup → auto source blocklist → quality →
  per-source top-p → repetition → trained classifier (auto-τ) →
  lang-ID → surprisal → decontamination (self-holdout) → DSIR
  resample → per-source mixture → FFD packing

and records the stage-by-stage survivor funnel plus wall time to the
committed ``smokes/r11.json`` (PROGRESS.jsonl is driver-rotated; scale
evidence must survive rotation — the r9 lesson).

First run of this smoke found two real defects the unit tests missed:
the DSIR feature lambda re-ran split(text) per element (O(L²)/doc,
fixed with zip_with-over-slices in four sites) and the composed plan's
un-truncated lineage OOMed the DRIVER at analysis time once all
stages stacked (fixed with two mid-funnel localCheckpoints).  The
composed funnel now runs at the default 8 GiB heap.

Manual diagnostic — not part of the test suite.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kafkastreamsproject_spark.pipelines.curation import curate_corpus
from kafkastreamsproject_spark.session import get_spark
from kafkastreamsproject_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.1"

STAGE_FIELDS = (
    "input",
    "after_exact_dedup",
    "after_neardup_dedup",
    "after_blocklist",
    "after_quality",
    "after_quality_top_p",
    "after_repetition",
    "after_classifier",
    "after_lang",
    "after_surprisal",
    "after_decontamination",
    "after_dsir",
    "after_mixture",
)


def main() -> None:
    spark = get_spark(app_name="r11-funnel-smoke")
    docs = load_table(spark, "documents", SF_DIR).select(
        "doc_id", "text", "source"
    )

    # classifier seed: a deterministic 200-doc slice labeled by a rule
    # INDEPENDENT of the quality stage (char length), so the perceptron
    # learns a real boundary rather than replaying stage 3a
    seed = (
        load_table(spark, "documents", SF_DIR)
        .filter(F.pmod(F.xxhash64("doc_id"), F.lit(25)) == 0)
        .select(
            "text",
            F.when(F.col("n_chars") < 200, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("y"),
        )
    )
    # decontamination holdout: a deterministic ~0.5% self-sample, so the
    # stage provably fires (those docs self-contain at 100%)
    holdout = docs.filter(
        F.pmod(F.xxhash64("doc_id"), F.lit(200)) == 0
    ).select("doc_id", "text")
    # DSIR target: English src0 pages — a concentrated target domain
    target = (
        load_table(spark, "documents", SF_DIR)
        .filter((F.col("lang") == "en") & (F.col("source") == "src0"))
        .select("doc_id", "text")
    )
    # mixture: every source enumerated, graded per-mille rates
    rates = {f"src{i}": 1000 - 30 * i for i in range(20)}

    t0 = time.perf_counter()
    packed, stats = curate_corpus(
        docs,
        quality_min=0.3,
        quality_top_p=0.95,
        source_blocklist="auto",
        repetition_max=0.8,
        classifier_seed=seed,
        classifier_steps=12,
        classifier_tau="auto",
        langs=("en", "de", "fr", "es", "zh"),
        surprisal_max=8.0,
        holdout=holdout,
        containment_max=0.5,
        dsir_target=target,
        dsir_base_m=900,
        mixture_rates_m=rates,
        pack_budget=2048,
    )
    n_packed = packed.count()
    wall = time.perf_counter() - t0

    funnel = {f: getattr(stats, f) for f in STAGE_FIELDS}
    # survivor accounting: the funnel must be monotone non-increasing
    # and the packing must cover exactly the final survivors
    vals = list(funnel.values())
    assert all(a >= b for a, b in zip(vals, vals[1:])), funnel
    assert n_packed == stats.after_mixture, (n_packed, stats.after_mixture)

    out = {
        "kind": "r11_funnel_smoke",
        "sf": 0.1,
        "stages_on": 12,
        "funnel": funnel,
        "packs": stats.packs,
        "classifier_tau": stats.classifier_tau,
        "packed_docs": n_packed,
        "wall_s": round(wall, 2),
        "docs_per_s": round(stats.input / wall, 0),
    }
    line = json.dumps(out)
    print(line)
    root = Path(__file__).resolve().parent.parent
    with open(root / "PROGRESS.jsonl", "a") as f:
        f.write(line + "\n")
    (root / "smokes").mkdir(exist_ok=True)
    # merge-not-overwrite (r11 ADVICE): the committed file also carries
    # manually merged sections (funnel_history, windowed_counts_study);
    # a re-run must not silently drop them
    target = root / "smokes" / "r11.json"
    existing = json.loads(target.read_text()) if target.exists() else {}
    existing.update(out)
    target.write_text(json.dumps(existing, indent=2) + "\n")


if __name__ == "__main__":
    main()
