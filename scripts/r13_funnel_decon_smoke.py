#!/usr/bin/env python
"""Attribute and fix the 100× funnel's decontamination stage cost
(VERDICT r12 #4: 26.2 → 30.8 s across the two r12 runs while every
other stage shrank or held).

Attribution history (both measured same-JVM at 100×, 500k docs):

1. **Hypothesis 1 — lineage recompute — REFUTED.**  The surprisal
   subplan stays in ``quality``'s lineage, so the decontamination
   checkpoint re-executes it; an extra eager checkpoint at the
   surprisal boundary should then shrink the stage.  Measured:
   34.3 s (old boundary) vs 36.1 s (checkpointed) — shuffle reuse
   already makes the re-execution cheap, the added write only costs.
   (Recorded under ``surprisal_ckpt_ab``; the r12 26.2 → 30.8 growth
   is within this stage's same-code variance.)
2. **Hypothesis 2 — unused MinHash — CONFIRMED and fixed.**  The
   stage called ``doc_signatures``, which computes an 8-perm MinHash
   signature per document that the containment check NEVER reads —
   8 hash-combines per shingle over every surviving document.
   ``doc_shingle_sets`` (hset only, identical hashing) replaces it.

This smoke runs the full funnel at 100× twice in one JVM — old path
(``_decon_full_sigs=True``) then fixed — after a discarded 1×
warm-up, and records both stage-wall maps + survivor identity.
Results merge into ``smokes/r13.json``.  Manual diagnostic — not part
of the test suite.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

from kafkastreamsproject_spark.operators.cache import release_persisted  # noqa: E402
from kafkastreamsproject_spark.session import get_spark  # noqa: E402

import r12_scale_smoke as S  # noqa: E402

N = 100


def main() -> None:
    spark = get_spark(app_name="r13-funnel-decon-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    print("== warm-up funnel at 1x (discarded) ==", flush=True)
    S.run_funnel(spark, n=1)
    release_persisted()

    print("== funnel at 100x, OLD decon (_decon_full_sigs=True) ==",
          flush=True)
    old = S.run_funnel(
        spark, n=N, curate_overrides={"_decon_full_sigs": True}
    )
    release_persisted()
    print(json.dumps(old["stage_walls_s"], indent=1), flush=True)

    print("== funnel at 100x, FIXED decon (hset-only signatures) ==",
          flush=True)
    fixed = S.run_funnel(spark, n=N)
    release_persisted()
    print(json.dumps(fixed["stage_walls_s"], indent=1), flush=True)

    smokes = ROOT / "smokes" / "r13.json"
    existing = json.loads(smokes.read_text()) if smokes.exists() else {}
    prior = existing.get("funnel_decon_attribution", {})

    record = {
        "kind": "r13_funnel_decon_attribution_same_jvm",
        "hypothesis_1_refuted": (
            "lineage recompute of the surprisal subplan: an extra "
            "eager checkpoint at the surprisal boundary moved "
            "decontamination 34.3 -> 36.1 s (shuffle reuse already "
            "makes re-execution cheap; the write only costs)"
        ),
        "surprisal_ckpt_ab": {
            "old_boundary": prior.get("old_boundary"),
            "ckpt_boundary": prior.get("fixed_boundary"),
        },
        "hypothesis_2_confirmed": (
            "doc_signatures computes an 8-perm MinHash the containment "
            "check never reads, over every surviving document; "
            "doc_shingle_sets (hset only, identical hashing) replaces it"
        ),
        "old_full_sigs": {
            "wall_s": old["wall_s"],
            "stage_walls_s": old["stage_walls_s"],
            "packed_docs": old["packed_docs"],
        },
        "fixed_hset_only": {
            "wall_s": fixed["wall_s"],
            "stage_walls_s": fixed["stage_walls_s"],
            "packed_docs": fixed["packed_docs"],
        },
        "survivors_identical": old["packed_docs"] == fixed["packed_docs"]
        and old["funnel"] == fixed["funnel"],
        "decon_wall_old_vs_fixed": [
            old["stage_walls_s"]["decontamination"],
            fixed["stage_walls_s"]["decontamination"],
        ],
    }
    print(json.dumps({k: record[k] for k in (
        "decon_wall_old_vs_fixed", "survivors_identical")}), flush=True)

    existing["funnel_decon_attribution"] = record
    smokes.write_text(json.dumps(existing, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
