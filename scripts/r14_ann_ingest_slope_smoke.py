#!/usr/bin/env python
"""ANN sized-geometry INGEST slope smoke (VERDICT r13 #2).

r13's geometry smoke (``smokes/r13.json`` ``ann_geometry``) proved the
QUERY side sublinear but left the ingest side under-measured: the
sized 1× leg's constant-size fold walls climbed 4.61 → 10.6 s across
5 epochs, the adaptive compaction trigger only fired after the
window, and the slope's cause was inference (listing vs the per-fold
codebook collect), not measurement.

This smoke folds 12 CONSTANT-SIZE batches (4k vectors each) into a
sized-geometry store (C = √48k ≈ 219, the vectorized assignment path)
three ways in one JVM:

- ``uncached_nocompact`` — the r13 behavior reproduced: the coarse
  codebook broadcast cache is cleared before every fold (emulating
  the per-fold driver collect r13 shipped) and compaction never runs.
  Expected: the steepest walls.
- ``cached_nocompact``  — r14's once-per-store codebook broadcast, no
  compaction.  The per-fold gap to the uncached leg IS the collect
  cost; whatever slope remains tracks the stores' growing small-file
  count (the listing hypothesis), read off the recorded per-epoch
  files-per-bucket.
- ``cached_adaptive``   — the shipping configuration: broadcast cache
  + the storeconfig adaptive trigger (compact when any codes bucket
  exceeds 4 data files), compaction walls recorded separately so the
  fold walls stay pure.  Expected: a measured SAW-TOOTH — walls drop
  at each post-compaction epoch and stay bounded, not monotone.

Verdict fields make the reading machine-checkable: per-leg fold walls,
per-epoch max files/bucket (codes + seen), compaction epochs/walls,
codebook collect counts, and ``bounded`` = last-3-epoch mean of the
adaptive leg ≤ its peak (the saw-tooth reset happened).  Results merge
into ``smokes/r14.json``.  Manual diagnostic — not part of the suite.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from kafkastreamsproject_spark.session import get_spark  # noqa: E402
from kafkastreamsproject_spark.sources.bucketed import (  # noqa: E402
    max_files_per_bucket,
    store_table_name,
)
from kafkastreamsproject_spark.streaming import annindex as AX  # noqa: E402

EPOCHS = 12
PER_EPOCH = 4_000
TOTAL = EPOCHS * PER_EPOCH  # 48k vectors, sized C = 219


def emb(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: (
                F.pmod(F.hash(F.col("id") * 31 + i), F.lit(1000)) / 1000.0
            ).cast("float"),
        ).alias("embedding"),
    )


def run_leg(spark, td: str, tag: str, cached: bool, compact: bool) -> dict:
    store = f"{td}/{tag}"
    AX.create_ann_store(spark, store, emb(spark, 0, TOTAL))
    collects0 = AX._COARSE_COLLECTS["n"]
    fold_walls, files_codes, files_seen = [], [], []
    compactions: list[dict] = []
    for e in range(EPOCHS):
        if not cached:
            AX._COARSE_BC_CACHE.clear()  # emulate the r13 per-fold collect
        t0 = time.perf_counter()
        AX.ann_ingest_batch(
            emb(spark, e * PER_EPOCH, (e + 1) * PER_EPOCH), store
        )
        fold_walls.append(round(time.perf_counter() - t0, 2))
        files_codes.append(max_files_per_bucket(spark, f"{store}/codes"))
        files_seen.append(max_files_per_bucket(spark, f"{store}/seen"))
        if compact and files_codes[-1] > 4:
            t0 = time.perf_counter()
            AX.compact_codes(spark, store)
            compactions.append(
                {"after_epoch": e,
                 "wall_s": round(time.perf_counter() - t0, 2)}
            )
    for prefix, sub in (("ann_codes", "codes"), ("ann_seen", "seen")):
        spark.sql(
            "DROP TABLE IF EXISTS "
            + store_table_name(prefix, f"{store}/{sub}")
        )
    return {
        "fold_walls_s": fold_walls,
        "max_files_per_bucket_codes": files_codes,
        "max_files_per_bucket_seen": files_seen,
        "codebook_collects": AX._COARSE_COLLECTS["n"] - collects0,
        "compactions": compactions,
    }


def main() -> None:
    spark = get_spark(app_name="r14-ann-ingest-slope-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    td = tempfile.mkdtemp(prefix="r14_ann_slope_")

    # warm-up leg (discarded): JIT + shuffle-service spin-up
    run_leg(spark, td, "warm", cached=True, compact=True)

    legs = {}
    for tag, cached, compact in (
        ("uncached_nocompact", False, False),
        ("cached_nocompact", True, False),
        ("cached_adaptive", True, True),
    ):
        legs[tag] = run_leg(spark, td, tag, cached, compact)
        print(tag, json.dumps(legs[tag]), flush=True)

    ad = legs["cached_adaptive"]["fold_walls_s"]
    un = legs["uncached_nocompact"]["fold_walls_s"]
    ca = legs["cached_nocompact"]["fold_walls_s"]
    collect_gap = round(sum(un) / len(un) - sum(ca) / len(ca), 2)
    seen_files = legs["cached_nocompact"]["max_files_per_bucket_seen"]
    record = {
        "kind": "r14_ann_ingest_slope_same_jvm",
        "epochs": EPOCHS,
        "vectors_per_epoch": PER_EPOCH,
        "geometry": AX.sized_geometry(TOTAL),
        "legs": legs,
        # collect cost = mean per-fold gap uncached minus cached; a
        # value within noise (≤0 or ≈0) REFUTES the per-fold-collect
        # hypothesis at this C — the codebook is √N rows, the collect
        # is microseconds against multi-second folds
        "collect_cost_per_fold_s": collect_gap,
        # the listing hypothesis read directly off the stores: how
        # many data files the hottest seen/codes bucket accumulates
        # per epoch without compaction (write amplification = files
        # growing with epochs×tasks, not epochs)
        "seen_files_per_bucket_per_epoch": round(
            (seen_files[-1] - seen_files[0]) / (EPOCHS - 1), 1
        ),
        # bounded = the adaptive leg's closing walls sit at/below its
        # peak (saw-tooth reset measured, not inferred)
        "adaptive_peak_s": max(ad),
        "adaptive_last3_mean_s": round(sum(ad[-3:]) / 3, 2),
        "bounded": sum(ad[-3:]) / 3 <= max(ad),
    }
    shutil.rmtree(td, ignore_errors=True)
    smokes = ROOT / "smokes" / "r14.json"
    existing = json.loads(smokes.read_text()) if smokes.exists() else {}
    key = sys.argv[1] if len(sys.argv) > 1 else "ann_ingest_slope"
    existing[key] = record
    smokes.write_text(json.dumps(existing, indent=1))
    print(json.dumps({k: record[k] for k in (
        "collect_cost_per_fold_s", "adaptive_peak_s",
        "adaptive_last3_mean_s", "bounded")}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
