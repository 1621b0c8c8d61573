#!/usr/bin/env python
"""Round-12 100× scale smoke: the three persistent ingest stores and
the composed 12-stage funnel at 100× the r11 corpus (500k documents,
sf10-equivalent) — one order of magnitude past the r11-verdict ask,
because composition-at-scale is where this repo's real bugs have been
found (the r11 funnel OOM, the r12 cache-reuse defect).

Measurement discipline (same as r12_scale_smoke):
- full discarded 1× warm-up per store;
- the 10× leg is RE-MEASURED in this same warm JVM so the 10×→100×
  ratio is same-regime (the committed 10× numbers came from another
  JVM and are not comparable across sessions);
- stores fold at n_buckets=32 for the ratio legs; line-dedup also
  folds the 100× corpus at n_buckets=64 as the width-knob datapoint
  (the sizing rule says widen buckets as the store grows — 10× the
  rows at 2× the width keeps bucket size within ~5× of the 10× run);
- zero-store-side-Exchange re-asserted on every 100× store;
- the funnel runs with every optional stage on and per-stage wall
  attribution.

Results merge into ``smokes/r12.json`` (never overwrite).
Manual diagnostic — not part of the test suite.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
import sys
import tempfile

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafkastreamsproject_spark.operators.cache import release_persisted
from kafkastreamsproject_spark.session import get_spark

from scale_smoke import _scaled_corpus_dir
import r12_scale_smoke as S

N = 100
RATIO_WIDTH = 32
WIDE_WIDTH = 64


def main() -> None:
    spark = get_spark(app_name="r12-scale100-smoke")
    root = tempfile.mkdtemp(prefix="r12_stores100_")

    print("== building 1x / 10x / 100x corpora ==", flush=True)
    dir_1x = _scaled_corpus_dir(spark, S.SF_DIR, 1)
    dir_10x = _scaled_corpus_dir(spark, S.SF_DIR, 10)
    t0 = time.perf_counter()
    dir_100x = _scaled_corpus_dir(spark, S.SF_DIR, N)
    t_corpus = round(time.perf_counter() - t0, 1)
    docs_1x = spark.read.parquet(f"{dir_1x}/documents.parquet")
    docs_10x = spark.read.parquet(f"{dir_10x}/documents.parquet")
    docs_100x = spark.read.parquet(f"{dir_100x}/documents.parquet")
    print(f"  100x corpus written in {t_corpus}s", flush=True)

    print("== warm-up (discarded) ==", flush=True)
    S.smoke_line_store(spark, docs_1x, root, "warm", width=RATIO_WIDTH)
    S.smoke_novelty_store(spark, docs_1x, root, "warm", width=RATIO_WIDTH)
    S.smoke_neardup_store(spark, docs_1x, root, "warm", width=RATIO_WIDTH)
    release_persisted()

    stores: dict[str, dict] = {}
    for name, fn in [
        ("line_dedup", S.smoke_line_store),
        ("novelty", S.smoke_novelty_store),
        ("neardup_banded", S.smoke_neardup_store),
    ]:
        print(f"== {name} ==", flush=True)
        r10 = fn(spark, docs_10x, root, "10x", width=RATIO_WIDTH)
        r100 = fn(spark, docs_100x, root, "100x", width=RATIO_WIDTH)
        release_persisted()
        w10, w100 = sum(r10["fold_walls_s"]), sum(r100["fold_walls_s"])
        stores[name] = {
            "10x": r10,
            "100x": r100,
            "wall_10x_s": round(w10, 2),
            "wall_100x_s": round(w100, 2),
            "ratio_100x_vs_10x": round(w100 / w10, 2) if w10 else None,
        }
        print(
            f"  10x {w10:.1f}s → 100x {w100:.1f}s (ratio "
            f"{stores[name]['ratio_100x_vs_10x']}), "
            f"zero-store-exchange@{RATIO_WIDTH}: "
            f"{r100['zero_store_exchange']}",
            flush=True,
        )

    print(f"== line_dedup 100x at width {WIDE_WIDTH} ==", flush=True)
    r100w = S.smoke_line_store(
        spark, docs_100x, root, "100xw", width=WIDE_WIDTH
    )
    release_persisted()
    stores["line_dedup"]["100x_width64"] = r100w
    stores["line_dedup"]["wall_100x_width64_s"] = round(
        sum(r100w["fold_walls_s"]), 2
    )
    print(
        f"  {stores['line_dedup']['wall_100x_width64_s']}s, "
        f"zero-store-exchange@{WIDE_WIDTH}: {r100w['zero_store_exchange']}",
        flush=True,
    )

    print("== 12-stage funnel at 100x (500k docs) ==", flush=True)
    funnel = S.run_funnel(spark, n=N)
    print(json.dumps(funnel["stage_walls_s"], indent=2), flush=True)

    out = {
        "scale_100x": {
            "scale": "100x sf0.1 documents (500k docs, sf10-equivalent)",
            "corpus_build_s": t_corpus,
            "ratio_width": RATIO_WIDTH,
            "wide_width": WIDE_WIDTH,
            "epochs_per_store": S.EPOCHS,
            "warmup": "full 1x fold loop per store, discarded; "
            "10x re-measured in this JVM for same-regime ratios",
            "stores": stores,
            "funnel_100x": funnel,
        }
    }
    repo = Path(__file__).resolve().parent.parent
    target = repo / "smokes" / "r12.json"
    existing = json.loads(target.read_text()) if target.exists() else {}
    existing.update(out)
    target.write_text(json.dumps(existing, indent=2) + "\n")
    with open(repo / "PROGRESS.jsonl", "a") as f:
        f.write(
            json.dumps(
                {
                    "kind": "r12_scale100_smoke",
                    "stores_ratio_100x_vs_10x": {
                        k: v["ratio_100x_vs_10x"] for k, v in stores.items()
                    },
                    "funnel_wall_s": funnel["wall_s"],
                    "funnel_top2": funnel["top2_stages"],
                }
            )
            + "\n"
        )
    print("merged into smokes/r12.json", flush=True)


if __name__ == "__main__":
    main()
