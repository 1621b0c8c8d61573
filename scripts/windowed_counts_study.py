#!/usr/bin/env python
"""windowed_counts normalized-series check (VERDICT r10 #4).

r10 saw windowed_counts regress 0.370 → 0.411 s raw with ZERO diffs in
its module; the normalized series (wall ÷ the lineitem_scan_agg
calibration probe) exists precisely to decide noise vs. real.  This
runs the query and bench.py's exact calibration kernel interleaved,
min-of-N at sf0.1 on the bench session, and prints raw + normalized so
the round records a like-for-like delta against BENCH_r10
(raw 0.411 s, normalized 1.31).

Manual diagnostic — results go into smokes/r11.json's
``windowed_counts_study`` key by the run that commits them.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafkastreamsproject_spark.plans.registry import all_queries
from kafkastreamsproject_spark.session import get_spark

N_RUNS = 9


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="windowed-counts-study")
    spec = all_queries()["windowed_counts"]
    lineitem = os.path.join(sf_dir, "lineitem.parquet")

    def calibrate() -> float:
        # bench.py's lineitem_scan_agg kernel, verbatim
        t0 = time.perf_counter()
        spark.read.parquet(lineitem).selectExpr(
            "sum(l_quantity)", "sum(l_extendedprice)", "count(*)"
        ).collect()
        return time.perf_counter() - t0

    # warm-up
    spec.spark(spark, sf_dir).count()
    calibrate()

    walls, cals = [], []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).count()
        walls.append(time.perf_counter() - t0)
        cals.append(calibrate())

    wall = min(walls)
    cal = min(cals)
    out = {
        "kind": "windowed_counts_study",
        "runs": N_RUNS,
        "wall_min_s": round(wall, 4),
        "wall_all_s": [round(w, 4) for w in walls],
        "calibration_min_s": round(cal, 4),
        "normalized": round(wall / cal, 3),
        "r10_reference": {"wall_s": 0.411, "normalized": 1.31},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
