#!/usr/bin/env python
"""Demonstrate bench.py's host_degraded flag (VERDICT r12 #3).

Runs the four calibration kernels in the same JVM under three host
regimes and feeds each (before, after) pair through
``bench.drift_flags``:

- **quiet** — must flag ``host_degraded=false``;
- **12 spinners** (the r12 A/B's ~1/3-core-theft rig) — must ALSO
  flag ``false``: r12's own measurement (smokes/r12.json bench_ab)
  shows this load moves the canaries only 1.04-1.23x and the query
  medians 7.5%, i.e. the artifact is still a code reading; a flag
  that invalidated it would be crying wolf;
- **40 spinners** (full-core oversubscription — the 1.5-5x regime the
  observed real degradations lived in) — must flag ``true``.

Appends the readout to ``smokes/r13.json`` under
``bench_drift_check``.  Manual diagnostic — not part of the test
suite (it deliberately loads the host).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402
from kafkastreamsproject_spark.session import get_spark  # noqa: E402

REGIMES = (("quiet", 0), ("spin12", 12), ("spin40", 40))
EXPECT_DEGRADED = {"quiet": False, "spin12": False, "spin40": True}


def calibrate(spark, lineitem: str) -> dict:
    cal: dict[str, list[float]] = {
        "range_sum_500m": [],
        "lineitem_scan_agg": [],
        "shuffle_agg_30m": [],
        "job_overhead": [],
    }
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(500_000_000).selectExpr("sum(id)").collect()
        cal["range_sum_500m"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        spark.read.parquet(lineitem).selectExpr(
            "sum(l_quantity)", "sum(l_extendedprice)", "count(*)"
        ).collect()
        cal["lineitem_scan_agg"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        (
            spark.range(0, 30_000_000, 1, 32)
            .selectExpr("pmod(id, 1000000) AS k", "id AS v")
            .groupBy("k")
            .agg({"v": "sum"})
            .selectExpr("count(*)", "sum(`sum(v)`)")
            .collect()
        )
        cal["shuffle_agg_30m"].append(time.perf_counter() - t0)
    for _ in range(5):
        t0 = time.perf_counter()
        spark.range(1).count()
        cal["job_overhead"].append(time.perf_counter() - t0)
    return {k: round(min(v), 4) for k, v in cal.items()}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lineitem = os.path.join(sf_dir, "lineitem.parquet")
    spark = get_spark(app_name="r13-bench-drift-check")
    spark.sparkContext.setLogLevel("ERROR")

    calibrate(spark, lineitem)  # warm-up, discarded
    record: dict = {
        "kind": "r13_bench_drift_check_same_jvm",
        "threshold": {
            "ratio": bench.DEGRADED_RATIO,
            "min_kernels": bench.DEGRADED_MIN_KERNELS,
        },
    }
    ok = True
    for name, n_spin in REGIMES:
        spinners = [
            subprocess.Popen(
                [sys.executable, "-c", "while True:\n    pass"],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            for _ in range(n_spin)
        ]
        if spinners:
            time.sleep(2)
        try:
            before = calibrate(spark, lineitem)
            after = calibrate(spark, lineitem)
        finally:
            for p in spinners:
                p.send_signal(signal.SIGKILL)
        flags = bench.drift_flags(before, after)
        record[name] = {"before": before, "after": after, **flags}
        ok = ok and flags["host_degraded"] == EXPECT_DEGRADED[name]
        print(name, json.dumps(flags), flush=True)

    record["verdict"] = "PASS" if ok else "FAIL"
    print(json.dumps({"verdict": record["verdict"]}))

    smokes = ROOT / "smokes" / "r13.json"
    existing = json.loads(smokes.read_text()) if smokes.exists() else {}
    existing["bench_drift_check"] = record
    smokes.write_text(json.dumps(existing, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
