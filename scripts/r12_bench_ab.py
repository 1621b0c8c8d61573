#!/usr/bin/env python
"""Quiet/busy A/B for the bench normalization protocol (VERDICT r11 #1).

Measures the 14 headline queries and every calibration kernel under
two host regimes — quiet, then with N CPU spinners stealing ~1/3 of
the cores — IN THE SAME JVM.  Earlier attempts ran ``bench.py`` twice
as subprocesses and were dominated by JVM-to-JVM luck (identical-code
quiet totals varied 6.45–7.55 s across fresh JVMs, a ±10–15% noise
floor that swamps any protocol effect); same-JVM A/B isolates the one
variable under test: host load.

For each candidate denominator (raw = none, job_overhead, the v1
scan/range kernels, the 32-way shuffle kernel) it reports the
per-query quiet/busy spread |q−b| / mean of the normalized values, so
the protocol choice is a measurement, not an argument.  Attempt
history (what was tried and why it was rejected) lives in
``smokes/r12.json`` under ``bench_ab_attempts``.

Manual diagnostic — not part of the test suite.
"""

from __future__ import annotations

import json
import os
import signal
import statistics
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

N_SPINNERS = 12  # ~1/3 core theft: the realistic sibling-job load
RUNS = 5  # min-of-5: under contention min-of-3 is scheduling luck

from kafkastreamsproject_spark.plans.registry import all_queries  # noqa: E402
from kafkastreamsproject_spark.session import get_spark  # noqa: E402

from bench import BENCH_QUERIES  # noqa: E402


def measure(spark, specs, names, sf_dir) -> dict:
    import bench  # reuse the exact calibration kernels

    out: dict = {"queries": {}}
    for name in names:
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            specs[name].spark(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        out["queries"][name] = round(min(samples), 4)

    lineitem = os.path.join(sf_dir, "lineitem.parquet")
    cal: dict[str, list[float]] = {
        "range_sum_500m": [],
        "lineitem_scan_agg": [],
        "shuffle_agg_30m": [],
        "job_overhead": [],
    }
    from pyspark.sql import functions as F  # noqa: F401

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
    out["calibration"] = {k: round(min(v), 4) for k, v in cal.items()}
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r12-bench-ab")
    specs = all_queries()
    names = [n for n in BENCH_QUERIES if n in specs]

    print("== warm-up sweep (discarded) ==", flush=True)
    for name in names:
        try:
            specs[name].spark(spark, sf_dir).count()
        except Exception:
            pass

    print("== quiet measurement ==", flush=True)
    quiet = measure(spark, specs, names, sf_dir)

    print(f"== busy measurement ({N_SPINNERS} spinners) ==", flush=True)
    spinners = [
        subprocess.Popen(
            [sys.executable, "-c", "while True:\n    pass"],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for _ in range(N_SPINNERS)
    ]
    time.sleep(2)
    try:
        busy = measure(spark, specs, names, sf_dir)
    finally:
        for p in spinners:
            p.send_signal(signal.SIGKILL)

    denominators = ["raw"] + sorted(quiet["calibration"])
    spreads_by_denom: dict[str, dict] = {}
    for denom in denominators:
        dq = 1.0 if denom == "raw" else quiet["calibration"][denom]
        db = 1.0 if denom == "raw" else busy["calibration"][denom]
        per_q = {}
        for n in names:
            nq, nb = quiet["queries"][n] / dq, busy["queries"][n] / db
            m = (nq + nb) / 2
            per_q[n] = round(abs(nq - nb) / m, 4) if m else 0.0
        vals = list(per_q.values())
        spreads_by_denom[denom] = {
            "median_spread": round(statistics.median(vals), 4),
            "max_spread": round(max(vals), 4),
            "per_query": per_q,
        }
        print(
            f"  denom={denom:>18}: median {spreads_by_denom[denom]['median_spread']:.3f}"
            f"  max {spreads_by_denom[denom]['max_spread']:.3f}",
            flush=True,
        )

    result = {
        "kind": "r12_bench_ab_same_jvm",
        "spinners": N_SPINNERS,
        "runs_per_query": RUNS,
        "quiet": quiet,
        "busy": busy,
        "spreads_by_denominator": {
            k: {kk: vv for kk, vv in v.items() if kk != "per_query"}
            for k, v in spreads_by_denom.items()
        },
        "per_query_spread_raw": spreads_by_denom["raw"]["per_query"],
        "per_query_spread_shuffle": spreads_by_denom["shuffle_agg_30m"][
            "per_query"
        ],
    }
    print(json.dumps(result["spreads_by_denominator"], indent=2))

    target = ROOT / "smokes" / "r12.json"
    existing = json.loads(target.read_text()) if target.exists() else {}
    existing["bench_ab"] = result
    target.write_text(json.dumps(existing, indent=2) + "\n")
    with open(ROOT / "PROGRESS.jsonl", "a") as f:
        f.write(
            json.dumps(
                {
                    "kind": "r12_bench_ab_summary",
                    "spreads": result["spreads_by_denominator"],
                }
            )
            + "\n"
        )


if __name__ == "__main__":
    main()
