#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (count + a cheap checksum action via
``write.format('noop')``-style collapse: we use ``df.foreach``-free
``count()`` over the final plan, which forces every operator) and timed
wall-clock.  The benchmark set is the scan/join/agg-heavy subset — the
queries with real row volume at sf0.1.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafkastreamsproject_spark.plans.registry import all_queries
from kafkastreamsproject_spark.session import get_spark

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "daily_agg",
    "enrich_join",
    "windowed_counts",
    "anomaly_detect",
    "sessionization",
    "top3_orders_per_customer",
    "dedup_exact_keep_first",
    "minhash_lsh_pairs",
    "ann_topk_cosine",
    # added in r2: Expand (grouping-set rollup) and window-shuffle
    # (quota sampling) plan shapes the original 12 didn't exercise
    "time_rollup",
    "stratified_sample",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="kafkastreamsproject_spark-bench")
    specs = all_queries()
    names = [n for n in BENCH_QUERIES if n in specs]

    # Warm the JVM + parquet footers once so timings measure the engine.
    # (Inside the guard: round 4 lost its ENTIRE perf record to one
    # AnalysisException raised at plan build — one bad query must cost
    # one null entry, never the whole JSON line.)
    try:
        specs[names[0]].spark(spark, sf_dir).count()
    except Exception:
        pass

    # Calibration probe (VERDICT r8 #2): two fixed synthetic kernels
    # whose cost depends ONLY on the host — a pure-CPU range sum (JVM /
    # codegen throughput) and a raw parquet scan-agg (I/O + decode
    # throughput).  Neither touches engine code, so a cross-round shift
    # in these numbers is machine/JVM drift by construction; dividing a
    # headline timing by the probe separates host noise from a real
    # plan regression (r8's uniform 1.42x inflation on untouched code
    # was exactly this, but the record couldn't prove it).
    calibration: dict[str, float] = {}
    try:
        cal_samples: dict[str, list[float]] = {"range_sum_500m": [],
                                               "lineitem_scan_agg": []}
        lineitem = os.path.join(sf_dir, "lineitem.parquet")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(500_000_000).selectExpr("sum(id)").collect()
            cal_samples["range_sum_500m"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            spark.read.parquet(lineitem).selectExpr(
                "sum(l_quantity)", "sum(l_extendedprice)", "count(*)"
            ).collect()
            cal_samples["lineitem_scan_agg"].append(time.perf_counter() - t0)
        calibration = {k: round(min(v), 4) for k, v in cal_samples.items()}
    except Exception as e:  # a broken probe must never cost the record
        calibration = {"error": f"{type(e).__name__}: {e}"[:200]}

    # Three timed runs per query, best-of reported: strips one-time plan
    # compilation and JIT noise so the number tracks the engine, not the
    # JVM's warm-up curve (whole-stage-codegen'd joins keep improving
    # through the second execution; run 3 is reliably steady-state).
    runs = 3
    timings: dict[str, float] = {}
    means: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        samples: list[float] = []
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                specs[name].spark(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(min(samples), 4)
            means[name] = round(sum(samples) / len(samples), 4)
        except Exception as e:  # record and keep benchmarking the rest
            errors[name] = f"{type(e).__name__}: {e}"[:300]

    total = round(sum(timings.values()), 4)
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        # "queries" stays the per-query MIN of the 3 runs (steady-state
        # engine cost); "queries_mean" adds the arithmetic mean so
        # cross-round comparisons can separate host noise (min stable,
        # mean inflated) from a real plan regression (both shift) —
        # VERDICT r5 #5: this bench host has ~2x round-to-round variance.
        "queries": timings,
        "queries_mean": means,
        "sf": sf,
        "runs_per_query": runs,
        # host-drift normalizer: compare headline timings ACROSS rounds
        # only after dividing by these (min-of-3, fixed kernels)
        "calibration": calibration,
    }
    # r9 verdict #3: emit the normalized series directly so drift vs
    # plan regression is a one-line read — each headline min divided by
    # the parquet scan-agg probe (same host, same JVM, same run).  A
    # machine-speed shift moves raw and probe together (normalized
    # stable); a plan regression moves only the raw (normalized jumps).
    scan_probe = calibration.get("lineitem_scan_agg")
    if isinstance(scan_probe, float) and scan_probe > 0:
        result["normalized"] = {
            k: round(v / scan_probe, 3) for k, v in timings.items()
        }
        result["normalized_total"] = round(total / scan_probe, 3)
    if errors:
        # surfaced, not fatal — the driver still gets every good timing,
        # and the error text says exactly which query to fix
        result["errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    main()
