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

#: the v2 normalization unit (BENCHNOTES.md): the lineitem scan-agg
#: kernel's fresh-JVM quiet min-of-3 at sf0.1, FROZEN at r12.  Dividing
#: by a constant keeps exactly the raw series' host-stability (the
#: measured-best of five candidates) while making the numbers unit-free;
#: the LIVE kernels in `calibration` are for diagnosing drift, never
#: for normalizing.
SCAN_ANCHOR_S = 0.2202

#: committed QUIET canary baselines for this box (r12's same-JVM A/B,
#: smokes/r12.json bench_ab.quiet.calibration — min-of-5 on an
#: otherwise-idle host).  These make BENCHNOTES.md's host-drift
#: decision rule MACHINE-CHECKED (VERDICT r12 #3): the official
#: BENCH_r12 window was degraded 1.5-2.6x on every canary and needed a
#: judge to interpret it; the flag below lets the artifact interpret
#: itself.
QUIET_CANARIES = {
    "range_sum_500m": 0.1074,
    "lineitem_scan_agg": 0.145,
    "shuffle_agg_30m": 1.4039,
    "job_overhead": 0.0871,
}
#: degraded-window signature (BENCHNOTES.md): canaries elevated on
#: BOTH sides of the sweep — so each kernel's ratio is min(before,
#: after)/quiet, and the window flags when most kernels sit clearly
#: above quiet.  1.35 splits the observed regimes: real degradations
#: measured 1.5-5x, quiet-window jitter <=1.25x.
DEGRADED_RATIO = 1.35
DEGRADED_MIN_KERNELS = 3


def drift_flags(cal_before: dict, cal_after: dict) -> dict:
    """Compare the live canaries against the committed quiet baselines
    and emit the host_degraded verdict + per-kernel ratios.  When NO
    canary could be measured (both calibrations errored out) the
    verdict is ``None`` — an unmeasurable window must read as UNKNOWN,
    never as a clean one (r13 ADVICE)."""
    ratios: dict[str, float] = {}
    for k, quiet in QUIET_CANARIES.items():
        vals = [
            c[k]
            for c in (cal_before, cal_after)
            if isinstance(c.get(k), (int, float))
        ]
        if vals:
            # both-sides elevation: even the BETTER side is above quiet
            ratios[k] = round(min(vals) / quiet, 3)
    elevated = sorted(k for k, r in ratios.items() if r >= DEGRADED_RATIO)
    return {
        "host_degraded": (
            None if not ratios else len(elevated) >= DEGRADED_MIN_KERNELS
        ),
        "worst_canary_ratio": max(ratios.values(), default=None),
        "canary_ratios_vs_quiet": ratios,
        "degraded_kernels": elevated,
    }

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
    # Self-describing core count (VERDICT r15 #1/#4): the r15 scaling
    # block was flagged suspect_cpus_ignored because nothing in the
    # output proved which master the run used — report the resolved
    # master and the env-derived cpu count in the JSON itself.
    master = spark.sparkContext.master
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
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

    # Calibration probes (VERDICT r8 #2, protocol v2 in r12 — VERDICT
    # r11 #1): fixed synthetic kernels whose cost depends ONLY on the
    # host.  r11 showed the v1 protocol manufactures phantom
    # regressions: the CPU-bound few-task probes sped up 17% with CPU
    # headroom while the sub-second headline queries are dominated by
    # fixed Spark job/stage overhead and 32-way stages — numerator and
    # denominator lived in different execution regimes, so any host
    # shift moved them by different factors.  The v2 denominator is a
    # REGIME-MATCHED kernel: a 32-partition two-stage shuffle aggregate
    # (map-side hash agg → Exchange → final agg), the exact physical
    # shape of the headline queries, sized to a comparable wall
    # (~0.4 s) so its overhead FRACTION matches theirs too.  Both
    # failure modes then cancel in the ratio: CPU headroom moves probe
    # and query compute together; sibling-job contention steals cores
    # from their (identical-width) stages together.  Measured BEFORE
    # and AFTER the query sweep, mean of the two min-of-3s, so a load
    # shift mid-run is averaged in instead of missed.  The v1 kernels
    # and a bare job-overhead probe stay reported as diagnostics.
    # See BENCHNOTES.md for the r10→r12 interpretation and the
    # quiet/busy A/B demonstrating the corrected spread.
    lineitem = os.path.join(sf_dir, "lineitem.parquet")

    def calibrate() -> dict[str, float]:
        samples: dict[str, list[float]] = {
            "range_sum_500m": [],
            "lineitem_scan_agg": [],
            "shuffle_agg_30m": [],
            "job_overhead": [],
        }
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(500_000_000).selectExpr("sum(id)").collect()
            samples["range_sum_500m"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            spark.read.parquet(lineitem).selectExpr(
                "sum(l_quantity)", "sum(l_extendedprice)", "count(*)"
            ).collect()
            samples["lineitem_scan_agg"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            (
                spark.range(0, 30_000_000, 1, 32)
                .selectExpr("pmod(id, 1000000) AS k", "id AS v")
                .groupBy("k")
                .agg({"v": "sum"})
                .selectExpr("count(*)", "sum(`sum(v)`)")
                .collect()
            )
            samples["shuffle_agg_30m"].append(time.perf_counter() - t0)
        for _ in range(5):
            t0 = time.perf_counter()
            spark.range(1).count()
            samples["job_overhead"].append(time.perf_counter() - t0)
        return {k: round(min(v), 4) for k, v in samples.items()}

    # Three timed runs per query, best-of reported: strips one-time plan
    # compilation and JIT noise so the number tracks the engine, not the
    # JVM's warm-up curve (whole-stage-codegen'd joins keep improving
    # through the second execution; run 3 is reliably steady-state).
    # Overridable for diagnostics (the r12 A/B uses 5 under contention,
    # where min-of-3 is scheduling luck).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    def run_sweep() -> dict:
        try:
            cal_before = calibrate()
        except Exception as e:  # a broken probe must never cost the record
            cal_before = {"error": f"{type(e).__name__}: {e}"[:200]}
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
        try:
            cal_after = calibrate()
        except Exception as e:
            cal_after = {"error": f"{type(e).__name__}: {e}"[:200]}
        return {
            "timings": timings,
            "means": means,
            "errors": errors,
            "cal_before": cal_before,
            "cal_after": cal_after,
            "flags": drift_flags(cal_before, cal_after),
        }

    # host-drift self-defense (VERDICT r12 #3): measure, flag, and —
    # when the window is degraded and SPARK_GRAFT_BENCH_RETRY=1 —
    # retry ONCE and keep the better-measured attempt (lower worst
    # canary ratio).  The retry is OPT-IN: it doubles the bench wall
    # to ~8 min, which risks a caller's timeout losing the WHOLE
    # record — a flagged degraded reading beats no reading.  The flag
    # travels in the JSON either way, so a degraded window is
    # machine-annotated rather than interpreted after the fact.
    attempt = run_sweep()
    retried = False
    if attempt["flags"]["host_degraded"] and os.environ.get(
        "SPARK_GRAFT_BENCH_RETRY", "0"
    ) == "1":
        second = run_sweep()
        retried = True
        first_summary = {
            "value": round(sum(attempt["timings"].values()), 4),
            **attempt["flags"],
        }
        w1 = attempt["flags"]["worst_canary_ratio"] or float("inf")
        w2 = second["flags"]["worst_canary_ratio"] or float("inf")
        if w2 <= w1:
            attempt = second
    timings = attempt["timings"]
    means = attempt["means"]
    errors = attempt["errors"]
    cal_before = attempt["cal_before"]
    cal_after = attempt["cal_after"]

    # v2 calibration value per kernel: mean of the before/after
    # min-of-3s (each min strips scheduler jitter; the mean absorbs a
    # load shift across the ~4-minute sweep)
    calibration: dict[str, float] = {}
    for k in (
        "range_sum_500m",
        "lineitem_scan_agg",
        "shuffle_agg_30m",
        "job_overhead",
    ):
        vals = [c[k] for c in (cal_before, cal_after) if k in c]
        if vals:
            calibration[k] = round(sum(vals) / len(vals), 4)

    # Opt-in scaling probe (VERDICT r15 #7): at sf0.1 every headline
    # wall is 0.2-1.3 s and dominated by fixed job/stage overhead, so
    # low-core/high-core ratios sit near 1.0 and read as "cores
    # ignored".  This leg times one shuffle-heavy synthetic kernel with
    # enough rows (10x the shuffle canary) that compute dominates
    # overhead and the core count is visible in the wall.  Opt-in
    # because it adds ~15-60 s to the bench wall; it never touches the
    # headline timings or totals.
    scaling_probe = None
    if os.environ.get("SPARK_GRAFT_SCALING_PROBE", "0") == "1":
        # Two kernels with fixed 64-way input splits so the work is
        # identical at any core count:
        # - cpu_md5_100m is COMPUTE-bound (one md5 per row) and is the
        #   cores-are-honored proof: measured 3.5 s at 32 cores vs
        #   7.8 s at 8 on this box (ratio 2.2).
        # - shuffle_agg_200m is the headline queries' physical shape
        #   (two-phase hash agg over an exchange); it is memory-
        #   bandwidth-bound on one box and measured only 1.34x at
        #   8-vs-32 cores — kept to document WHY the sub-second sf0.1
        #   walls cannot separate core counts (they share this
        #   regime, plus fixed job overhead).
        def _probe(label, fn, **meta):
            try:
                samples = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn()
                    samples.append(time.perf_counter() - t0)
                return {
                    "kernel": label,
                    "wall_s": round(min(samples), 4),
                    "runs": len(samples),
                    **meta,
                }
            except Exception as e:
                return {
                    "kernel": label,
                    "error": f"{type(e).__name__}: {e}"[:200],
                }

        scaling_probe = [
            _probe(
                "cpu_md5_100m_64part",
                lambda: spark.range(0, 100_000_000, 1, 64)
                .selectExpr(
                    "sum(conv(substr(md5(cast(id as string)), 1, 8), 16, 10))"
                )
                .collect(),
                rows=100_000_000,
                input_partitions=64,
            ),
            _probe(
                "shuffle_agg_200m_64part",
                lambda: spark.range(0, 200_000_000, 1, 64)
                .selectExpr("pmod(id, 2000000) AS k", "id AS v")
                .groupBy("k")
                .agg({"v": "sum"})
                .selectExpr("count(*)", "sum(`sum(v)`)")
                .collect(),
                rows=200_000_000,
                input_partitions=64,
            ),
        ]

    total = round(sum(timings.values()), 4)
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        # which engine this run actually used (VERDICT r15 #1): lets
        # the driver's scaling block attribute low-core vs high-core
        # runs without guessing
        "cpus": cpus,
        "master": master,
        # "queries" stays the per-query MIN of the 3 runs (steady-state
        # engine cost); "queries_mean" adds the arithmetic mean so
        # cross-round comparisons can separate host noise (min stable,
        # mean inflated) from a real plan regression (both shift) —
        # VERDICT r5 #5: this bench host has ~2x round-to-round variance.
        "queries": timings,
        "queries_mean": means,
        "sf": sf,
        "runs_per_query": runs,
        # host-drift normalizers: before/after min-of-3s + their mean
        "calibration": calibration,
        "calibration_before": cal_before,
        "calibration_after": cal_after,
        # machine-checked drift verdict vs the committed quiet
        # baselines (BENCHNOTES.md decision rule): host_degraded=true
        # means >=3 of the 4 canaries sat >=1.35x quiet on BOTH sides
        # of the sweep — the raw total is a host reading, not a code
        # reading; null means NO canary could be measured (verdict
        # unknown, not clean)
        **attempt["flags"],
        "quiet_canaries": QUIET_CANARIES,
        "normalized_protocol": (
            "v2-anchored (r12): raw / frozen scan-kernel unit "
            f"({SCAN_ANCHOR_S} s @ sf0.1); live probes are drift "
            "diagnostics only — see BENCHNOTES.md"
        ),
    }
    # normalized series v2 (VERDICT r11 #1): each headline min divided
    # by a FROZEN anchor — the r12 fresh-JVM quiet value of the scan
    # kernel — so the series is the raw walls in a stable, unit-free
    # scale.  Four live-denominator candidates were tried and measured
    # WORSE (smokes/r12.json bench_ab + bench_ab_attempts): the
    # headline min-of-N walls are themselves the most host-stable
    # quantity (median quiet/busy spread 7.5% in the same-JVM A/B, and
    # stable across the r10->r11 host shift that made v1 manufacture a
    # phantom +16%), while every live probe swings in at least one
    # regime.  Host drift is DIAGNOSED from the calibration block (see
    # BENCHNOTES.md's decision rule), never divided into the series.
    if sf == 0.1:  # the anchor is sf0.1-specific
        result["normalized"] = {
            k: round(v / SCAN_ANCHOR_S, 3) for k, v in timings.items()
        }
        result["normalized_total"] = round(total / SCAN_ANCHOR_S, 3)
    # The legacy normalized_v1 series (raw / live scan-probe, r9-r11
    # continuity) was DROPPED in r16: the one-line JSON had grown long
    # enough that the driver's tail-capture failed to parse BENCH_r14
    # (PERF_r15 lost its whole round-over-round comparison to it), and
    # BENCHNOTES.md already documents v1 as misleading under host
    # drift.  Slimming the line is VERDICT r15 "Next round" #1.
    if scaling_probe is not None:
        result["scaling_probe"] = scaling_probe
    if retried:
        result["retried_after_degraded_window"] = True
        result["first_attempt"] = first_summary
    if errors:
        # surfaced, not fatal — the driver still gets every good timing,
        # and the error text says exactly which query to fix
        result["errors"] = errors
    # Stop the JVM BEFORE printing so the JSON is guaranteed to be the
    # final stdout line a tail-capture sees (Spark logs go to stderr,
    # but shutdown is the one phase that could interleave) — VERDICT
    # r15 #1.
    try:
        spark.stop()
    except Exception:
        pass
    print(json.dumps(result))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
