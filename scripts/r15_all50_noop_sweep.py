#!/usr/bin/env python
"""Time EVERY declared (primary) query at sf0.1 with the noop sink.

The official bench times 14 headline queries; the other declared
queries had only plan-shape audits (PLANS.md) until now.  This sweep
gives each one a measured wall (noop sink per guide §1.4 — every
column of every row computed, output discarded), min-of-N, labeled
jobs, one JVM, with the bench's live canaries before and after so the
window is self-describing.  Output: JSON on stdout.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    spark = get_spark(app_name="r15-all50-noop-sweep")
    sc = spark.sparkContext
    specs = all_queries()
    lineitem = os.path.join(SF_DIR, "lineitem.parquet")

    def canary() -> float:
        t0 = time.perf_counter()
        spark.read.parquet(lineitem).selectExpr(
            "sum(l_quantity)", "sum(l_extendedprice)", "count(*)"
        ).collect()
        return round(time.perf_counter() - t0, 4)

    # JVM warm-up (plan compilation + codegen) before any timing
    try:
        specs["daily_agg"].spark(spark, SF_DIR).count()
    except Exception:
        pass
    cal_before = min(canary() for _ in range(3))

    walls: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(specs):
        sc.setJobDescription(f"all50: {name}")
        samples: list[float] = []
        try:
            for _ in range(RUNS):
                df = specs[name].spark(spark, SF_DIR)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            walls[name] = round(min(samples), 4)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        sc.setJobDescription(None)
    cal_after = min(canary() for _ in range(3))

    print(json.dumps({
        "kind": "all-declared-queries noop walls, min-of-%d" % RUNS,
        "sf_dir": SF_DIR,
        "canary_lineitem_scan_agg": {"before": cal_before,
                                     "after": cal_after,
                                     "quiet_baseline": 0.145},
        "walls": dict(sorted(walls.items(), key=lambda kv: -kv[1])),
        "errors": errors,
    }))


if __name__ == "__main__":
    main()
