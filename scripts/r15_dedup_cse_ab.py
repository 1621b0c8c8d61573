#!/usr/bin/env python
"""A/B harness for the r15 corpus2 mirror-CSE change (dedup family).

Usage:  python scripts/r15_dedup_cse_ab.py <tag> [query ...]

For each named query (default: the two benched dedup-family queries plus
the oracle-checked near-dup siblings) this:

- times the bench action (``count()``) min-of-3 at $SPARK_GRAFT_SF_DIR
  (default sf0.1), with the lineitem scan-agg canary before and after so
  the window quality travels with the record;
- times the noop-sink wall (guide §1.4) min-of-3;
- snapshots the FULL sorted result rows to
  /tmp/r15_cse_<tag>_<query>.json so two runs of this script (before and
  after the change) can be diffed for bit-identical output;
- writes timings to /tmp/r15_cse_<tag>_timings.json.

The diff of the <before>/<after> snapshot files is the sf0.1 equivalence
proof (the sf0.001/sf0.01 proof is the oracle suite).
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

DEFAULT_QUERIES = [
    "minhash_lsh_pairs",
    "dedup_exact_keep_first",
    "dedup_exact_groups",
    "simhash_neardup",
    "ngram_jaccard_pairs",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"r15-cse-ab-{tag}")
    specs = all_queries()

    def canary() -> float:
        li = os.path.join(sf_dir, "lineitem.parquet")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.read.parquet(li).selectExpr(
                "sum(l_quantity)", "sum(l_extendedprice)", "count(*)"
            ).collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    out: dict = {"tag": tag, "sf_dir": sf_dir, "canary_before": canary()}
    for name in names:
        spec = specs[name]
        # warm plan + JIT once, then min-of-3 for each action
        spec.spark(spark, sf_dir).count()
        walls, noops = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
        for _ in range(3):
            df = spec.spark(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            noops.append(time.perf_counter() - t0)
        out[name] = {
            "count_min": round(min(walls), 4),
            "noop_min": round(min(noops), 4),
        }
        rows = [
            [None if v is None else v for v in r]
            for r in spec.spark(spark, sf_dir).collect()
        ]
        rows.sort(key=lambda r: json.dumps(r, default=str))
        snap = f"/tmp/r15_cse_{tag}_{name}.json"
        with open(snap, "w") as fh:
            json.dump(rows, fh, default=str)
        out[name]["rows"] = len(rows)
    out["canary_after"] = canary()
    with open(f"/tmp/r15_cse_{tag}_timings.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
