#!/usr/bin/env python
"""Same-JVM A/B for the r15 norm-CSE + pre-Expand aggregation changes.

Third leg of the r15 A/B series (protocol of r15_cse_same_jvm_ab2.py):
the PRE-change plans/similarity.py and plans/relational.py are
materialized from their pinned git blobs and imported as parallel
modules with the query registry swapped out during import, so A is
literally the old code and B the committed code, alternating A-B-A-B
in one JVM (host drift hits both sides equally).  Results are asserted
IDENTICAL at the benched scale factor before anything is timed.

Covers: ann_topk_cosine / ann_lsh_neardup / neardup_cosine_pairs
(cosine norm-CSE: one array pass per scored pair instead of three),
grouping_sets_revenue (pre-aggregate before the CUBE Expand),
approx_distinct_users (dedup-first, no multi-distinct Expand).

Writes /tmp/r15_norm_cse_ab.json and prints it.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kafkastreamsproject_spark.operators.cache import (  # noqa: E402
    release_persisted,
)
from kafkastreamsproject_spark.plans import registry as R  # noqa: E402
from kafkastreamsproject_spark.plans.registry import all_queries  # noqa: E402
from kafkastreamsproject_spark.session import get_spark  # noqa: E402

#: pre-change blobs (HEAD parents of the norm-CSE commit)
OLD_BLOBS = {
    "similarity_old": "d818ec531394d1c1b37a0f7280c30e64d71cfb7f",
    "relational_old": "0569162194a5182dec1dafeee2a4b0b8e3dbf304",
}

N_RUNS = int(os.environ.get("R15_AB_RUNS", "5"))
QUERIES = sys.argv[1:] or [
    "ann_lsh_neardup",
    "ann_topk_cosine",
    "neardup_cosine_pairs",
    "grouping_sets_revenue",
    "approx_distinct_users",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _load_old_specs() -> dict:
    """Import the pre-change modules under a swapped registry."""
    saved = R._REGISTRY, R._SHADOW
    R._REGISTRY, R._SHADOW = {}, {}
    try:
        for mod_name, blob in OLD_BLOBS.items():
            src = subprocess.run(
                ["git", "-C", str(ROOT), "cat-file", "blob", blob],
                check=True,
                capture_output=True,
                text=True,
            ).stdout
            with tempfile.NamedTemporaryFile(
                "w", suffix=f"_{mod_name}.py", delete=False
            ) as fh:
                fh.write(src)
                path = fh.name
            spec = importlib.util.spec_from_file_location(mod_name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[mod_name] = mod
            spec.loader.exec_module(mod)
        old_specs = {**R._REGISTRY, **R._SHADOW}
    finally:
        R._REGISTRY, R._SHADOW = saved
    return old_specs


def main() -> None:
    spark = get_spark(app_name="r15-norm-cse-ab")
    spark.sparkContext.setLogLevel("ERROR")
    old_specs = _load_old_specs()
    new_specs = {**all_queries(), **R.shadow_queries()}
    li = os.path.join(SF_DIR, "lineitem.parquet")

    def canary() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.read.parquet(li).selectExpr(
                "sum(l_quantity)", "sum(l_extendedprice)", "count(*)"
            ).collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    def run(df, action: str) -> float:
        t0 = time.perf_counter()
        if action == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        wall = time.perf_counter() - t0
        release_persisted()
        spark.catalog.clearCache()
        return wall

    out: dict = {
        "sf_dir": SF_DIR,
        "n_runs": N_RUNS,
        "old_blobs": OLD_BLOBS,
        "canary_before": canary(),
    }
    for name in QUERIES:
        old_fn = old_specs[name].spark
        new_fn = new_specs[name].spark
        # sanity: identical results before timing anything (key=repr —
        # subtotal rows carry None group values, not comparable to str)
        o_rows = sorted(map(tuple, old_fn(spark, SF_DIR).collect()), key=repr)
        n_rows = sorted(map(tuple, new_fn(spark, SF_DIR).collect()), key=repr)
        assert o_rows == n_rows, f"{name}: old/new results differ"
        release_persisted()
        spark.catalog.clearCache()
        rec: dict = {"rows": len(o_rows)}
        for action in ("noop", "count"):
            a_s, b_s = [], []
            for _ in range(N_RUNS):
                a_s.append(run(old_fn(spark, SF_DIR), action))
                b_s.append(run(new_fn(spark, SF_DIR), action))
            rec[f"old_{action}_min"] = round(min(a_s), 4)
            rec[f"new_{action}_min"] = round(min(b_s), 4)
            rec[f"old_{action}_all"] = [round(x, 4) for x in a_s]
            rec[f"new_{action}_all"] = [round(x, 4) for x in b_s]
            rec[f"{action}_ratio_new_over_old"] = round(
                min(b_s) / min(a_s), 3
            )
        out[name] = rec
    out["canary_after"] = canary()
    with open("/tmp/r15_norm_cse_ab.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
