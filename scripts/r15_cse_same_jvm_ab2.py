#!/usr/bin/env python
"""Same-JVM A/B for the r15 corpus2 mirror-CSE — second leg.

Covers the two oracle-checked dedup-family queries the first leg
(scripts/r15_cse_same_jvm_ab.py) did not: ``simhash_neardup`` and
``ngram_jaccard_pairs``.  Instead of reconstructing the old pipelines
inline, the PRE-change plans/dedup.py (pinned by git blob id, the
parent of the mirror-CSE commit) is materialized from git and imported
as a parallel module with the query registry swapped out during import
(duplicate names raise otherwise) — so A is literally the old code and
B the committed code, alternating A-B-A-B in one JVM (the r12 bench_ab
protocol: host drift hits both sides equally).

Each side: noop-sink wall (guide §1.4) and count() wall, N_RUNS
alternating rounds, min + all samples, scan canary before/after.
Persisted handles released between runs (the persist cost IS part of
the measured pipeline).

Writes /tmp/r15_cse_same_jvm_ab2.json and prints it.
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

#: pre-mirror-CSE plans/dedup.py (parent of the mirror-CSE commit)
OLD_DEDUP_BLOB = "9fccac0be3d1d8ecc0ebbb7a00a2c81d1b2d6ddf"

N_RUNS = int(os.environ.get("R15_AB_RUNS", "5"))
QUERIES = (
    sys.argv[1:] or ["simhash_neardup", "ngram_jaccard_pairs"]
)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _load_old_dedup():
    """Import the pre-change dedup module under a swapped registry."""
    src = subprocess.run(
        ["git", "-C", str(ROOT), "cat-file", "blob", OLD_DEDUP_BLOB],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    with tempfile.NamedTemporaryFile(
        "w", suffix="_dedup_old.py", delete=False
    ) as fh:
        fh.write(src)
        path = fh.name
    saved = R._REGISTRY, R._SHADOW
    R._REGISTRY, R._SHADOW = {}, {}
    try:
        spec = importlib.util.spec_from_file_location("dedup_old", path)
        mod = importlib.util.module_from_spec(spec)
        # the old module must resolve as part of the package for its
        # relative imports; it uses absolute package imports, so plain
        # exec works
        sys.modules["dedup_old"] = mod
        spec.loader.exec_module(mod)
        old_specs = {**R._REGISTRY, **R._SHADOW}
    finally:
        R._REGISTRY, R._SHADOW = saved
    return old_specs


def main() -> None:
    spark = get_spark(app_name="r15-cse-same-jvm-ab2")
    spark.sparkContext.setLogLevel("ERROR")
    old_specs = _load_old_dedup()
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
        "old_blob": OLD_DEDUP_BLOB,
        "canary_before": canary(),
    }
    for name in QUERIES:
        old_fn = old_specs[name].spark
        new_fn = new_specs[name].spark
        # sanity: identical results before timing anything
        o_rows = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
        n_rows = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
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
    with open("/tmp/r15_cse_same_jvm_ab2.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
