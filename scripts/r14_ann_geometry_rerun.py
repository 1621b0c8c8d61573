#!/usr/bin/env python
"""Re-run of the r13 ANN geometry growth smoke under the r14 code —
same corpus, same legs, same JVM discipline (the r13 script's
build_and_query is imported and reused verbatim) — so the 10×-growth
query-wall ratio reflects this round's serving path: corpus-sized
geometry by default, bucket-aligned appends (fold walls no longer
track directory size), per-store codebook broadcast, and the
vectorized top-nprobe probe assignment on the query side at large C.
Results merge into ``smokes/r14.json`` under ``ann_geometry_r14``;
the r13 record stays untouched for comparison.  Manual diagnostic —
not part of the suite.
"""

from __future__ import annotations

import importlib.util
import json
import shutil
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

spec = importlib.util.spec_from_file_location(
    "r13_ann_geometry_smoke", ROOT / "scripts" / "r13_ann_geometry_smoke.py"
)
R13 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(R13)

from kafkastreamsproject_spark.session import get_spark  # noqa: E402
from kafkastreamsproject_spark.streaming.annindex import (  # noqa: E402
    default_geometry,
    sized_geometry,
)


def main() -> None:
    spark = get_spark(app_name="r14-ann-geometry-rerun")
    spark.sparkContext.setLogLevel("ERROR")
    td = tempfile.mkdtemp(prefix="r14_ann_geo_")

    R13.build_and_query(spark, td, "warm", 5_000, default_geometry())

    legs: dict[str, dict] = {}
    for name, sized in (("frozen_c8", False), ("sized_sqrtN", True)):
        for scale, total in (("1x", R13.N_1X), ("10x", R13.N_10X)):
            geo = sized_geometry(total) if sized else default_geometry()
            legs[f"{name}_{scale}"] = R13.build_and_query(
                spark, td, f"{name}_{scale}", total, geo
            )
            print(f"{name}_{scale}:", json.dumps(legs[f"{name}_{scale}"]),
                  flush=True)

    record = {
        "kind": "r14_ann_geometry_rerun_same_jvm",
        "code": "r14: aligned appends + codebook broadcast + vectorized "
                "probe assignment (query side) at C > 64",
        "legs": legs,
        "query_wall_ratio_10x_over_1x": {
            n: round(
                legs[f"{n}_10x"]["query_wall_s"]
                / legs[f"{n}_1x"]["query_wall_s"],
                2,
            )
            for n in ("frozen_c8", "sized_sqrtN")
        },
        "sized_10x_faster_than_frozen_10x": (
            legs["sized_sqrtN_10x"]["query_wall_s"]
            < legs["frozen_c8_10x"]["query_wall_s"]
        ),
    }
    print(json.dumps(record["query_wall_ratio_10x_over_1x"]), flush=True)

    shutil.rmtree(td, ignore_errors=True)
    smokes = ROOT / "smokes" / "r14.json"
    existing = json.loads(smokes.read_text()) if smokes.exists() else {}
    existing["ann_geometry_r14"] = record
    smokes.write_text(json.dumps(existing, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
