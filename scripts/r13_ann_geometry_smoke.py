#!/usr/bin/env python
"""ANN serving-index geometry smoke (VERDICT r12 #1).

r12 froze ``C_CELLS = 8`` as a module constant, so every query
ADC-scored a fixed nprobe/C = 25% of the corpus — O(N) by
construction (r12's own smoke: query wall 2.11 → 4.25 s across 10×
growth).  r13 made geometry a store-creation parameter persisted in
the ``_ann_meta.json`` sidecar with the **C ≈ √N** sizing rule
(``sized_geometry``): candidates per query ≈ nprobe·N/C ≈ nprobe·√N.

This smoke builds the SAME synthetic corpus at 1× and 10× under both
geometries in one JVM:

- ``frozen_c8`` — the r12 default (C=8, nprobe=2): candidate set is
  25% of the corpus, so query work grows ~10× with the corpus;
- ``sized_sqrtN`` — C ≈ √N per scale: candidate set ≈ 2·√N, so query
  work grows ~√10 ≈ 3.2×.

Reported per leg: per-epoch fold walls (flatness), the min-of-3
query wall at each scale, the wall ratio across the 10× growth, and
the analytic candidates-per-query (nprobe·N/C).  Expected: the sized
legs' query-wall ratio is decisively below the frozen legs', and the
10× sized query is faster in absolute terms than the 10× frozen one.
Results merge into ``smokes/r13.json``.  Manual diagnostic — not part
of the test suite.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from kafkastreamsproject_spark.session import get_spark  # noqa: E402
from kafkastreamsproject_spark.sources.bucketed import (  # noqa: E402
    max_files_per_bucket,
    store_table_name,
)
from kafkastreamsproject_spark.streaming.annindex import (  # noqa: E402
    ann_ingest_batch,
    ann_query_index,
    compact_codes,
    create_ann_store,
    default_geometry,
    sized_geometry,
)

EPOCHS = 5
N_1X = 20_000
N_10X = 200_000


def emb(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: (
                F.pmod(F.hash(F.col("id") * 31 + i), F.lit(1000)) / 1000.0
            ).cast("float"),
        ).alias("embedding"),
    )


def _wall3(fn) -> float:
    return round(min(_wall1(fn) for _ in range(3)), 3)


def _wall1(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def build_and_query(spark, td: str, tag: str, total: int, geo: dict) -> dict:
    store = f"{td}/{tag}"
    create_ann_store(spark, store, emb(spark, 0, total), **geo)
    per = total // EPOCHS
    walls = []
    for e in range(EPOCHS):
        t0 = time.perf_counter()
        ann_ingest_batch(emb(spark, e * per, (e + 1) * per), store)
        walls.append(round(time.perf_counter() - t0, 2))
        # the adaptive trigger the streaming sink applies (storeconfig
        # compact_files_per_bucket): without it the smoke's walls climb
        # with append-log file count, measuring the filesystem instead
        # of the fold
        if max_files_per_bucket(spark, f"{store}/codes") > 4:
            compact_codes(spark, store)
    compact_codes(spark, store)
    qwall = _wall3(
        lambda: ann_query_index(
            spark, store, emb(spark, 0, 10), k=5, nprobe=2
        ).count()
    )
    for prefix, sub in (("ann_codes", "codes"), ("ann_seen", "seen")):
        spark.sql(
            "DROP TABLE IF EXISTS " + store_table_name(prefix, f"{store}/{sub}")
        )
    return {
        "n_vectors": total,
        "geometry": geo,
        "fold_walls_s": walls,
        "query_wall_s": qwall,
        "candidates_per_query": round(2 * total / geo["c_cells"]),
    }


def main() -> None:
    spark = get_spark(app_name="r13-ann-geometry-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    td = tempfile.mkdtemp(prefix="r13_ann_geo_")

    # warm-up (discarded)
    build_and_query(spark, td, "warm", 5_000, default_geometry())

    legs: dict[str, dict] = {}
    for name, sized in (("frozen_c8", False), ("sized_sqrtN", True)):
        for scale, total in (("1x", N_1X), ("10x", N_10X)):
            geo = sized_geometry(total) if sized else default_geometry()
            legs[f"{name}_{scale}"] = build_and_query(
                spark, td, f"{name}_{scale}", total, geo
            )
            print(f"{name}_{scale}: {json.dumps(legs[f'{name}_{scale}'])}",
                  flush=True)

    record = {
        "kind": "r13_ann_geometry_same_jvm",
        "legs": legs,
        "query_wall_ratio_10x_over_1x": {
            "frozen_c8": round(
                legs["frozen_c8_10x"]["query_wall_s"]
                / legs["frozen_c8_1x"]["query_wall_s"],
                2,
            ),
            "sized_sqrtN": round(
                legs["sized_sqrtN_10x"]["query_wall_s"]
                / legs["sized_sqrtN_1x"]["query_wall_s"],
                2,
            ),
        },
        "sized_10x_faster_than_frozen_10x": (
            legs["sized_sqrtN_10x"]["query_wall_s"]
            < legs["frozen_c8_10x"]["query_wall_s"]
        ),
    }
    print(json.dumps(record["query_wall_ratio_10x_over_1x"]), flush=True)

    import shutil

    shutil.rmtree(td, ignore_errors=True)
    smokes = ROOT / "smokes" / "r13.json"
    existing = json.loads(smokes.read_text()) if smokes.exists() else {}
    existing["ann_geometry"] = record
    smokes.write_text(json.dumps(existing, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
