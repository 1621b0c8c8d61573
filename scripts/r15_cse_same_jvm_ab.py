#!/usr/bin/env python
"""Same-JVM A/B for the r15 corpus2 mirror-CSE (the r12 bench_ab
protocol: both variants in one process, runs alternating A-B-A-B, so
host drift hits both sides equally).

A = the pre-r15 union pipeline, reconstructed inline (verbatim from the
    pre-change plans/dedup.py).
B = the committed mirror-CSE pipeline (imported from the package).

Each side: noop-sink wall (guide §1.4 — every column computed) and the
bench count() wall, N_RUNS alternating rounds, min + all samples
reported, scan canary before/after.  Persisted handles are released
between runs so every run re-materializes its own cache (the persist
cost IS part of the pipeline being measured).

Writes /tmp/r15_cse_same_jvm_ab.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F, Window as W  # noqa: E402

from kafkastreamsproject_spark.functions import hashing as H  # noqa: E402
from kafkastreamsproject_spark.functions import text as TX  # noqa: E402
from kafkastreamsproject_spark.operators.cache import (  # noqa: E402
    release_persisted,
    scoped_persist,
)
from kafkastreamsproject_spark.plans import dedup as D  # noqa: E402
from kafkastreamsproject_spark.plans.registry import all_queries  # noqa: E402
from kafkastreamsproject_spark.session import get_spark  # noqa: E402
from kafkastreamsproject_spark.sources.testdata import (  # noqa: E402
    fan_out,
    load_table,
)

N_RUNS = 5
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ---- A side: the pre-r15 union pipelines, verbatim -----------------------


def _corpus2_union(spark):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    copy = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return docs.unionAll(copy)


def _shingled_corpus2_union(spark):
    c2 = fan_out(_corpus2_union(spark))
    sh = TX.shingles(F.col("text"), D._SHINGLE_W)
    return (
        c2.filter(F.size(TX.tokens(F.col("text"))) >= D._SHINGLE_W)
        .select("doc_id", H.hash_list(sh).alias("hs"))
    )


def minhash_old(spark):
    sigs = scoped_persist(
        _shingled_corpus2_union(spark).select(
            "doc_id",
            F.array_distinct("hs").alias("hset"),
            H.minhash_signature_array(F.col("hs")).alias("mhs"),
        )
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.col("mhs")[2 * b].alias("h1"),
                F.col("mhs")[2 * b + 1].alias("h2"),
            )
            for b in range(D._N_BANDS)
        ]
    )
    bands = sigs.select(
        "doc_id", F.explode(band_structs).alias("band")
    ).select("doc_id", "band.band_id", "band.h1", "band.h2")
    a = bands.select(F.col("doc_id").alias("id_a"), "band_id", "h1", "h2")
    b = bands.select(
        F.col("doc_id").alias("id_b"),
        F.col("band_id").alias("band_id_b"),
        F.col("h1").alias("h1_b"),
        F.col("h2").alias("h2_b"),
    )
    cands = (
        a.join(
            b,
            (F.col("band_id") == F.col("band_id_b"))
            & (F.col("h1") == F.col("h1_b"))
            & (F.col("h2") == F.col("h2_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("hset").alias("h_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("hset").alias("h_b"))
    inter = F.size(F.array_intersect("h_a", "h_b"))
    jac = inter / (F.size("h_a") + F.size("h_b") - inter).cast("double")
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= D._MINHASH_JACCARD_T)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def keep_first_old(spark):
    c2 = _corpus2_union(spark)
    w = W.partitionBy(TX.exact_fingerprint(F.col("text"))).orderBy("doc_id")
    return (
        c2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )


def main() -> None:
    spark = get_spark(app_name="r15-cse-same-jvm-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
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

    pairs = {
        "minhash_lsh_pairs": (
            minhash_old,
            lambda s: specs["minhash_lsh_pairs"].spark(s, SF_DIR),
        ),
        "dedup_exact_keep_first": (
            keep_first_old,
            lambda s: specs["dedup_exact_keep_first"].spark(s, SF_DIR),
        ),
    }

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

    out: dict = {"sf_dir": SF_DIR, "n_runs": N_RUNS, "canary_before": canary()}
    for name, (old_fn, new_fn) in pairs.items():
        # one warm round per side (plan compilation + JIT), unrecorded
        run(old_fn(spark), "noop")
        run(new_fn(spark), "noop")
        rec: dict = {}
        for action in ("noop", "count"):
            a_s, b_s = [], []
            for _ in range(N_RUNS):
                a_s.append(run(old_fn(spark), action))
                b_s.append(run(new_fn(spark), action))
            rec[f"old_{action}_min"] = round(min(a_s), 4)
            rec[f"new_{action}_min"] = round(min(b_s), 4)
            rec[f"old_{action}_all"] = [round(x, 4) for x in a_s]
            rec[f"new_{action}_all"] = [round(x, 4) for x in b_s]
            rec[f"{action}_ratio_new_over_old"] = round(
                min(b_s) / min(a_s), 3
            )
        out[name] = rec
    out["canary_after"] = canary()
    with open("/tmp/r15_cse_same_jvm_ab.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
