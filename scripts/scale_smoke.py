#!/usr/bin/env python
"""Scale-smoke: replicate the sf0.1 tables N× into /tmp and re-run the
headline aggregations plus the quadratic-prone near-dup/ANN queries,
printing wall times and growth ratios so scaling behavior (not just
absolute time) is visible.

Usage:  python scripts/scale_smoke.py [N]    # default N=10 (~6M lineitem)

Replica construction matters: texts are salted per-word per-replica
(cross-replica Jaccard = 0) and embeddings are circularly shifted
per-replica (cross-replica cosine ≈ random), so the TRUE near-dup pair
count grows linearly with N and any super-linear wall growth is the
ALGORITHM's, not planted by the data.

This is a manual diagnostic, not part of the test suite — it validates
that throughput grows with data volume (fixed overheads amortize) and
that no operator degrades super-linearly at 10× local scale.  Results
are appended to PROGRESS.jsonl as a {"kind": "scale_smoke", ...} line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kafkastreamsproject_spark.session import get_spark
from kafkastreamsproject_spark.sources.testdata import load_table


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale-smoke")
    out = tempfile.mkdtemp(prefix="scale_smoke_")

    for name, idcol in [("events", "event_id"), ("lineitem", "l_orderkey")]:
        base = load_table(spark, name, sf_dir)
        scaled = base
        for i in range(1, n):
            # shift ids so replicas don't collapse in distinct/grouped ops
            scaled = scaled.unionByName(
                base.withColumn(idcol, F.col(idcol) + F.lit(i * 100_000_000))
            )
        scaled.write.mode("overwrite").parquet(f"{out}/{name}")

    ev = spark.read.parquet(f"{out}/events")
    li = spark.read.parquet(f"{out}/lineitem")
    ev_rows, li_rows = ev.count(), li.count()

    t0 = time.perf_counter()
    ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.avg("value"), F.count(F.lit(1))
    ).count()
    t_agg = time.perf_counter() - t0

    t0 = time.perf_counter()
    li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity"), F.sum("l_extendedprice"), F.count(F.lit(1))
    ).count()
    t_q1 = time.perf_counter() - t0

    print(
        f"N={n}  events={ev_rows:,} rows → daily agg {t_agg:.2f}s "
        f"({ev_rows / t_agg / 1e6:.1f}M rows/s)  |  "
        f"lineitem={li_rows:,} rows → Q1-core {t_q1:.2f}s "
        f"({li_rows / t_q1 / 1e6:.1f}M rows/s)"
    )

    neardup = smoke_neardup(spark, sf_dir, n)
    record = {
        "kind": "scale_smoke",
        "ts": time.time(),
        "n": n,
        "events_rows_per_s": round(ev_rows / t_agg, 0),
        "lineitem_rows_per_s": round(li_rows / t_q1, 0),
        **neardup,
    }
    print(json.dumps(record))
    with open(Path(__file__).resolve().parent.parent / "PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")


def _scaled_corpus_dir(spark, sf_dir: str, n: int) -> str:
    """Write documents+embeddings replicated n× to a tmp sf-dir.

    Texts are per-word salted with the replica id so cross-replica
    shingle sets are disjoint; embeddings are circularly shifted by the
    replica id so cross-replica cosine looks random.  True near-dup
    structure therefore grows LINEARLY in n.
    """
    out = tempfile.mkdtemp(prefix=f"scale_smoke_sf_{n}x_")
    docs = load_table(spark, "documents", sf_dir)
    parts = []
    for i in range(n):
        salted = F.array_join(
            F.transform(
                F.split(F.trim(F.col("text")), " +"),
                lambda w: F.concat(w, F.lit(str(i))),
            ),
            " ",
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 100_000_000).alias("doc_id"),
                salted.alias("text"),
                "source",
            )
        )
    scaled_docs = parts[0]
    for p in parts[1:]:
        scaled_docs = scaled_docs.unionByName(p)
    scaled_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = load_table(spark, "embeddings", sf_dir)
    dim = len(emb.select("embedding").first().embedding)
    parts = []
    for i in range(n):
        shift = i % dim
        shifted = (
            F.concat(
                F.slice("embedding", shift + 1, dim - shift),
                F.slice("embedding", 1, shift),
            )
            if shift
            else F.col("embedding")
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + i * 100_000_000).alias("vec_id"),
                "label",
                shifted.alias("embedding"),
            )
        )
    scaled_emb = parts[0]
    for p in parts[1:]:
        scaled_emb = scaled_emb.unionByName(p)
    scaled_emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def smoke_neardup(spark, sf_dir: str, n: int) -> dict:
    """Wall-time growth of the quadratic-prone near-dup/ANN queries at
    1× vs n×, plus the Σ bucket² candidate-cost model for the LSH path
    at the default plane count and at the bucket-size-preserving count
    (+log2 n planes — the knob that keeps pair work linear at scale)."""
    import math

    from kafkastreamsproject_spark.functions import vectors as V
    from kafkastreamsproject_spark.operators.cache import release_persisted
    from kafkastreamsproject_spark.plans.dedup import dedup_clusters, minhash_lsh_pairs
    from kafkastreamsproject_spark.plans.similarity import ann_lsh_neardup

    out: dict = {}
    for label, factor in [("1x", 1), (f"{n}x", n)]:
        d = _scaled_corpus_dir(spark, sf_dir, factor)
        for qname, fn in [
            ("minhash_lsh_pairs", minhash_lsh_pairs),
            ("ann_lsh_neardup", ann_lsh_neardup),
            ("dedup_clusters", dedup_clusters),
        ]:
            release_persisted()
            t0 = time.perf_counter()
            rows = fn(spark, d).count()
            wall = time.perf_counter() - t0
            out[f"{qname}_{label}_s"] = round(wall, 2)
            out[f"{qname}_{label}_rows"] = rows
            print(f"  {qname} @{label}: {rows:,} rows in {wall:.2f}s", flush=True)

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        plane_counts = [V.N_PLANES]
        if factor > 1:
            plane_counts.append(V.N_PLANES + max(1, math.ceil(math.log2(factor))))
        for planes in plane_counts:
            sum_b2 = (
                emb.groupBy(V.lsh_bucket(F.col("embedding"), planes).alias("b"))
                .count()
                .agg(F.sum(F.col("count") * F.col("count")).alias("s"))
                .first()
                .s
            )
            out[f"sum_bucket2_{label}_p{planes}"] = int(sum_b2)
            print(f"  Σ bucket² @{label} planes={planes}: {sum_b2:,}", flush=True)
    for qname in ("minhash_lsh_pairs", "ann_lsh_neardup", "dedup_clusters"):
        out[f"{qname}_growth"] = round(
            out[f"{qname}_{n}x_s"] / max(out[f"{qname}_1x_s"], 1e-9), 2
        )
    return out


if __name__ == "__main__":
    main()
