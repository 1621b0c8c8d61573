#!/usr/bin/env python
"""BM25 df-cap term-skew smoke (VERDICT r12 #2, second half).

Builds a Zipf-skewed synthetic corpus — every doc carries the
stopwords ``the of and`` plus rank-skewed mid-frequency terms and one
rare term — and folds it through the incremental index twice in one
JVM: uncapped, then with ``df_cap=256``.  Reports, per leg:

- the postings stores' per-bucket ROW counts (the hot-term buckets
  are the stopword buckets; the cap must flatten them),
- the max single-term posting-list length (uncapped ≈ corpus size;
  capped ≤ df_cap),
- fold walls and the wall of a query probing one stopword + one rare
  term (the 100 TB straggler shape: the ``the``-bucket read bounds
  the probe).

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
    store_table_name,
)
from kafkastreamsproject_spark.streaming.bm25index import (  # noqa: E402
    index_ingest_batch,
    query_index,
    read_postings,
)

N_DOCS = 200_000
EPOCHS = 4
DF_CAP = 256
N_BUCKETS = 8


def corpus(spark, lo, hi):
    """Zipf-ish: 3 stopwords in EVERY doc (df = corpus size), a
    mid-frequency term per doc_id%100 band (df ≈ N/100), and a
    doc-unique rare term."""
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("the of and"),
            F.concat(F.lit("mid"), (F.col("id") % 100).cast("string")),
            F.concat(F.lit("rare"), F.col("id").cast("string")),
        ).alias("text"),
    )


def bucket_rows(spark, path: str) -> dict:
    """Postings ROW count per bucket id (pmod(hash(t), n))."""
    rows = (
        spark.read.parquet(path)
        .groupBy(F.pmod(F.hash("t"), F.lit(N_BUCKETS)).alias("b"))
        .count()
        .collect()
    )
    return {int(r.b): int(r["count"]) for r in rows}


def build(spark, td: str, tag: str, df_cap) -> dict:
    store = f"{td}/{tag}"
    per = N_DOCS // EPOCHS
    walls = []
    for e in range(EPOCHS):
        t0 = time.perf_counter()
        index_ingest_batch(
            corpus(spark, e * per, (e + 1) * per), store, df_cap=df_cap
        )
        walls.append(round(time.perf_counter() - t0, 2))
    posts = read_postings(spark, store)
    hot = (
        posts.groupBy("t")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()[0]
    )
    t0 = time.perf_counter()
    n_hits = query_index(spark, store, ("the", "rare17")).count()
    q_wall = round(time.perf_counter() - t0, 3)
    out = {
        "df_cap": df_cap,
        "fold_walls_s": walls,
        "postings_rows": posts.count(),
        "max_posting_list": {"t": hot.t, "rows": int(hot["count"])},
        "per_bucket_rows": bucket_rows(spark, f"{store}/postings"),
        "stopword_plus_rare_query_wall_s": q_wall,
        "query_docs_scored": n_hits,
    }
    for prefix, sub in (
        ("bm25_postings", "postings"),
        ("bm25_seen", "seen"),
    ):
        spark.sql(
            "DROP TABLE IF EXISTS "
            + store_table_name(prefix, f"{store}/{sub}")
        )
    return out


def main() -> None:
    spark = get_spark(app_name="r13-bm25-dfcap-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    td = tempfile.mkdtemp(prefix="r13_dfcap_")

    # warm-up (discarded)
    build(spark, td, "warm", None)

    uncapped = build(spark, td, "uncapped", None)
    capped = build(spark, td, "capped", DF_CAP)
    record = {
        "kind": "r13_bm25_dfcap_skew_same_jvm",
        "n_docs": N_DOCS,
        "uncapped": uncapped,
        "capped": capped,
        "hot_bucket_rows_uncapped": max(uncapped["per_bucket_rows"].values()),
        "hot_bucket_rows_capped": max(capped["per_bucket_rows"].values()),
        "max_list_bounded": capped["max_posting_list"]["rows"] <= DF_CAP,
    }
    print(json.dumps(record, indent=1), flush=True)

    import shutil

    shutil.rmtree(td, ignore_errors=True)
    smokes = ROOT / "smokes" / "r13.json"
    existing = json.loads(smokes.read_text()) if smokes.exists() else {}
    existing["bm25_dfcap_skew"] = record
    smokes.write_text(json.dumps(existing, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
