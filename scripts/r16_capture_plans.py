#!/usr/bin/env python
"""Capture declared-query physical plans into plans/r16/.

Usage: python scripts/r16_capture_plans.py {before|after} [query ...]

Run once on the pre-change tree, once after — the committed pair is
the judge-checkable evidence for the plan-shape claims in
OPTIMIZATION_r16.md.  Defaults to the round's examined set.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kafkastreamsproject_spark.plans.registry import all_queries  # noqa: E402
from kafkastreamsproject_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

DEFAULT = [
    "simhash_neardup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "tfidf_top_terms",
    "order_existence_counts",
    "lang_id_predict",
    "returned_revenue_report",
    "bloom_semi_lineitem",
    "ann_lsh_buckets",
    "quality_score",
    "grouping_sets_revenue",
    "ivf_assign",
    "unpivot_lineitem_metrics",
    "json_extract",
    "quantity_band_join",
    "label_centroids",
    "media_features",
    "doc_token_stats",
    "dedup_clusters",
    "approx_distinct_users",
]


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after")
    names = sys.argv[2:] or DEFAULT
    out_dir = ROOT / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name=f"r16-capture-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for name in names:
        df = specs[name].spark(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote plans/r16/{name}_{suffix}.txt"
              f" ({len(buf.getvalue().splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
