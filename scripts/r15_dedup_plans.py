#!/usr/bin/env python
"""Capture dedup-family physical plans into plans/r15/ (r15 mirror-CSE).

Usage: python scripts/r15_dedup_plans.py {before|after} [query ...]

Default queries: the two benched dedup-family queries.  Run once on the
pre-change tree, once after; the committed pair evidences the plan-shape
claim (two documents scans + two shingle/md5 pipelines collapsing to
one scan + one pipeline + a Generate).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kafkastreamsproject_spark.plans.registry import all_queries  # noqa: E402
from kafkastreamsproject_spark.session import get_spark  # noqa: E402

DEFAULT = ["minhash_lsh_pairs", "dedup_exact_keep_first"]


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after")
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = ROOT / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name=f"r15-dedup-plans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for name in names:
        df = specs[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote plans/r15/{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
