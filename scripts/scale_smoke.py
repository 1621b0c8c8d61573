#!/usr/bin/env python
"""Scale-smoke: replicate the sf0.1 tables N× into /tmp and re-run the
headline aggregations, printing rows/sec so scaling behavior (not just
absolute time) is visible.

Usage:  python scripts/scale_smoke.py [N]    # default N=10 (~6M lineitem)

This is a manual diagnostic, not part of the test suite — it validates
that throughput grows with data volume (fixed overheads amortize) and
that no operator degrades super-linearly at 10× local scale.
"""

from __future__ import annotations

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


if __name__ == "__main__":
    main()
