"""Bloom-filtered semi-join query surface (M5 scale posture).

The operator itself lives in ``operators/bloomjoin.py``; this module
registers an oracle-checked query exercising the full shape end-to-end:
pre-filter the fact table (``lineitem``) with a position sketch of the
urgent-order keys, confirm exactly, aggregate.  Because the confirm
join removes every bloom false positive, the DuckDB oracle is the plain
``IN`` subquery — the bloom layer must be a pure no-op on results, only
a shuffle reducer, and the compare proves it.

At this SF the build side is trivially broadcastable and AQE would pick
a broadcast semi-join anyway; the query exists so the operator's plan
(two broadcast semi-joins on positions + one key-confirm join, zero
extra shuffles) is continuously asserted by the shadow plan-hygiene
test, and so the 100 TB story — sketch size capped at ``8 * n_bits``
bytes while distinct build keys grow unbounded — has a verified
implementation behind it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamsproject_spark.operators.bloomjoin import bloom_semi_join
from kafkastreamsproject_spark.plans.registry import register
from kafkastreamsproject_spark.sources.testdata import load_table


@register(
    "bloom_semi_join_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2)
             AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2))))
                      AS DOUBLE), 4) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag
    """,
    tags=("join", "scale"),
    tier="shadow",
)
def bloom_semi_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of line items belonging to urgent orders, with the
    semi-join evaluated bloom-first (2 hashed positions, 2^20 bits).
    Result is oracle-identical to the exact ``IN`` semi-join by
    construction; the bloom stage only shrinks what the confirm join
    has to move."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        "l_returnflag",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    urgent = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    hits = bloom_semi_join(
        li, "l_orderkey", urgent, "o_orderkey", n_hashes=2, n_bits=1 << 20
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return hits.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double"), 2
        ).alias("sum_qty"),
        F.round(F.sum(rev).cast("double"), 4).alias("revenue"),
    )
