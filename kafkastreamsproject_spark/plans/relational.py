"""General relational queries over the TPC-H-ish tables.

The reference's capability surface needs only J1 + grouped aggregation,
but a user switching engines gets the full relational algebra from Spark
SQL; these queries pin down the engine's join/agg/window/set-op surface
with oracle checks and double as the benchmark suite (bench.py) — they
are the only queries with enough rows at sf0.1 to measure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafkastreamsproject_spark.plans.registry import register
from kafkastreamsproject_spark.sources.testdata import load_table


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 4)                                        AS sum_qty,
      ROUND(SUM(l_extendedprice), 4)                                   AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
      ROUND(AVG(l_quantity), 6)                                        AS avg_qty,
      ROUND(AVG(l_extendedprice), 6)                                   AS avg_price,
      ROUND(AVG(l_discount), 6)                                        AS avg_disc,
      CAST(COUNT(*) AS BIGINT)                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "bench"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy two-key aggregation with 8 aggregates.
    The filter pushes to the parquet scan; whole-stage codegen covers
    scan→partial agg; shuffle carries ≤ |flag×status| × partitions rows.
    """
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
