"""Readers for the driver's synthetic parquet tables.

Parquet is the engine's canonical batch format: columnar, splittable,
predicate-pushdown-able.  At 100 TB these reads are the dominant cost, so
nothing here materializes or caches by default — callers compose lazy
DataFrames and Catalyst prunes columns/row-groups from the final plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamsproject_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one testdata table lazily. ``name`` ∈ TESTDATA_TABLES.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects by default (Spark keeps µs precision).  We
    read nanos as long (``spark.sql.legacy.parquet.nanosAsLong``) and
    convert with integer division — ns epoch values exceed 2^53 so a
    double-precision divide would corrupt them; ``div`` stays integral.
    Oracle SQL must correspondingly CAST ns timestamps to µs TIMESTAMP.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The caller may hand us a session we didn't build (the driver does);
    # event-time semantics must not depend on its JVM-default timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Widen a narrow scan before CPU-heavy per-row work.

    A single-row-group parquet file is unsplittable, so a scan of it
    yields one partition and per-row compute (md5 shingle hashing,
    cosine over embedding arrays) serializes on one core no matter how
    many the session has.  When — and only when — the scan's parallelism
    is below the session's, round-robin repartition to the session's
    parallelism: a shuffle of the (small, or it would be splittable)
    input that unlocks every core for the expensive map stage.

    At 100 TB the corpus has orders of magnitude more row groups than
    the cluster has cores, the gate is false, and this is a no-op — no
    accidental full-corpus shuffle at scale.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Load every testdata table as a dict of lazy DataFrames."""
    return {t: load_table(spark, t, sf_dir) for t in TESTDATA_TABLES}
