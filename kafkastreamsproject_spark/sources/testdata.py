"""Readers for the driver's synthetic parquet tables.

Parquet is the engine's canonical batch format: columnar, splittable,
predicate-pushdown-able.  At 100 TB these reads are the dominant cost, so
nothing here materializes or caches by default — callers compose lazy
DataFrames and Catalyst prunes columns/row-groups from the final plan.
"""

from __future__ import annotations

import os
import urllib.parse

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
    # nanosAsLong is read at ANALYSIS time (schema inference), so setting
    # it only around the read() call below is sufficient — but it has no
    # per-reader option form, so save/restore rather than leak session
    # mutation out of a query builder.  The timezone, by contrast, is
    # consumed at EXECUTION time by timestamp expressions; restoring it
    # here would re-expose event-time results to the caller's JVM-default
    # zone.  It is therefore pinned once per session (idempotent; the
    # driver's oracle recipe assumes UTC) rather than toggled per read.
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    nanos_key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(nanos_key, None)
    spark.conf.set(nanos_key, "true")
    try:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    finally:
        if prev is None:
            spark.conf.unset(nanos_key)
        else:
            spark.conf.set(nanos_key, prev)
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

    The gate reads driver-side FILE METADATA (``df.inputFiles()`` +
    local file sizes), never ``df.rdd.getNumPartitions()`` — the RDD
    conversion forces full physical planning per call and was measured
    at ~0.4 s of pure plan-build latency per query at test scale.  The
    scan-partition estimate mirrors Spark's own splitting rule
    (ceil(bytes / maxPartitionBytes), at least one per file).
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df  # non-file source: no basis to estimate, leave as-is
    if not files:
        return df
    total = 0
    for uri in files:
        path = urllib.parse.unquote(urllib.parse.urlparse(uri).path)
        try:
            total += os.path.getsize(path)
        except OSError:
            # remote / unstatable FS: a corpus worth putting there has
            # plenty of row groups — treat as already wide
            return df
    try:
        max_pb = _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    except Exception:
        max_pb = 128 * 1024 * 1024
    est_partitions = max(len(files), -(-total // max_pb))
    if est_partitions < target:
        return df.repartition(target)
    return df


_BYTE_SUFFIXES = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}


def _parse_bytes(v: str) -> int:
    """Parse Spark byte-conf forms: '134217728', '134217728b', '128m', '128MB'."""
    s = v.strip().lower().removesuffix("b")
    if s and s[-1] in _BYTE_SUFFIXES:
        return int(s[:-1]) * _BYTE_SUFFIXES[s[-1]]
    return int(s)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Load every testdata table as a dict of lazy DataFrames."""
    return {t: load_table(spark, t, sf_dir) for t in TESTDATA_TABLES}
