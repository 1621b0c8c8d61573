"""Deduplication queries over ``documents``.

The synthetic corpus has no duplicate texts, so the exact-dedup queries
run over ``corpus2`` = documents ∪ (same texts re-keyed doc_id+1_000_000)
— every text then has exactly one duplicate, giving the operators real
work that the oracle can verify.  Near-dup families (MinHash-LSH,
SimHash, shingle-Jaccard) live in this module too (added in M4).

Scale stance: exact dedup is a hash-groupBy — the canonical key is
md5(text), so the shuffle carries 16-byte keys + doc_ids, never the
text bodies; at 100 TB the dedup shuffle is ~0.1% of corpus bytes.
Keep-first semantics are a ranking window over the fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafkastreamsproject_spark.functions import text as TX
from kafkastreamsproject_spark.plans.registry import register
from kafkastreamsproject_spark.sources.testdata import load_table

_SHIFT = 1_000_000

_SQL_CORPUS2 = f"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_SHIFT} AS doc_id, text FROM documents
"""


def _corpus2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    copy = docs.select((F.col("doc_id") + _SHIFT).alias("doc_id"), "text")
    return docs.unionAll(copy)


@register(
    "dedup_exact_groups",
    oracle=f"""
    WITH corpus2 AS ({_SQL_CORPUS2})
    SELECT md5(text) AS exact_fp,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id
    FROM corpus2
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    """,
    tags=("dedup",),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate groups: hash-groupBy on md5(text).  Only the
    16-byte fingerprint and doc_id shuffle; HAVING>1 isolates real dups."""
    c2 = _corpus2(spark, sf_dir)
    return (
        c2.groupBy(TX.exact_fingerprint(F.col("text")).alias("exact_fp"))
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("group_size") > 1)
    )


@register(
    "dedup_exact_keep_first",
    oracle=f"""
    WITH corpus2 AS ({_SQL_CORPUS2})
    SELECT doc_id FROM (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM corpus2
    ) WHERE rn = 1
    """,
    tags=("dedup",),
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first exact dedup: rank within fingerprint by doc_id, keep
    rank 1.  Equivalent to dropDuplicates but with a deterministic
    survivor (dropDuplicates keeps an arbitrary row per key)."""
    c2 = _corpus2(spark, sf_dir)
    w = W.partitionBy(TX.exact_fingerprint(F.col("text"))).orderBy("doc_id")
    return (
        c2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )


@register(
    "dedup_rate_by_source",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique
    FROM documents
    GROUP BY source
    """,
    tags=("dedup",),
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication audit — docs vs distinct fingerprints."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(TX.exact_fingerprint(F.col("text"))).alias("n_unique"),
    )
