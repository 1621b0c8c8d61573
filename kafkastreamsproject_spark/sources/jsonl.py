"""JSON-Lines source/sink — the interchange format of LLM-data
pipelines (one JSON document per line; what web-scrape dumps, eval
suites, and fine-tuning datasets ship as).

Spark's native ``json`` reader/writer IS line-delimited JSON, so this
module is a thin, opinionated wrapper rather than a format
implementation: explicit schemas only (inference reads the data twice
and types drift between shards), FAILFAST by default (mirroring the
engine's CSV stance, sources/csv.py), and compression surfaced because
a 100 TB corpus is never stored uncompressed.

Scale notes: gzip JSONL is NOT splittable — one file becomes one task,
so a corpus should be many files of a few hundred MB (the writer's
``partitions`` knob re-buckets before write).  Parquet remains the
engine's canonical batch format; JSONL is for the boundary where data
enters or leaves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENT_JSONL = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema.

    ``mode``: FAILFAST (throw on malformed line — the engine's default
    stance), PERMISSIVE (null out bad fields), or DROPMALFORMED.
    """
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        # multiLine=false is the default (true would parse the whole
        # file as ONE document and kill splittability); pinned
        # explicitly because it silently changes the data model.
        .option("multiLine", "false")
        .json(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    partitions: int | None = None,
    overwrite: bool = False,
) -> None:
    """Write a DataFrame as JSONL shards.

    ``partitions`` re-buckets before the write — target a few hundred
    MB per shard: gzip shards are the unit of read parallelism (not
    splittable), so shard count bounds downstream task count.
    """
    if partitions:
        df = df.repartition(partitions)
    writer = df.write.mode("overwrite" if overwrite else "error")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
