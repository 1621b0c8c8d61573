"""Multimodal column support: opaque binary payloads + typed metadata.

Convention (the Parquet-native way to carry media at 100 TB):

- media payloads are ``BinaryType`` columns — Parquet stores them as
  byte arrays with page compression; Spark never interprets them except
  inside explicitly-chosen decode operators;
- every payload travels with a typed metadata struct
  (``MEDIA_META``: media_type/width/height/channels/sample_rate/
  duration_ms) so planning-level decisions (filter, partition, sample)
  never touch bytes;
- decode / feature-extraction runs as ``mapInPandas`` — Arrow-batched,
  one Python worker per input split, no shuffle; downstream operators
  see ordinary columns.

The container ships no image/audio codecs, so ``decode_media_batch``
has two modes: ``fake`` (deterministic bytes-derived features — keeps
the full Spark plumbing testable end-to-end) and ``real`` (raises
``NotImplementedError`` at the exact seam where PIL/ffmpeg would slot
in).  The Spark-side schema, batching, and partitioning behavior are
identical in both modes, which is what the engine actually owns.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        # raw integer byte-histogram counts (feature before normalization):
        # exact-arithmetic output that a SQL oracle can reproduce, unlike
        # the float32-normalized `feature`
        T.StructField("hist", T.ArrayType(T.LongType())),
    ]
)

FEATURE_DIM = 16


def decode_media_batch(mode: str = "fake"):
    """Return a mapInPandas function decoding payloads → feature rows.

    ``fake``: features are a deterministic 16-bin byte histogram of the
    payload (no codec needed) — the Spark contract (Arrow batch in,
    Arrow batch out, fixed feature_dim) is fully exercised.
    ``real``: the seam for an actual decoder; raises NotImplementedError
    because no codec library ships in this environment.
    """

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real media decoding needs a codec library (PIL/ffmpeg) "
                    "not present in this environment; use mode='fake'"
                )
            feats = []
            hists = []
            nbytes = []
            for payload in pdf["payload"]:
                buf = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(buf % FEATURE_DIM, minlength=FEATURE_DIM)
                total = max(len(buf), 1)
                feats.append((hist / total).astype(np.float32))
                hists.append(hist.astype(np.int64))
                nbytes.append(len(buf))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": nbytes,
                    "feature": feats,
                    "hist": hists,
                }
            )

    return fn


def extract_features(media: DataFrame, mode: str = "fake") -> DataFrame:
    """Feature extraction over a media table (mapInPandas, no shuffle)."""
    return media.select("media_id", "payload").mapInPandas(
        decode_media_batch(mode), schema=FEATURES_SCHEMA
    )


def frame_sample_times(duration_ms, fps_divisor_ms: int = 1000):
    """Frame-sampling plan: timestamps (ms) at which a video decoder
    would grab frames — pure column math, no bytes touched."""
    return F.sequence(
        F.lit(0).cast("long"),
        duration_ms.cast("long") - 1,
        F.lit(fps_divisor_ms).cast("long"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: build a media-shaped table from ``documents`` (payload =
    utf-8 bytes of text; metadata derived deterministically).  Stands in
    for a real media Parquet until one exists in the fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
