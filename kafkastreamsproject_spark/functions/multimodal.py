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
the full Spark plumbing testable end-to-end) and ``real``, which since
r9 ACTUALLY decodes the self-contained P6 PPM format via
:func:`parse_ppm` (header parse + pixel stats, pure Python/numpy) and
raises ``NotImplementedError`` only for formats that genuinely need
PIL/ffmpeg — the seam is now exercised by a real decoder, with the
stub remaining only where an external codec is unavoidable.  The
Spark-side schema, batching, and partitioning behavior are identical
in both modes, which is what the engine actually owns.
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


def parse_ppm(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Pure-Python decode of a binary PPM (P6) image: header parse
    (magic, whitespace/comment-tolerant width/height/maxval tokens,
    then EXACTLY one whitespace byte before the raw samples, per the
    netpbm spec — pixel bytes may themselves look like whitespace) and
    the pixel block as an (h, w, 3) uint8 array.  PPM is the
    self-contained format that needs no codec library, so this is a
    REAL decoder behind the media seam, not a stand-in."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        vals.append(int(buf[start:pos]))
    pos += 1  # the single whitespace separating maxval from samples
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM samples not supported")
    px = np.frombuffer(buf, dtype=np.uint8, offset=pos)
    need = w * h * 3
    if len(px) < need:
        raise ValueError("truncated PPM pixel block")
    return w, h, maxval, px[:need].reshape(h, w, 3)


def decode_media_batch(mode: str = "fake"):
    """Return a mapInPandas function decoding payloads → feature rows.

    ``fake``: features are a deterministic 16-bin byte histogram of the
    payload (no codec needed) — the Spark contract (Arrow batch in,
    Arrow batch out, fixed feature_dim) is fully exercised.
    ``real``: payloads carrying a self-contained format are ACTUALLY
    decoded — P6 PPM via :func:`parse_ppm` and RIFF/WAVE 8-bit PCM via
    :func:`parse_wav` — with the histogram taken over decoded SAMPLES
    rather than raw payload bytes (container headers no longer pollute
    the feature).  Formats that need an external codec (JPEG/PNG/
    MP3/video) still raise NotImplementedError at this seam, where
    PIL/ffmpeg would slot in.
    """

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            hists = []
            nbytes = []
            for payload in pdf["payload"]:
                raw = np.frombuffer(payload, dtype=np.uint8)
                if mode == "real":
                    if bytes(payload[:2]) == b"P6":
                        _w, _h, _m, px = parse_ppm(bytes(payload))
                        buf = px.reshape(-1)
                    elif bytes(payload[:4]) == b"RIFF":
                        _c, _r, _b, buf = parse_wav(bytes(payload))
                    else:
                        raise NotImplementedError(
                            "decoding this media format needs a codec "
                            "library (PIL/ffmpeg) not present in this "
                            "environment; PPM and WAV/PCM decode natively, "
                            "other formats use mode='fake'"
                        )
                else:
                    buf = raw
                hist = np.bincount(buf % FEATURE_DIM, minlength=FEATURE_DIM)
                total = max(len(buf), 1)
                feats.append((hist / total).astype(np.float32))
                hists.append(hist.astype(np.int64))
                nbytes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": nbytes,
                    "feature": feats,
                    "hist": hists,
                }
            )

    return fn


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("maxval", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        # exact integer per-channel sums — FP-free, SQL-reproducible
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
    ]
)


def decode_image_stats_batch():
    """mapInPandas function: REAL PPM decode → per-image header fields
    and exact integer per-channel pixel sums (means are a final int/int
    division left to the caller, the cross-engine-exactness
    discipline)."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "width", "height", "maxval",
                "n_pixels", "r_sum", "g_sum", "b_sum",
            )}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, maxval, px = parse_ppm(bytes(payload))
                rows["media_id"].append(media_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["maxval"].append(maxval)
                rows["n_pixels"].append(w * h)
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows["r_sum"].append(int(sums[0]))
                rows["g_sum"].append(int(sums[1]))
                rows["b_sum"].append(int(sums[2]))
            yield pd.DataFrame(rows)

    return fn


def extract_image_stats(media: DataFrame) -> DataFrame:
    """PPM image statistics over a media table (mapInPandas — Arrow
    batches, no shuffle; payload bytes read once, never moved)."""
    return media.select("media_id", "payload").mapInPandas(
        decode_image_stats_batch(), schema=IMAGE_STATS_SCHEMA
    )


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


def documents_as_ppm_media(
    docs: DataFrame, brightness_delta: int = 0
) -> DataFrame:
    """Adapter: synthesize a REAL P6 PPM payload per document row —
    deterministic dimensions (width 4..8, height 3..6 from doc_id) and
    samples ``1 + brightness_delta + (doc_id*37 + 11*i) % 127`` (all in
    0..127 for delta ∈ {−1, 0}, so the UTF-8 encode is one byte per
    sample and the generative formula is closed-form reproducible in
    SQL).  The payload is a spec-valid binary PPM — :func:`parse_ppm`
    decodes it with no knowledge of the formula — so the decode path is
    exercised for real while a SQL oracle checks the decoded statistics
    against the closed form.  ``brightness_delta`` shifts every sample
    uniformly — a byte-level change that leaves all luminance GRADIENTS
    intact, the planted perceptual near-duplicate for the dHash query."""
    if not -1 <= brightness_delta <= 0:
        raise ValueError("brightness_delta must keep samples in 0..127")
    d = F.col("doc_id")
    w = (F.lit(4) + d % 5).cast("int")
    h = (F.lit(3) + d % 4).cast("int")
    n3 = (w.cast("long") * h * 3).cast("long")
    pix = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("long"), n3 - 1),
            lambda i: F.char(
                F.lit(1 + brightness_delta) + (d * 37 + i * 11) % 127
            ),
        ),
        "",
    )
    payload = F.encode(
        F.concat(
            F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
            F.lit("\n127\n"), pix,
        ),
        "utf-8",
    )
    return docs.select(
        d.alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/x-portable-pixmap").alias("media_type"),
            w.alias("width"),
            h.alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


IMAGE_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        # luminance-gradient perceptual hash: bit i set iff pixel i is
        # darker than pixel i+1 (row-major); ≤ 47 bits for the fixture
        # dimensions, exact integer — SQL-reproducible
        T.StructField("dhash", T.LongType()),
    ]
)


def decode_image_dhash_batch():
    """mapInPandas function: REAL PPM decode → difference-hash (dHash)
    over the luminance sequence.  Luminance is the exact integer
    r+g+b per pixel; bit i of the hash is 1 iff lum[i] < lum[i+1] —
    the gradient-sign fingerprint that is invariant to uniform
    brightness shifts (the classic perceptual-dedup property)."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "width", "height", "dhash")}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, _maxval, px = parse_ppm(bytes(payload))
                lum = px.reshape(-1, 3).astype(np.int64).sum(axis=1)
                bits = (lum[:-1] < lum[1:]).astype(np.int64)
                dhash = int((bits << np.arange(len(bits))).sum())
                rows["media_id"].append(media_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["dhash"].append(dhash)
            yield pd.DataFrame(rows)

    return fn


def extract_image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual dHash over a media table (mapInPandas — Arrow
    batches, no shuffle; only the fixed-width hash leaves the row)."""
    return media.select("media_id", "payload").mapInPandas(
        decode_image_dhash_batch(), schema=IMAGE_DHASH_SCHEMA
    )


def parse_wav(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Pure-Python decode of a RIFF/WAVE payload with 8-bit PCM
    samples: RIFF magic + chunk walk (fmt / data found by id, unknown
    chunks skipped by their declared size, per the RIFF spec), PCM
    format assertions, and the sample block as a uint8 array.  Returns
    (n_channels, sample_rate, bits_per_sample, samples).  Like
    :func:`parse_ppm`, WAV/PCM is self-contained — a REAL audio
    decoder with no codec library."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (csize,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, n_ch, rate, _brate, _align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_fmt != 1:
        raise ValueError("only PCM (format 1) supported")
    if bits != 8:
        raise ValueError("only 8-bit PCM samples supported")
    return n_ch, rate, bits, np.frombuffer(data, dtype=np.uint8)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        # exact integer moments — FP-free, SQL-reproducible
        T.StructField("sample_sum", T.LongType()),
        T.StructField("sample_sq_sum", T.LongType()),
        T.StructField("sample_min", T.IntegerType()),
        T.StructField("sample_max", T.IntegerType()),
    ]
)


def decode_audio_stats_batch():
    """mapInPandas function: REAL WAV/PCM decode → header fields and
    exact integer sample moments (mean/energy are final int/int
    divisions left to the caller)."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "n_channels", "sample_rate", "bits_per_sample",
                "n_samples", "sample_sum", "sample_sq_sum",
                "sample_min", "sample_max",
            )}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                n_ch, rate, bits, samples = parse_wav(bytes(payload))
                s64 = samples.astype(np.int64)
                rows["media_id"].append(media_id)
                rows["n_channels"].append(n_ch)
                rows["sample_rate"].append(rate)
                rows["bits_per_sample"].append(bits)
                rows["n_samples"].append(len(samples))
                rows["sample_sum"].append(int(s64.sum()))
                rows["sample_sq_sum"].append(int((s64 * s64).sum()))
                rows["sample_min"].append(int(s64.min()) if len(s64) else 0)
                rows["sample_max"].append(int(s64.max()) if len(s64) else 0)
            yield pd.DataFrame(rows)

    return fn


def extract_audio_stats(media: DataFrame) -> DataFrame:
    """WAV/PCM statistics over a media table (mapInPandas — Arrow
    batches, no shuffle)."""
    return media.select("media_id", "payload").mapInPandas(
        decode_audio_stats_batch(), schema=AUDIO_STATS_SCHEMA
    )


def _le_hex(value, n_bytes: int):
    """Little-endian hex encoding of an integer column (n_bytes wide) —
    the byte-exact building block for binary container headers built
    JVM-side (each byte hex-padded then concatenated LSB-first)."""
    parts = [
        F.lpad(
            F.hex((value / (256 ** i)).cast("long") % 256), 2, "0"
        )
        for i in range(n_bytes)
    ]
    return F.concat(*parts)


def documents_as_wav_media(docs: DataFrame) -> DataFrame:
    """Adapter: synthesize a REAL 8-bit-PCM WAV payload per document
    row — deterministic length (16..32 samples from doc_id) and
    samples ``(doc_id*53 + 17*i) % 256`` (FULL byte range — the
    payload is built as a hex string and ``unhex``-ed, so no
    UTF-8-safe-subset restriction applies), mono at 8000 Hz.  The
    payload is a spec-valid RIFF/WAVE binary — :func:`parse_wav`
    chunk-walks it for real — while the generative formula stays
    closed-form reproducible in SQL."""
    d = F.col("doc_id")
    n = (F.lit(16) + d % 17).cast("long")  # samples, 16..32
    # RIFF header, all fields hex-encoded byte-exactly:
    #   RIFF <36+n LE32> WAVE fmt_ <16 LE32> <PCM=1 LE16> <ch=1 LE16>
    #   <rate=8000 LE32> <byterate=8000 LE32> <align=1 LE16>
    #   <bits=8 LE16> data <n LE32> <n sample bytes>
    header_hex = F.concat(
        F.lit("52494646"),               # 'RIFF'
        _le_hex(F.lit(36) + n, 4),
        F.lit("57415645"),               # 'WAVE'
        F.lit("666d7420"),               # 'fmt '
        _le_hex(F.lit(16), 4),
        _le_hex(F.lit(1), 2),            # PCM
        _le_hex(F.lit(1), 2),            # mono
        _le_hex(F.lit(8000), 4),         # sample rate
        _le_hex(F.lit(8000), 4),         # byte rate
        _le_hex(F.lit(1), 2),            # block align
        _le_hex(F.lit(8), 2),            # bits per sample
        F.lit("64617461"),               # 'data'
        _le_hex(n, 4),
    )
    samples_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("long"), n - 1),
            lambda i: F.lpad(F.hex((d * 53 + i * 17) % 256), 2, "0"),
        ),
        "",
    )
    payload = F.unhex(F.concat(header_hex, samples_hex))
    return docs.select(
        d.alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("audio/wav").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(1).alias("channels"),
            F.lit(8000).alias("sample_rate"),
            ((n * 1000) / 8000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        # frame-energy gradient fingerprint: bit j set iff frame j+1's
        # energy exceeds frame j's — the audio twin of the image dHash,
        # invariant to uniform gain shifts of the centered signal
        T.StructField("efp", T.LongType()),
    ]
)

AUDIO_FP_FRAME_W = 4  # samples per energy frame


def decode_audio_fingerprint_batch(frame_w: int = AUDIO_FP_FRAME_W):
    """mapInPandas function: REAL WAV/PCM decode → frame-energy
    difference fingerprint.  Energy of frame j is the exact integer
    Σ (s−128)² over its ``frame_w`` samples (8-bit unsigned PCM
    centered); bit j of the fingerprint is 1 iff frame j+1's energy
    is strictly greater than frame j's.  A trailing partial frame is
    dropped (both engines identically)."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "n_frames", "efp")}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                _n_ch, _rate, _bits, samples = parse_wav(bytes(payload))
                s = samples.astype(np.int64) - 128
                n_frames = len(s) // frame_w
                e = (
                    (s[: n_frames * frame_w] ** 2)
                    .reshape(n_frames, frame_w)
                    .sum(axis=1)
                )
                bits = (e[1:] > e[:-1]).astype(np.int64)
                efp = int((bits << np.arange(len(bits))).sum())
                rows["media_id"].append(media_id)
                rows["n_frames"].append(n_frames)
                rows["efp"].append(efp)
            yield pd.DataFrame(rows)

    return fn


def extract_audio_fingerprint(media: DataFrame) -> DataFrame:
    """Frame-energy fingerprints over a media table (mapInPandas —
    Arrow batches, no shuffle; 12 bytes leave the row per payload)."""
    return media.select("media_id", "payload").mapInPandas(
        decode_audio_fingerprint_batch(), schema=AUDIO_FP_SCHEMA
    )


#: fixed sample count for the fingerprint corpus: 33 frames → 32 bits
AUDIO_FP_N = 132


def documents_as_fp_wav_media(
    docs: DataFrame, shift: int = 0, perturb: int = 0
) -> DataFrame:
    """Fixed-length (132-sample) WAV synth for the fingerprint family:
    samples ``(doc_id*53 + 17i + perturb·[i = doc_id % 132]) % 256`` —
    ``perturb`` moves exactly ONE sample, so exactly one frame's
    energy moves and the twin's fingerprint differs from its
    original's in AT MOST the two comparison bits adjacent to that
    frame (magnitude — even mod-256 wraparound — is irrelevant; only
    gradient signs enter the hash), which is what makes the Hamming≤2
    confirm provably lossless for this perturbation class.  ``shift``
    offsets media_id; the generative formula stays closed-form
    reproducible in SQL while the payload is a spec-valid RIFF/WAVE
    binary the decoder chunk-walks for real."""
    d = F.col("doc_id")
    n = F.lit(AUDIO_FP_N).cast("long")
    header_hex = F.concat(
        F.lit("52494646"),
        _le_hex(F.lit(36) + n, 4),
        F.lit("57415645"),
        F.lit("666d7420"),
        _le_hex(F.lit(16), 4),
        _le_hex(F.lit(1), 2),
        _le_hex(F.lit(1), 2),
        _le_hex(F.lit(8000), 4),
        _le_hex(F.lit(8000), 4),
        _le_hex(F.lit(1), 2),
        _le_hex(F.lit(8), 2),
        F.lit("64617461"),
        _le_hex(n, 4),
    )
    samples_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("long"), n - 1),
            lambda i: F.lpad(
                F.hex(
                    (
                        d * 53
                        + i * 17
                        + F.when(
                            i == d % AUDIO_FP_N, F.lit(perturb)
                        ).otherwise(F.lit(0))
                    )
                    % 256
                ),
                2,
                "0",
            ),
        ),
        "",
    )
    payload = F.unhex(F.concat(header_hex, samples_hex))
    return docs.select(
        (d + F.lit(shift)).alias("media_id"), payload.alias("payload")
    )
