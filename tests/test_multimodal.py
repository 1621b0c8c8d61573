"""Multimodal plumbing tests: schema, batch shape, determinism, and the
NotImplementedError seam for real decoding."""

from __future__ import annotations

import pytest

from kafkastreamsproject_spark.functions.multimodal import (
    FEATURE_DIM,
    documents_as_media,
    extract_features,
)
from kafkastreamsproject_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return documents_as_media(load_table(spark, "documents", sf_dir))


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    meta = media.schema["meta"].dataType
    assert [f.name for f in meta.fields] == [
        "media_type", "width", "height", "channels", "sample_rate", "duration_ms",
    ]


def test_fake_decode_shapes_and_determinism(spark, media):
    feats = extract_features(media, mode="fake")
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert len(r.feature) == FEATURE_DIM
        assert abs(sum(r.feature) - 1.0) < 1e-3  # normalized histogram
        assert r.n_bytes > 0
    # deterministic across runs
    again = {r.media_id: r.feature for r in extract_features(media, "fake").collect()}
    for r in rows[:20]:
        assert again[r.media_id] == r.feature


def test_real_decode_raises_not_implemented_for_codec_formats(spark, media):
    """text/plain payloads are not a self-contained format -> the codec
    seam still raises; PPM payloads take the real path (tested below)."""
    with pytest.raises(Exception) as exc_info:
        extract_features(media, mode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_parse_ppm_header_pixels_and_errors():
    """The P6 parser handles comments, single-whitespace pixel-block
    boundary, and whitespace-looking pixel bytes; malformed payloads
    raise."""
    import numpy as np

    from kafkastreamsproject_spark.functions.multimodal import parse_ppm

    # 2x2 image whose pixels include \n (0x0A) and space (0x20)
    px = bytes([10, 32, 9, 200, 0, 255, 1, 2, 3, 4, 5, 6])
    buf = b"P6\n# a comment\n2 2\n255\n" + px
    w, h, maxval, arr = parse_ppm(buf)
    assert (w, h, maxval) == (2, 2, 255)
    assert arr.shape == (2, 2, 3)
    assert arr.reshape(-1).tolist() == list(px)

    with pytest.raises(ValueError):
        parse_ppm(b"P5\n2 2\n255\n" + px)  # wrong magic (PGM)
    with pytest.raises(ValueError):
        parse_ppm(b"P6\n2 2\n255\n" + px[:5])  # truncated pixels
    with pytest.raises(ValueError):
        parse_ppm(b"P6\n2 2\n65535\n" + px * 2)  # 16-bit samples


def test_real_decode_ppm_histograms_decoded_pixels(spark):
    """mode='real' on PPM payloads decodes for real: the histogram is
    over PIXEL samples, not raw payload bytes (header excluded)."""
    import numpy as np

    from kafkastreamsproject_spark.functions.multimodal import (
        documents_as_ppm_media,
        extract_features,
        parse_ppm,
    )
    from kafkastreamsproject_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").limit(25)
    ppm = documents_as_ppm_media(docs)
    rows = {
        r.media_id: r
        for r in extract_features(ppm, mode="real").collect()
    }
    payloads = {r.media_id: bytes(r.payload) for r in ppm.collect()}
    assert rows.keys() == payloads.keys()
    for mid, buf in payloads.items():
        w, h, _m, arr = parse_ppm(buf)
        want = np.bincount(
            arr.reshape(-1) % FEATURE_DIM, minlength=FEATURE_DIM
        )
        got = rows[mid]
        assert got.hist == want.tolist(), mid
        assert got.n_bytes == len(buf)  # n_bytes stays the payload size
        assert sum(got.hist) == 3 * w * h  # pixels only, no header bytes


def test_registered_media_features_is_scalar_and_faithful(spark, sf_dir):
    """The registered query serializes the integer histogram (the driver
    canonicalizer cannot hash list cells — round 2's one red row); the
    csv form must round-trip to the raw extract_features output, and the
    normalized float vector must equal hist / n_bytes."""
    from kafkastreamsproject_spark.plans.registry import all_queries

    df = all_queries()["media_features"].spark(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "media_id", "n_bytes", "hist_csv", "feature_dim",
    ]
    assert all("array" not in f.dataType.simpleString() for f in df.schema.fields)
    rows = {r.media_id: r for r in df.limit(50).collect()}
    media = documents_as_media(load_table(spark, "documents", sf_dir))
    raw = {
        r.media_id: r
        for r in extract_features(media, "fake").collect()
        if r.media_id in rows
    }
    for mid, row in rows.items():
        assert row.feature_dim == FEATURE_DIM
        parsed = [int(x) for x in row.hist_csv.split(",")]
        assert len(parsed) == FEATURE_DIM
        assert parsed == list(raw[mid].hist)
        assert sum(parsed) == row.n_bytes
        for got, want in zip(parsed, raw[mid].feature):
            assert abs(got / max(row.n_bytes, 1) - want) < 1e-6


def test_n_bytes_matches_utf8_length(spark, media):
    feats = extract_features(media, mode="fake")
    joined = feats.join(media, "media_id")
    import pyspark.sql.functions as F

    bad = joined.filter(F.octet_length("payload") != F.col("n_bytes")).count()
    assert bad == 0


def test_parse_wav_chunk_walk_and_errors():
    """The RIFF parser walks chunks by declared size (unknown chunks
    skipped, odd sizes word-aligned), asserts PCM-8, and returns the
    data block; malformed payloads raise."""
    import struct

    import numpy as np

    from kafkastreamsproject_spark.functions.multimodal import parse_wav

    def wav(samples: bytes, extra_chunk: bytes = b"") -> bytes:
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        chunks = extra_chunk
        chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(samples)) + samples
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    samples = bytes([0, 255, 128, 7, 200])
    # an unknown ODD-sized chunk before fmt: skipped, alignment honored
    junk = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    n_ch, rate, bits, got = parse_wav(wav(samples, junk))
    assert (n_ch, rate, bits) == (1, 8000, 8)
    assert got.tolist() == list(samples)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_wav(b"RIFX" + wav(samples)[4:])  # wrong magic
    with _pytest.raises(ValueError):
        parse_wav(wav(samples)[:20])  # truncated: no data chunk
    bad_fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)  # 16-bit
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(bad_fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt
        + b"data" + struct.pack("<I", 0)
    )
    with _pytest.raises(ValueError):
        parse_wav(bad)


def test_real_decode_wav_histograms_decoded_samples(spark):
    """mode='real' on WAV payloads decodes for real: the histogram is
    over PCM samples, not raw payload bytes (RIFF header excluded)."""
    import numpy as np

    from kafkastreamsproject_spark.functions.multimodal import (
        documents_as_wav_media,
        extract_features,
        parse_wav,
    )
    from kafkastreamsproject_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").limit(25)
    wav = documents_as_wav_media(docs)
    rows = {
        r.media_id: r for r in extract_features(wav, mode="real").collect()
    }
    payloads = {r.media_id: bytes(r.payload) for r in wav.collect()}
    assert rows.keys() == payloads.keys()
    for mid, buf in payloads.items():
        _c, _r, _b, samples = parse_wav(buf)
        want = np.bincount(samples % FEATURE_DIM, minlength=FEATURE_DIM)
        got = rows[mid]
        assert got.hist == want.tolist(), mid
        assert got.n_bytes == len(buf)
        assert sum(got.hist) == len(samples)  # samples only, no header


def test_parse_ppm_roundtrip_property():
    """Property: any (w, h, pixel-bytes) triple encodes to a P6 payload
    that parse_ppm decodes back exactly — including pixel bytes that
    look like header whitespace and comment markers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkastreamsproject_spark.functions.multimodal import parse_ppm

    @given(
        w=st.integers(min_value=1, max_value=9),
        h=st.integers(min_value=1, max_value=9),
        data=st.data(),
    )
    @settings(max_examples=200, deadline=None)
    def prop(w, h, data):
        px = bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=255),
                    min_size=w * h * 3,
                    max_size=w * h * 3,
                )
            )
        )
        buf = f"P6\n{w} {h}\n255\n".encode() + px
        got_w, got_h, maxval, arr = parse_ppm(buf)
        assert (got_w, got_h, maxval) == (w, h, 255)
        assert arr.reshape(-1).tolist() == list(px)

    prop()


def test_parse_wav_roundtrip_property():
    """Property: any PCM-8 sample vector encodes to a RIFF payload that
    parse_wav decodes back exactly, with or without a junk chunk."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkastreamsproject_spark.functions.multimodal import parse_wav

    @given(
        samples=st.lists(
            st.integers(min_value=0, max_value=255), min_size=0, max_size=64
        ),
        junk=st.binary(min_size=0, max_size=7),
        rate=st.sampled_from([8000, 16000, 44100]),
    )
    @settings(max_examples=200, deadline=None)
    def prop(samples, junk, rate):
        sb = bytes(samples)
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
        chunks = b"JUNK" + struct.pack("<I", len(junk)) + junk
        if len(junk) % 2:
            chunks += b"\x00"  # word alignment pad
        chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(sb)) + sb
        buf = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        n_ch, got_rate, bits, got = parse_wav(buf)
        assert (n_ch, got_rate, bits) == (1, rate, 8)
        assert got.tolist() == samples

    prop()


def test_dhash_brightness_invariance_property():
    """The luminance-gradient dHash is invariant to any uniform
    brightness shift that avoids clipping — the property the planted
    twins of ppm_dhash_neardup rely on — and flips when a gradient
    actually reverses."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def dhash(px):
        lum = px.reshape(-1, 3).astype(np.int64).sum(axis=1)
        bits = (lum[:-1] < lum[1:]).astype(np.int64)
        return int((bits << np.arange(len(bits))).sum())

    @given(
        pixels=st.lists(
            st.tuples(*[st.integers(min_value=1, max_value=127)] * 3),
            min_size=2,
            max_size=48,
        ),
        delta=st.integers(min_value=-1, max_value=0),
    )
    @settings(max_examples=200, deadline=None)
    def prop(pixels, delta):
        base = np.array(pixels, dtype=np.int64).reshape(-1, 3)
        shifted = base + delta  # stays in 0..127: no clipping
        assert dhash(base) == dhash(shifted)

    prop()

    # a genuine gradient reversal changes the hash
    a = np.array([[10, 10, 10], [20, 20, 20]], dtype=np.int64)
    b = np.array([[20, 20, 20], [10, 10, 10]], dtype=np.int64)
    assert dhash(a) != dhash(b)


def test_extract_image_dhash_matches_reference(spark):
    """extract_image_dhash (real decode through the Arrow seam) equals
    a driver-side recompute from parse_ppm on the same payloads."""
    import numpy as np

    from kafkastreamsproject_spark.functions.multimodal import (
        documents_as_ppm_media,
        extract_image_dhash,
        parse_ppm,
    )

    docs = spark.createDataFrame(
        [(i, "x", "s", 1) for i in range(1, 9)],
        "doc_id long, text string, source string, n_chars int",
    )
    media = documents_as_ppm_media(docs)
    got = {
        r.media_id: (r.width, r.height, r.dhash)
        for r in extract_image_dhash(media).collect()
    }
    for row in media.select("media_id", "payload").collect():
        w, h, _m, px = parse_ppm(bytes(row.payload))
        lum = px.reshape(-1, 3).astype(np.int64).sum(axis=1)
        bits = (lum[:-1] < lum[1:]).astype(np.int64)
        want = int((bits << np.arange(len(bits))).sum())
        assert got[row.media_id] == (w, h, want)
