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


def test_real_decode_raises_not_implemented(spark, media):
    with pytest.raises(Exception) as exc_info:
        extract_features(media, mode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


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
