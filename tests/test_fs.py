"""Hadoop FileSystem probe helpers (operators/fs.py) — the
scheme-agnostic existence checks the persistent stores rely on."""

from __future__ import annotations

from kafkastreamsproject_spark.operators.fs import (
    hadoop_exists,
    hadoop_has_files,
    hadoop_touch,
)


def test_exists_and_touch_roundtrip(spark, tmp_path):
    marker = str(tmp_path / "nested" / "deep" / "epoch-7.done")
    assert not hadoop_exists(spark, marker)
    hadoop_touch(spark, marker)  # creates parents
    assert hadoop_exists(spark, marker)
    # idempotent overwrite
    hadoop_touch(spark, marker)
    assert hadoop_exists(spark, marker)


def test_has_files_requires_matching_suffix(spark, tmp_path):
    store = tmp_path / "store"
    assert not hadoop_has_files(spark, str(store))  # absent dir
    store.mkdir()
    assert not hadoop_has_files(spark, str(store))  # empty dir
    (store / "_SUCCESS").touch()
    assert not hadoop_has_files(spark, str(store))  # marker only
    (store / "part-0000.parquet").touch()
    assert hadoop_has_files(spark, str(store))


def test_store_readers_survive_marker_only_dir(spark, tmp_path):
    """A store dir holding only a _SUCCESS marker (crash before any part
    file) must read as empty, not explode or mis-detect."""
    from kafkastreamsproject_spark.streaming.neardup import _read_store

    sig = tmp_path / "signatures"
    sig.mkdir()
    (sig / "_SUCCESS").touch()
    assert _read_store(spark, str(sig)).count() == 0
