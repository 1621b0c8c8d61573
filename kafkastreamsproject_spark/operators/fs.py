"""Path-scheme-agnostic filesystem probes via the Hadoop FileSystem API.

The persistent stores (near-dup signature store, incremental rollup
store) live at a caller-supplied URI.  Driver-local ``os.path`` /
``pathlib`` checks silently treat an HDFS/S3 store as absent — the
first batch would overwrite-from-empty instead of merging (round-2
advice).  These helpers resolve existence through the same FileSystem
the Spark reads/writes will use, so a remote URI can never drop
history.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def hadoop_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on its own filesystem (local, HDFS, S3A …)."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def hadoop_touch(spark: SparkSession, path: str) -> None:
    """Create an empty marker file (parents included) at ``path``."""
    fs, hpath = _fs_and_path(spark, path)
    parent = hpath.getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)
    out = fs.create(hpath, True)
    out.close()


def hadoop_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write ``text`` (UTF-8, overwrite) at ``path`` on its own
    filesystem — used for store sidecar metadata, so the sidecar lives
    wherever the store lives (local, HDFS, S3A …)."""
    fs, hpath = _fs_and_path(spark, path)
    parent = hpath.getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def hadoop_read_text(spark: SparkSession, path: str) -> str | None:
    """Read ``path`` as UTF-8 text; None if it does not exist."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        jvm = spark._jvm
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def hadoop_count_files(
    spark: SparkSession, path: str, suffix: str = ".parquet"
) -> int:
    """Number of ``suffix`` files directly under ``path`` (0 if the
    directory is absent) — the adaptive-compaction trigger input for
    PLAIN parquet append stores, where no bucket id is encoded in the
    file names (bucketed stores use
    sources/bucketed.py:max_files_per_bucket instead)."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return 0
    return sum(
        1
        for status in fs.listStatus(hpath)
        if status.getPath().getName().endswith(suffix)
    )


def hadoop_has_files(spark: SparkSession, path: str, suffix: str = ".parquet") -> bool:
    """True iff ``path`` is a directory containing at least one
    ``suffix`` file (non-recursive) — the 'store already initialized'
    probe for parquet-backed state."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return False
    for status in fs.listStatus(hpath):
        if status.getPath().getName().endswith(suffix):
            return True
    return False
