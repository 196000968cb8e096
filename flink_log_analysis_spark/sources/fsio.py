"""Filesystem seam for index bookkeeping (markers, listings, swaps).

The persisted-IVF machinery writes its DATA through Spark writers,
which already speak every Hadoop-supported filesystem, but the
surrounding bookkeeping — replay-skip markers, commit listings, the
compaction directory swap — needs plain file operations. Doing those
with ``os``/``open`` silently pins the index to local paths (an
``s3a://...`` index would write vectors but never record commits).
This module routes them through the Hadoop FileSystem API via the
session's JVM gateway, so the SAME code works on ``file:``, ``hdfs:``
and any object-store connector on the classpath, with a pure-``os``
fallback only for callers that run without an active SparkSession
(introspection helpers in tests).

Portability contract, stated honestly:

- ``exists`` / ``mkdirs`` / ``list_names`` / ``write_text`` /
  ``delete`` map 1:1 onto FileSystem calls and are safe on object
  stores (marker writes are create-overwrite of tiny files; a marker
  is a skip OPTIMIZATION, never the correctness mechanism — see
  ``streaming/ann_ingest.py``).
- ``rename`` maps onto ``FileSystem.rename``: atomic on POSIX/HDFS,
  a COPY on S3-style stores. No index lifecycle path relies on it any
  more: compaction and index builds publish via the ``_current``
  manifest pointer (``read_text``/``write_text`` — a create-overwrite
  of one tiny file, a single atomic PUT on object stores), with
  readers resolving the pointer first (``similarity.vectors_dir``).
  The only remaining rename user is ``_build_index_once``, the
  correctness GATE's /tmp artifact cache, which is local-only by
  construction and documents its own rename-atomicity requirement.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _jfs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _active() -> SparkSession | None:
    return SparkSession.getActiveSession()


def exists(path: str, spark: SparkSession | None = None) -> bool:
    spark = spark or _active()
    if spark is None:
        return os.path.exists(path)
    fs, p = _jfs(spark, path)
    return fs.exists(p)


def mkdirs(path: str, spark: SparkSession | None = None) -> None:
    spark = spark or _active()
    if spark is None:
        os.makedirs(path, exist_ok=True)
        return
    fs, p = _jfs(spark, path)
    fs.mkdirs(p)


def list_names(path: str, spark: SparkSession | None = None) -> list[str]:
    """Child names of a directory ([] if it does not exist)."""
    spark = spark or _active()
    if spark is None:
        return os.listdir(path) if os.path.isdir(path) else []
    fs, p = _jfs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def write_text(path: str, text: str, spark: SparkSession | None = None) -> None:
    """Create-overwrite a small text file (marker semantics)."""
    spark = spark or _active()
    if spark is None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(text)
        return
    fs, p = _jfs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(path: str, spark: SparkSession | None = None) -> str | None:
    """Contents of a small text file (pointer/marker semantics), or
    ``None`` if it does not exist. The read is a single bounded open —
    callers use this for one-line manifest pointers, never data."""
    spark = spark or _active()
    if spark is None:
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return fh.read()
    fs, p = _jfs(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def delete(path: str, recursive: bool = True, spark: SparkSession | None = None) -> None:
    spark = spark or _active()
    if spark is None:
        import shutil

        # plain files (markers ARE plain files) need os.remove —
        # rmtree(ignore_errors=True) silently no-ops on them, leaving
        # exists() True after a "successful" delete
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)
        return
    fs, p = _jfs(spark, path)
    if fs.exists(p):
        fs.delete(p, recursive)


def rename(src: str, dst: str, spark: SparkSession | None = None) -> bool:
    """FileSystem.rename — atomic on POSIX/HDFS, a copy on S3-style
    stores (see module docstring). Returns the FS-reported success."""
    spark = spark or _active()
    if spark is None:
        os.rename(src, dst)
        return True
    fs, s = _jfs(spark, src)
    _, d = _jfs(spark, dst)
    return bool(fs.rename(s, d))


def count_files(path: str, spark: SparkSession | None = None) -> int:
    """Recursive count of regular DATA files under ``path`` — hidden
    ``_``/``.``-prefixed names are excluded at EVERY path level, file
    or directory (Spark's own file-index rule), so bookkeeping like a
    generation's ``_meta`` parquet never inflates the compaction
    contract's before/after metric (r11 review)."""
    spark = spark or _active()
    if spark is None:
        n = 0
        for root, dirs, files in os.walk(path):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            n += sum(1 for f in files if not f.startswith(("_", ".")))
        return n
    fs, p = _jfs(spark, path)
    if not fs.exists(p):
        return 0
    # compare FULLY-QUALIFIED strings: listFiles returns qualified
    # statuses, so slicing against an unqualified/relative input path
    # would produce garbage segments (r11 review)
    qroot = fs.makeQualified(p).toString()
    n = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        rel = st.getPath().toString()[len(qroot):].lstrip("/")
        if not any(seg.startswith(("_", ".")) for seg in rel.split("/")):
            n += 1
    return n
