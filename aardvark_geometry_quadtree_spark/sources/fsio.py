"""Hadoop-FileSystem-API manifest/marker I/O (py4j), so every store and
builder manifest works on ANY Hadoop-visible URI — local paths, HDFS,
object storage — not just the local filesystem.

Rationale: the parquet payloads always went through Spark (URI-agnostic),
but the side-channel JSON manifests and _SUCCESS probes used Python
``open``/``os.listdir``, silently restricting Builder.save/load and the
ParquetStore bindings to local paths (the round-4 documented contract).
This module routes those bytes through the SAME FileSystem abstraction
Spark itself uses — ``Path.getFileSystem(hadoopConf)`` resolves the
scheme (file://, hdfs://, s3a://, ...) with the cluster's configuration,
so no operator carries path-scheme logic.

Every helper resolves the active :class:`SparkSession` (the JVM gateway)
and falls back to plain local-FS Python I/O when no session exists —
manifest reads in driver-side tooling keep working without Spark.
"""

from __future__ import annotations

import json
import os


def _jvm_fs(path: str):
    """(fs, hadoop Path, jvm) for ``path`` via the active session's JVM, or
    None when no session is active (caller falls back to local I/O)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return None
    sc = spark.sparkContext
    jvm = sc._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs, p, jvm


def write_text(path: str, text: str) -> None:
    """Create/overwrite a small text file (manifest-sized) at ``path``."""
    r = _jvm_fs(path)
    if r is None:
        with open(path, "w") as f:
            f.write(text)
        return
    fs, p, _ = r
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(path: str) -> str | None:
    """Contents of a small text file, or None if it does not exist."""
    r = _jvm_fs(path)
    if r is None:
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return f.read()
    fs, p, jvm = r
    if not fs.exists(p):
        return None
    ins = fs.open(p)
    try:
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(ins, baos, 65536, False)
        return bytes(baos.toByteArray()).decode("utf-8")
    finally:
        ins.close()


def write_json(path: str, obj) -> None:
    write_text(path, json.dumps(obj, indent=2))


def read_json(path: str):
    text = read_text(path)
    return None if text is None else json.loads(text)


def exists(path: str) -> bool:
    r = _jvm_fs(path)
    if r is None:
        return os.path.exists(path)
    fs, p, _ = r
    return bool(fs.exists(p))


def list_names(path: str) -> list[str]:
    """Child entry NAMES of a directory (empty when it does not exist) —
    the Hadoop-FS replacement for ``os.listdir``."""
    r = _jvm_fs(path)
    if r is None:
        return os.listdir(path) if os.path.isdir(path) else []
    fs, p, _ = r
    if not fs.exists(p):
        return []
    return [s.getPath().getName() for s in fs.listStatus(p)]


def join(base: str, *parts: str) -> str:
    """URI-safe path join: '/'-separated regardless of platform (Hadoop
    Paths are always slash-separated; os.path.join would break on URIs
    only on non-posix hosts, but being explicit costs nothing)."""
    out = base.rstrip("/")
    for part in parts:
        out = f"{out}/{part.strip('/')}"
    return out
