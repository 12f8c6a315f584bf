"""Object-storage sinks for the single-object archive path.

The reference streams one S3 object through the AWS multipart upload
manager (/root/reference/chiv.go:217-244). The Spark-native analog
uses the Hadoop FileSystem API, which gives the same streaming
multipart behavior on ``s3a://`` URIs and works identically for
``hdfs://`` and ``file://``; a plain local-path storage backs tests.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession


class LocalStorage:
    """Filesystem bucket: object ``bucket/key`` is a plain file."""

    @contextmanager
    def writer(self, bucket: str, key: str) -> Iterator[object]:
        path = os.path.join(bucket, key)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            yield f

    def read_bytes(self, bucket: str, key: str) -> bytes:
        with open(os.path.join(bucket, key), "rb") as f:
            return f.read()

    def delete(self, bucket: str, key: str) -> None:
        try:
            os.remove(os.path.join(bucket, key))
        except FileNotFoundError:
            pass


class HadoopStorage:
    """Hadoop-FS-backed storage: handles s3a:// (streaming multipart
    upload, the direct analog of the reference's s3manager usage),
    hdfs:// and file:// URIs through the JVM gateway."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._jvm = spark._jvm  # noqa: SLF001 — JVM gateway is the supported FS route

    def _fs_path(self, bucket: str, key: str):
        jvm = self._jvm
        path = jvm.org.apache.hadoop.fs.Path(f"{bucket.rstrip('/')}/{key}")
        conf = self._spark._jsc.hadoopConfiguration()  # noqa: SLF001
        fs = path.getFileSystem(conf)
        return fs, path

    @contextmanager
    def writer(self, bucket: str, key: str) -> Iterator[object]:
        fs, path = self._fs_path(bucket, key)
        stream = fs.create(path, True)

        class _W:
            def write(self, data: bytes) -> None:
                stream.write(bytearray(data))

        try:
            yield _W()
        finally:
            stream.close()

    def delete(self, bucket: str, key: str) -> None:
        fs, path = self._fs_path(bucket, key)
        fs.delete(path, False)

    def read_bytes(self, bucket: str, key: str) -> bytes:
        fs, path = self._fs_path(bucket, key)
        stream = fs.open(path)
        out = bytearray()
        buf = bytearray(64 * 1024)
        while True:
            n = stream.read(buf)
            if n <= 0:
                break
            out.extend(buf[:n])
        stream.close()
        return bytes(out)


def storage_for(bucket: str, spark: SparkSession | None = None):
    """Pick a storage backend: URI schemes go through Hadoop FS,
    bare paths through the local filesystem."""
    if "://" in bucket:
        if spark is None:
            raise ValueError("URI buckets require a SparkSession for Hadoop FS access")
        return HadoopStorage(spark)
    return LocalStorage()
