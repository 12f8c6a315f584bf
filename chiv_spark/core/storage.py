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


class S3BotoStorage:
    """Direct S3-API storage via boto3 streaming multipart upload —
    the closest analog of the reference's ``s3manager.UploadWithContext``
    (/root/reference/chiv.go:235-239): parts upload as bytes arrive
    (bounded memory), ``complete`` only on clean close, ``abort`` on
    failure so NO object ever appears for a failed archive.

    ``part_size`` must respect S3's 5 MiB minimum for non-final parts
    (the integration test exercises 3 real parts at exactly that
    size). Used for ``s3://`` buckets; ``s3a://`` stays on Hadoop FS
    (the executor-side path Spark itself writes through).
    """

    def __init__(self, part_size: int = 8 * 1024 * 1024, client=None):
        if client is None:
            import boto3

            client = boto3.client("s3")
        self._client = client
        self._part_size = part_size

    @staticmethod
    def split(bucket: str) -> str:
        return bucket[len("s3://") :].strip("/") if bucket.startswith("s3://") else bucket

    @contextmanager
    def writer(self, bucket: str, key: str) -> Iterator[object]:
        client, part_size = self._client, self._part_size
        bkt = self.split(bucket)
        mpu = client.create_multipart_upload(Bucket=bkt, Key=key)
        upload_id = mpu["UploadId"]

        class _W:
            def __init__(self):
                self._buf = bytearray()
                self._parts: list[dict] = []

            def write(self, data: bytes) -> None:
                self._buf.extend(data)
                while len(self._buf) >= part_size:
                    self._flush_part(bytes(self._buf[:part_size]))
                    del self._buf[:part_size]

            def _flush_part(self, body: bytes) -> None:
                n = len(self._parts) + 1
                resp = client.upload_part(
                    Bucket=bkt, Key=key, UploadId=upload_id, PartNumber=n, Body=body
                )
                self._parts.append({"PartNumber": n, "ETag": resp["ETag"]})

            def _finish(self) -> None:
                if self._buf or not self._parts:
                    self._flush_part(bytes(self._buf))
                    self._buf.clear()
                client.complete_multipart_upload(
                    Bucket=bkt,
                    Key=key,
                    UploadId=upload_id,
                    MultipartUpload={"Parts": self._parts},
                )

        w = _W()
        try:
            yield w
            w._finish()  # noqa: SLF001
        except BaseException:
            # abort on ANY failure — including a failed complete call —
            # so no dangling multipart upload accrues storage charges
            client.abort_multipart_upload(Bucket=bkt, Key=key, UploadId=upload_id)
            raise

    def read_bytes(self, bucket: str, key: str) -> bytes:
        return self._client.get_object(Bucket=self.split(bucket), Key=key)["Body"].read()

    def delete(self, bucket: str, key: str) -> None:
        self._client.delete_object(Bucket=self.split(bucket), Key=key)


def storage_for(bucket: str, spark: SparkSession | None = None):
    """Pick a storage backend: ``s3://`` goes direct through boto3
    multipart (reference parity), other URI schemes (``s3a://``,
    ``hdfs://``, ``file://``) through Hadoop FS, bare paths through
    the local filesystem."""
    if bucket.startswith("s3://"):
        return S3BotoStorage()
    if "://" in bucket:
        if spark is None:
            raise ValueError("URI buckets require a SparkSession for Hadoop FS access")
        return HadoopStorage(spark)
    return LocalStorage()
