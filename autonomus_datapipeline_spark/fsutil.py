"""Filesystem seam for sink maintenance (compaction, swaps, file audits).

Maintenance paths need a handful of filesystem verbs Spark's public
DataFrame API does not expose: list a sink's partition directories, delete
folded partitions, rename a staged rewrite into place. The JVM gateway
(``spark._jvm`` → Hadoop ``FileSystem``) can do all of that for every
scheme Spark reads, but it is NOT a stable public surface across PySpark
majors (Spark Connect sessions have no ``_jvm`` at all), so it must never
be the only path.

This module makes the filesystem an injectable seam:

- :class:`LocalFS` — pure-Python (``os``/``shutil``) implementation for
  plain paths and ``file:`` URIs. No JVM involvement at all; works under
  Spark Connect.
- :class:`JvmHadoopFS` — the Hadoop ``FileSystem`` bridge for ``hdfs:`` /
  ``s3a:`` / anything else, used only when a classic-gateway session is
  available.
- :func:`resolve_fs` — picks LocalFS for local paths (the common case in
  this repo's tests and any single-node run) and falls back to the JVM
  bridge otherwise, with a clear error when neither applies.

Callers (``streaming/neardup.compact_gate_sink``,
``operators/maintenance``) accept an optional ``fs=`` so a deployment can
supply its own implementation (e.g. a boto3-backed S3 lister) without
touching engine code.
"""

from __future__ import annotations

import os
import posixpath
import shutil
from urllib.parse import urlparse


class LocalFS:
    """Pure-Python filesystem verbs for local paths / ``file:`` URIs."""

    #: os.rename is a single syscall — safe for promote-style swaps.
    atomic_rename = True

    @staticmethod
    def _strip(path: str) -> str:
        u = urlparse(path)
        if u.scheme in ("", "file"):
            return u.path or path
        raise ValueError(f"LocalFS cannot handle scheme {u.scheme!r}: {path}")

    def exists(self, path: str) -> bool:
        return os.path.exists(self._strip(path))

    def listdir(self, path: str) -> list[str]:
        """Child entry NAMES of a directory (not full paths)."""
        return sorted(os.listdir(self._strip(path)))

    def delete(self, path: str) -> None:
        p = self._strip(path)
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)

    def rename(self, src: str, dst: str) -> bool:
        s, d = self._strip(src), self._strip(dst)
        if not os.path.exists(s) or os.path.exists(d):
            return False
        os.rename(s, d)
        return True

    def list_files(self, path: str) -> list[tuple[str, int]]:
        """(full_path, bytes) for every regular file under ``path``,
        recursively."""
        root = self._strip(path)
        out: list[tuple[str, int]] = []
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                fp = os.path.join(dirpath, f)
                out.append((fp, os.path.getsize(fp)))
        return sorted(out)

    def qualified(self, path: str) -> tuple[str, str, str]:
        """(scheme, authority, normalized absolute path) — the identity
        used to refuse in-place rewrites regardless of aliasing."""
        return ("file", "", posixpath.normpath(os.path.abspath(self._strip(path))))


class JvmHadoopFS:
    """Hadoop ``FileSystem`` verbs via the classic JVM gateway.

    Only constructed when the session actually has a gateway (classic
    PySpark); resolve_fs never routes local paths here, so single-node /
    Spark Connect runs stay JVM-free.
    """

    #: Hadoop's FileSystem.rename contract is a metadata operation on
    #: HDFS-like stores.  NOTE: s3a's implementation is still copy+delete
    #: under the hood — object-store swaps belong to a table format's
    #: metadata commit regardless of which bridge executes them.
    atomic_rename = True

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _fs_path(self, path: str):
        hp = self._jvm.org.apache.hadoop.fs.Path(path)
        return hp.getFileSystem(self._conf), hp

    def exists(self, path: str) -> bool:
        fs, hp = self._fs_path(path)
        return bool(fs.exists(hp))

    def listdir(self, path: str) -> list[str]:
        fs, hp = self._fs_path(path)
        return sorted(
            status.getPath().getName() for status in fs.listStatus(hp)
        )

    def delete(self, path: str) -> None:
        fs, hp = self._fs_path(path)
        fs.delete(hp, True)

    def rename(self, src: str, dst: str) -> bool:
        fs, sp = self._fs_path(src)
        dp = self._jvm.org.apache.hadoop.fs.Path(dst)
        return bool(fs.rename(sp, dp))

    def list_files(self, path: str) -> list[tuple[str, int]]:
        fs, hp = self._fs_path(path)
        out: list[tuple[str, int]] = []
        it = fs.listFiles(hp, True)
        while it.hasNext():
            status = it.next()
            out.append((status.getPath().toString(), status.getLen()))
        return sorted(out)

    def qualified(self, path: str) -> tuple[str, str, str]:
        fs, hp = self._fs_path(path)
        uri = fs.makeQualified(hp).toUri()
        return (
            uri.getScheme() or "",
            uri.getAuthority() or "",
            posixpath.normpath(uri.getPath() or "/"),
        )


class BotoS3FS:
    """Pure-Python S3 maintenance verbs via boto3 — the JVM-free path for
    ``s3://``/``s3a://`` sink maintenance (partition listing/deletion,
    file-size audits) when no hadoop-aws jar or classic gateway exists.

    Semantics notes:
    - S3 has no directories; ``listdir``/``exists`` operate on key
      prefixes with '/' as the delimiter, which matches how Spark lays
      out ``batch_id=N`` partition "directories".
    - ``rename`` is server-side copy + delete and therefore NOT atomic —
      fine for the compaction sweeps that tolerate re-runs
      (crash-idempotent by design), NOT a substitute for a table-format
      commit in ``promote_directory``-style swaps; the ``atomic_rename``
      capability flag below lets such callers refuse this implementation.
    """

    #: copy+delete emulation — promote_directory refuses this fs unless
    #: the caller explicitly opts in (allow_non_atomic=True).
    atomic_rename = False

    def __init__(self, client=None, endpoint_url: str | None = None):
        if client is None:
            import boto3

            client = boto3.client("s3", endpoint_url=endpoint_url)
        self._c = client

    @staticmethod
    def _parse(path: str) -> tuple[str, str]:
        u = urlparse(path)
        if u.scheme not in ("s3", "s3a", "s3n"):
            raise ValueError(f"BotoS3FS cannot handle scheme {u.scheme!r}")
        return u.netloc, u.path.lstrip("/")

    def _iter_keys(self, bucket: str, prefix: str):
        token = None
        while True:
            kw = {"Bucket": bucket, "Prefix": prefix}
            if token:
                kw["ContinuationToken"] = token
            resp = self._c.list_objects_v2(**kw)
            yield from resp.get("Contents", [])
            if not resp.get("IsTruncated"):
                return
            token = resp.get("NextContinuationToken")

    def exists(self, path: str) -> bool:
        bucket, key = self._parse(path)
        prefix = key.rstrip("/")
        for obj in self._iter_keys(bucket, prefix):
            k = obj["Key"]
            if k == prefix or k.startswith(prefix + "/"):
                return True
        return False

    def listdir(self, path: str) -> list[str]:
        bucket, key = self._parse(path)
        prefix = key.rstrip("/") + "/" if key else ""
        names: set[str] = set()
        token = None
        while True:
            kw = {"Bucket": bucket, "Prefix": prefix, "Delimiter": "/"}
            if token:
                kw["ContinuationToken"] = token
            resp = self._c.list_objects_v2(**kw)
            for cp in resp.get("CommonPrefixes", []):
                names.add(cp["Prefix"][len(prefix):].rstrip("/"))
            for obj in resp.get("Contents", []):
                rest = obj["Key"][len(prefix):]
                if rest:
                    names.add(rest)
            if not resp.get("IsTruncated"):
                return sorted(names)
            token = resp.get("NextContinuationToken")

    def delete(self, path: str) -> None:
        bucket, key = self._parse(path)
        prefix = key.rstrip("/")
        batch: list[dict] = []
        for obj in self._iter_keys(bucket, prefix):
            k = obj["Key"]
            if k == prefix or k.startswith(prefix + "/"):
                batch.append({"Key": k})
                if len(batch) == 1000:
                    self._c.delete_objects(
                        Bucket=bucket, Delete={"Objects": batch}
                    )
                    batch = []
        if batch:
            self._c.delete_objects(Bucket=bucket, Delete={"Objects": batch})

    def rename(self, src: str, dst: str) -> bool:
        if not self.exists(src) or self.exists(dst):
            return False
        bucket, skey = self._parse(src)
        dbucket, dkey = self._parse(dst)
        sprefix = skey.rstrip("/")
        for obj in list(self._iter_keys(bucket, sprefix)):
            k = obj["Key"]
            if not (k == sprefix or k.startswith(sprefix + "/")):
                continue
            new_key = dkey.rstrip("/") + k[len(sprefix):]
            self._c.copy_object(
                Bucket=dbucket,
                Key=new_key,
                CopySource={"Bucket": bucket, "Key": k},
            )
        self.delete(src)
        return True

    def list_files(self, path: str) -> list[tuple[str, int]]:
        bucket, key = self._parse(path)
        prefix = key.rstrip("/")
        scheme = urlparse(path).scheme
        out = []
        for obj in self._iter_keys(bucket, prefix):
            k = obj["Key"]
            if k == prefix or k.startswith(prefix + "/"):
                out.append((f"{scheme}://{bucket}/{k}", int(obj["Size"])))
        return sorted(out)

    def qualified(self, path: str) -> tuple[str, str, str]:
        bucket, key = self._parse(path)
        return ("s3", bucket, posixpath.normpath("/" + key))


def resolve_fs(spark, path: str):
    """LocalFS for local / ``file:`` paths (JVM-free); the Hadoop bridge
    for every remote scheme on classic-gateway sessions — including
    ``s3://``/``s3a://``, because the JVM FileSystem runs under the SAME
    credential chain Spark's own reads use (``fs.s3a.access.key``,
    instance roles via hadoop-aws), which a side-channel boto3 client
    does not; boto3-backed S3 verbs only as the JVM-free fallback (Spark
    Connect / no gateway), where no Hadoop credential chain exists to
    diverge from; a clear error otherwise (inject your own ``fs=``)."""
    scheme = urlparse(path).scheme
    if scheme in ("", "file"):
        return LocalFS()
    if getattr(spark, "_jvm", None) is not None:
        return JvmHadoopFS(spark)
    if scheme in ("s3", "s3a", "s3n"):
        try:
            return BotoS3FS()
        except ImportError:
            pass
    raise RuntimeError(
        f"no filesystem implementation for scheme {scheme!r} without a JVM "
        "gateway (Spark Connect session?) — pass fs= explicitly"
    )
