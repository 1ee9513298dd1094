"""fsutil seam: LocalFS verbs, resolve_fs routing (JVM-free local path)."""

from __future__ import annotations

import pytest

from autonomus_datapipeline_spark.fsutil import LocalFS, resolve_fs


@pytest.fixture()
def fs():
    return LocalFS()


def test_localfs_roundtrip(fs, tmp_path):
    d = tmp_path / "sink" / "batch_id=0"
    d.mkdir(parents=True)
    (d / "a.parquet").write_bytes(b"xx")
    (d / "b.txt").write_bytes(b"yyy")
    root = str(tmp_path / "sink")
    assert fs.exists(root)
    assert fs.listdir(root) == ["batch_id=0"]
    files = fs.list_files(root)
    assert {(p.rsplit("/", 1)[1], n) for p, n in files} == {
        ("a.parquet", 2), ("b.txt", 3)
    }
    fs.delete(f"{root}/batch_id=0")
    assert fs.listdir(root) == []
    assert not fs.exists(f"{root}/batch_id=0")
    fs.delete(f"{root}/batch_id=0")  # deleting a missing path is a no-op


def test_localfs_rename_semantics(fs, tmp_path):
    src, dst = tmp_path / "a", tmp_path / "b"
    src.mkdir()
    assert fs.rename(str(src), str(dst)) is True
    assert fs.exists(str(dst)) and not fs.exists(str(src))
    # Hadoop rename contract: False (not an exception) when src is missing
    # or dst already exists
    assert fs.rename(str(src), str(tmp_path / "c")) is False
    src.mkdir()
    assert fs.rename(str(src), str(dst)) is False


def test_localfs_file_uri_and_qualified(fs, tmp_path):
    d = tmp_path / "x"
    d.mkdir()
    assert fs.exists(f"file://{d}")
    # aliasing collapses: dir/../dir == dir
    q1 = fs.qualified(str(d))
    q2 = fs.qualified(str(tmp_path / "x" / ".." / "x"))
    q3 = fs.qualified(f"file://{d}")
    assert q1 == q2 == q3
    assert q1[0] == "file"


def test_localfs_rejects_remote_scheme(fs):
    with pytest.raises(ValueError):
        fs.exists("s3a://bucket/key")


def test_resolve_fs_local_never_touches_jvm(tmp_path):
    """Local paths must resolve to the pure-Python FS without reading the
    session's JVM gateway at all (Spark Connect sessions have none)."""

    class _NoJvmSession:
        @property
        def _jvm(self):  # pragma: no cover - the assertion IS the access
            raise AssertionError("resolve_fs touched spark._jvm for a local path")

    assert isinstance(resolve_fs(_NoJvmSession(), str(tmp_path)), LocalFS)
    assert isinstance(resolve_fs(_NoJvmSession(), f"file://{tmp_path}"), LocalFS)


def test_resolve_fs_remote_without_gateway_raises():
    class _ConnectLike:
        _jvm = None

    with pytest.raises(RuntimeError, match="fs="):
        resolve_fs(_ConnectLike(), "s3a://bucket/prefix")
