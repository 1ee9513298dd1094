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
    # hdfs has no JVM-free implementation (s3/s3a route to boto3 instead)
    class _ConnectLike:
        _jvm = None

    with pytest.raises(RuntimeError, match="fs="):
        resolve_fs(_ConnectLike(), "hdfs://nn/warehouse")


# ---------------------------------------------------------------------------
# BotoS3FS against a real S3 API (moto) — the JVM-free object-store path
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def s3fs_pair():
    moto_server = pytest.importorskip("moto.server")
    boto3 = pytest.importorskip("boto3")
    from autonomus_datapipeline_spark.fsutil import BotoS3FS

    port = 5992
    server = moto_server.ThreadedMotoServer(port=port, verbose=False)
    server.start()
    client = boto3.client(
        "s3",
        endpoint_url=f"http://127.0.0.1:{port}",
        aws_access_key_id="test",
        aws_secret_access_key="test",
        region_name="us-east-1",
    )
    client.create_bucket(Bucket="sink")
    yield client, BotoS3FS(client=client)
    server.stop()


def _seed_gate_sink(client):
    for bid in (0, 1, 2):
        client.put_object(
            Bucket="sink",
            Key=f"index/batch_id={bid}/part-0000.parquet",
            Body=b"x" * (10 + bid),
        )
    client.put_object(Bucket="sink", Key="index/_SUCCESS", Body=b"")


def test_botos3fs_gate_sink_partition_sweep(s3fs_pair):
    """The exact verb sequence compact_gate_sink drives: exists, listdir
    of batch_id=* partition 'directories', recursive delete of the folded
    ones — against a real S3 API, no JVM anywhere."""
    client, fs = s3fs_pair
    _seed_gate_sink(client)
    assert fs.exists("s3a://sink/index")
    assert not fs.exists("s3a://sink/absent")
    names = fs.listdir("s3a://sink/index")
    assert [n for n in names if n.startswith("batch_id=")] == [
        "batch_id=0", "batch_id=1", "batch_id=2",
    ]
    # fold partitions < 2, exactly as compact_gate_sink does
    for name in names:
        if name.startswith("batch_id=") and int(name.split("=")[1]) < 2:
            fs.delete(f"s3a://sink/index/{name}")
    assert [
        n for n in fs.listdir("s3a://sink/index") if n.startswith("batch_id=")
    ] == ["batch_id=2"]
    assert not fs.exists("s3a://sink/index/batch_id=0")
    files = fs.list_files("s3a://sink/index/batch_id=2")
    assert files == [("s3a://sink/index/batch_id=2/part-0000.parquet", 12)]


def test_botos3fs_rename_and_qualified(s3fs_pair):
    client, fs = s3fs_pair
    client.put_object(Bucket="sink", Key="stage/a/f1", Body=b"12345")
    client.put_object(Bucket="sink", Key="stage/f2", Body=b"1")
    assert fs.rename("s3a://sink/stage", "s3a://sink/live") is True
    assert not fs.exists("s3a://sink/stage")
    assert sorted(k for k, _ in fs.list_files("s3a://sink/live")) == [
        "s3a://sink/live/a/f1", "s3a://sink/live/f2",
    ]
    # Hadoop rename contract: False when src missing or dst occupied
    assert fs.rename("s3a://sink/stage", "s3a://sink/elsewhere") is False
    client.put_object(Bucket="sink", Key="other/f", Body=b"1")
    assert fs.rename("s3a://sink/other", "s3a://sink/live") is False
    # prefix-safety: deleting/listing 'live' never touches 'live2'
    client.put_object(Bucket="sink", Key="live2/f", Body=b"1")
    fs.delete("s3a://sink/live")
    assert fs.exists("s3a://sink/live2")
    q = fs.qualified("s3a://sink/x/../x/y")
    assert q == ("s3", "sink", "/x/y")


def test_resolve_fs_routes_s3_without_jvm(tmp_path):
    from autonomus_datapipeline_spark.fsutil import BotoS3FS, resolve_fs

    class _NoJvm:
        _jvm = None

    fs = resolve_fs(_NoJvm(), "s3a://bucket/prefix")
    assert isinstance(fs, BotoS3FS)


def test_resolve_fs_prefers_jvm_bridge_for_s3_on_gateway_sessions():
    """A classic-gateway session's S3 credentials live in the Hadoop conf
    (fs.s3a.access.key, instance roles) — the JVM bridge runs under that
    same chain, while a side-channel boto3 client may have no credentials
    at all (boto3.client() happily constructs without any).  resolve_fs
    must therefore route s3/s3a to JvmHadoopFS whenever a gateway exists
    and use BotoS3FS only as the JVM-free fallback."""
    from autonomus_datapipeline_spark.fsutil import JvmHadoopFS, resolve_fs

    class _Jsc:
        @staticmethod
        def hadoopConfiguration():
            return object()

    class _GatewaySession:
        _jvm = object()
        _jsc = _Jsc()

    fs = resolve_fs(_GatewaySession(), "s3a://bucket/prefix")
    assert isinstance(fs, JvmHadoopFS)
