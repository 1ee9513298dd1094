"""Object-store warehouse path: s3a conf contract + an S3-API layout
round-trip against a local moto server.

The sandbox ships no hadoop-aws jar, so Spark itself cannot open s3a://
here; what CAN be proven offline, and is, splits into:

* the exact session-conf block a cluster needs for an s3a warehouse
  (endpoint, path-style, creds provider, zero-rename magic committer) —
  pinned as a contract so the wiring can't silently rot;
* that the Catalog's path-based layout (layer/pipeline/v<N>/data with hive
  partition dirs + _meta.json) survives a real S3 API verbatim: every
  object uploaded with its exact key, listed back, hive-partition
  discovery works, and a partition filter PRUNES to only the matching
  partition's fragment — the property the partitioned bronze sink relies
  on. Reads go through pyarrow's S3 filesystem against moto; uploads go
  through boto3 (pyarrow's multipart CompleteMultipartUpload trips a moto
  incompatibility, and the pipeline writes through Spark anyway — the
  upload here only ships locally-written files).
"""

from __future__ import annotations

import json
import os

import pyarrow.dataset as ds
import pytest

from autonomus_datapipeline_spark.catalog import Catalog, s3a_session_confs

moto_server = pytest.importorskip("moto.server")
boto3 = pytest.importorskip("boto3")

_PORT = 5991
_ENDPOINT = f"http://127.0.0.1:{_PORT}"


def test_s3a_conf_contract():
    confs = s3a_session_confs(
        "http://minio:9000", access_key="ak", secret_key="sk"
    )
    assert confs["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert confs["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert confs["spark.hadoop.fs.s3a.access.key"] == "ak"
    # Zero-rename committer: S3 renames are O(data) copies and non-atomic,
    # so the default FileOutputCommitter is never acceptable on s3a.
    assert confs["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert "PathOutputCommitProtocol" in confs[
        "spark.sql.sources.commitProtocolClass"
    ]


def test_s3a_conf_contract_minimal():
    confs = s3a_session_confs(magic_committer=False)
    assert "spark.hadoop.fs.s3a.endpoint" not in confs
    assert "spark.hadoop.fs.s3a.committer.name" not in confs
    assert confs["spark.hadoop.fs.s3a.path.style.access"] == "true"


@pytest.fixture(scope="module")
def s3_bucket():
    server = moto_server.ThreadedMotoServer(port=_PORT, verbose=False)
    server.start()
    client = boto3.client(
        "s3",
        endpoint_url=_ENDPOINT,
        aws_access_key_id="test",
        aws_secret_access_key="test",
        region_name="us-east-1",
    )
    client.create_bucket(Bucket="warehouse")
    yield client
    server.stop()


def _upload_dir(client, local_root: str, bucket: str, prefix: str) -> list[str]:
    keys = []
    for dirpath, _dirs, files in os.walk(local_root):
        for name in files:
            if name.startswith(("_SUCCESS", ".")) and name != "_meta.json":
                continue
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, local_root)
            key = f"{prefix}/{rel}"
            with open(full, "rb") as fh:
                client.put_object(Bucket=bucket, Key=key, Body=fh.read())
            keys.append(key)
    return keys


def test_catalog_layout_roundtrip_via_s3_api(spark, tmp_path, s3_bucket):
    # Write a partitioned bronze table through the Catalog locally …
    cat = Catalog(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "2024-01-01", "a"), (2, "2024-01-01", "b"), (3, "2024-01-02", "c")],
        "id bigint, _ingestion_date string, payload string",
    )
    v = cat.next_version("bronze", "pipe")
    df.write.mode("overwrite").partitionBy("_ingestion_date").parquet(
        cat.data_path("bronze", "pipe", v)
    )
    cat.write_meta("bronze", "pipe", v, df.schema)

    # … ship every object verbatim to the S3 API …
    keys = _upload_dir(s3_bucket, str(tmp_path / "wh"), "warehouse", "wh")
    assert any("_ingestion_date=2024-01-01" in k for k in keys)
    assert any(k.endswith("_meta.json") for k in keys)

    # … and read the SAME layout back through an S3 filesystem client:
    # hive-partition discovery + a partition filter that prunes fragments.
    from pyarrow import fs

    s3 = fs.S3FileSystem(
        access_key="test",
        secret_key="test",
        endpoint_override=_ENDPOINT,
        scheme="http",
    )
    data_prefix = f"warehouse/wh/bronze/pipe/v{v}/data"
    # pyarrow skips "_"-prefixed paths by default — the lineage partition
    # column is _ingestion_date, so narrow the ignore list to dotfiles.
    dataset = ds.dataset(
        data_prefix,
        format="parquet",
        partitioning="hive",
        filesystem=s3,
        ignore_prefixes=["."],
    )
    flt = ds.field("_ingestion_date") == "2024-01-01"
    got = dataset.to_table(filter=flt)
    assert sorted(got.column("id").to_pylist()) == [1, 2]
    # Partition pruning on the object store: only day-1 fragments touched.
    touched = [f.path for f in dataset.get_fragments(filter=flt)]
    assert touched and all("_ingestion_date=2024-01-01" in p for p in touched)

    # The persisted schema survives the trip byte-for-byte.
    meta_key = f"wh/bronze/pipe/v{v}/_meta.json"
    body = s3_bucket.get_object(Bucket="warehouse", Key=meta_key)["Body"].read()
    assert json.loads(body)["schema"] == df.schema.jsonValue()
