"""Warehouse catalog: layered Parquet tables with persisted schemas + run metadata.

Replaces the reference's Postgres metadata tables + MinIO CSV layers
(reference: db/init.sql:13-520; layer paths in bronze_ingestion.py:117,
silver_service.py:37-39, gold_service.py:70-72) with a filesystem layout:

    <warehouse>/<layer>/<pipeline>/v<version>/data/   ← parquet (partitioned)
    <warehouse>/<layer>/<pipeline>/v<version>/_meta.json

The reference re-inferred schemas from CSV at every layer read
(silver_service.py:74-77 — its biggest physical-design weakness); here every
layer is Parquet with the confirmed StructType persisted as JSON
(StructType.jsonValue / fromJson), so reads are schema-stable and Catalyst
gets pushdown + pruning. On a cluster the warehouse root is s3a://… — the
layout is path-based on purpose.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LAYERS = ("bronze", "silver", "gold")


@dataclass
class TableRef:
    layer: str
    pipeline: str
    version: int
    path: str
    meta: dict


class Catalog:
    def __init__(self, warehouse_dir: str):
        self.root = warehouse_dir.rstrip("/")

    # -- paths ---------------------------------------------------------------

    def table_dir(self, layer: str, pipeline: str, version: int) -> str:
        return f"{self.root}/{layer}/{pipeline}/v{version}"

    def data_path(self, layer: str, pipeline: str, version: int) -> str:
        return f"{self.table_dir(layer, pipeline, version)}/data"

    def _meta_path(self, layer: str, pipeline: str, version: int) -> str:
        return f"{self.table_dir(layer, pipeline, version)}/_meta.json"

    # -- versions ------------------------------------------------------------

    def versions(self, layer: str, pipeline: str) -> list[int]:
        base = f"{self.root}/{layer}/{pipeline}"
        if not os.path.isdir(base):
            return []
        out = []
        for d in os.listdir(base):
            if d.startswith("v") and d[1:].isdigit():
                out.append(int(d[1:]))
        return sorted(out)

    def latest_version(self, layer: str, pipeline: str) -> int | None:
        vs = self.versions(layer, pipeline)
        return vs[-1] if vs else None

    def next_version(self, layer: str, pipeline: str) -> int:
        return (self.latest_version(layer, pipeline) or 0) + 1

    # -- metadata ------------------------------------------------------------

    def write_meta(
        self,
        layer: str,
        pipeline: str,
        version: int,
        schema: T.StructType,
        extra: dict[str, Any] | None = None,
    ) -> dict:
        meta = {
            "layer": layer,
            "pipeline": pipeline,
            "version": version,
            "schema": schema.jsonValue(),
            "created_at": time.time(),
            **(extra or {}),
        }
        path = self._meta_path(layer, pipeline, version)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(meta, fh, indent=2, default=str)
        return meta

    def read_meta(self, layer: str, pipeline: str, version: int) -> dict:
        with open(self._meta_path(layer, pipeline, version)) as fh:
            return json.load(fh)

    def schema_of(self, layer: str, pipeline: str, version: int) -> T.StructType:
        return T.StructType.fromJson(self.read_meta(layer, pipeline, version)["schema"])

    # -- reads ---------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        layer: str,
        pipeline: str,
        version: int | None = None,
    ) -> DataFrame:
        """Read a layer table with its persisted schema (no re-inference)."""
        v = version if version is not None else self.latest_version(layer, pipeline)
        if v is None:
            raise FileNotFoundError(f"no {layer} table for pipeline '{pipeline}'")
        schema = self.schema_of(layer, pipeline, v)
        return spark.read.schema(schema).parquet(self.data_path(layer, pipeline, v))

    def latest(self, layer: str, pipeline: str) -> TableRef | None:
        v = self.latest_version(layer, pipeline)
        if v is None:
            return None
        return TableRef(
            layer, pipeline, v, self.data_path(layer, pipeline, v),
            self.read_meta(layer, pipeline, v),
        )


# ---------------------------------------------------------------------------
# Object-store (s3a://) wiring
# ---------------------------------------------------------------------------


def s3a_session_confs(
    endpoint: str | None = None,
    *,
    access_key: str = "",
    secret_key: str = "",
    path_style: bool = True,
    magic_committer: bool = True,
) -> dict[str, str]:
    """Session confs for an ``s3a://`` warehouse root (reference
    bronze_ingestion.py:40-60 configures the same endpoint/path-style/creds
    block per session for its MinIO layers).

    Two pieces matter at scale beyond credentials:

    * ``fs.s3a.path.style.access`` — MinIO/on-prem S3 endpoints route by
      path, not virtual host;
    * the **magic committer** — the default FileOutputCommitter v1/v2
      finalizes output with directory RENAMES, which on S3 are O(data)
      copies and non-atomic; the magic committer targets multipart-upload
      completion instead (zero-rename, task-commit atomic), which is the
      only safe way to run the partitioned-append bronze sink against an
      object store.

    The returned dict is applied via ``spark.conf.set`` / builder config.
    This sandbox ships no ``hadoop-aws`` jar, so the repo exercises this as
    a configuration contract plus an S3-API layout round-trip test
    (tests/test_objectstore.py); on a real cluster the same dict is the
    entire s3a switch — the Catalog's path math is already scheme-agnostic.
    """
    confs: dict[str, str] = {}
    if endpoint:
        confs["spark.hadoop.fs.s3a.endpoint"] = endpoint
        # Local/MinIO endpoints are plain HTTP.
        confs["spark.hadoop.fs.s3a.connection.ssl.enabled"] = "false"
    if access_key:
        confs["spark.hadoop.fs.s3a.access.key"] = access_key
        confs["spark.hadoop.fs.s3a.secret.key"] = secret_key
        confs["spark.hadoop.fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
        )
    if path_style:
        confs["spark.hadoop.fs.s3a.path.style.access"] = "true"
    if magic_committer:
        confs.update(
            {
                "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
                "spark.hadoop.fs.s3a.committer.name": "magic",
                "spark.sql.sources.commitProtocolClass": (
                    "org.apache.spark.internal.io.cloud."
                    "PathOutputCommitProtocol"
                ),
                "spark.sql.parquet.output.committer.class": (
                    "org.apache.spark.internal.io.cloud."
                    "BindingParquetOutputCommitter"
                ),
            }
        )
    return confs
