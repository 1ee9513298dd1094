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
