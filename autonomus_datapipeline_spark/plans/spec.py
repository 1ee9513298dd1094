"""Config-driven pipeline plans.

The reference is a *configuration-driven* platform: pipelines are rows of
config (source type, paths, options) and the orchestration is rendered from
string templates into Airflow DAGs (reference: dag_generator.py:37-802
templates, :809-1157 generator; master chain :1050-1067). Here the plan is a
declarative spec (dict / JSON) interpreted by a programmatic runner — no code
generation, no scheduler dependency; a cron entry or any orchestrator can
call ``run_spec``.

Spec shape::

    {
      "name": "flights",
      "source": {"kind": "files", "path": "/data/in", "format": "csv",
                 "options": {"sep": ","}},
      "silver": [{"name": "clean", "code": "def transform(df, spark): ..."}],
      "gold":   [{"name": "agg",   "code": "def transform(df, spark): ..."}],
      "export": {"kind": "jdbc", "url": "...", "table": "gold_flights",
                 "mode": "replace"}   # optional
    }
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from autonomus_datapipeline_spark.catalog import Catalog
from autonomus_datapipeline_spark.engine.pipeline import LayerResult, Pipeline
from autonomus_datapipeline_spark.sources.files import FileSource
from autonomus_datapipeline_spark.sources.jdbc import read_jdbc, write_jdbc
from autonomus_datapipeline_spark.sources.rest import RestSource


@dataclass
class PipelineSpec:
    name: str
    source: dict[str, Any]
    silver: list[dict[str, str]] = field(default_factory=list)
    gold: list[dict[str, str]] = field(default_factory=list)
    export: dict[str, Any] | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "PipelineSpec":
        return cls(
            name=d["name"],
            source=d["source"],
            silver=list(d.get("silver", [])),
            gold=list(d.get("gold", [])),
            export=d.get("export"),
        )


def _read_source(spark: SparkSession, source: dict[str, Any]) -> DataFrame:
    kind = source["kind"]
    if kind == "files":
        return FileSource(
            path=source["path"],
            fmt=source.get("format", "csv"),
            options=source.get("options", {}),
        ).read(spark, allow_schema_drift=source.get("allow_schema_drift", False))
    if kind == "rest":
        return RestSource(**source["config"]).read(spark)
    if kind == "jdbc":
        return read_jdbc(spark, **source["config"])
    raise ValueError(f"unknown source kind: {kind!r}")


def _build_pipeline(
    spark: SparkSession, catalog: Catalog, spec: PipelineSpec
) -> Pipeline:
    pipe = Pipeline(spark, catalog, spec.name)
    for step in spec.silver:
        pipe.silver_chain.add_step(step["name"], step["code"])
    for step in spec.gold:
        pipe.gold_chain.add_step(step["name"], step["code"])
    return pipe


def _run_export(spark: SparkSession, catalog: Catalog, spec: PipelineSpec) -> None:
    exp = dict(spec.export or {})
    if exp.pop("kind") != "jdbc":
        raise ValueError("only jdbc export is supported")
    gold_df = catalog.read(spark, "gold", spec.name)
    write_jdbc(gold_df, **exp)


def run_spec(
    spark: SparkSession,
    catalog: Catalog,
    spec: PipelineSpec | dict[str, Any],
) -> dict[str, LayerResult]:
    """Interpret a spec: source → bronze → silver → gold [→ export]."""
    if isinstance(spec, dict):
        spec = PipelineSpec.from_dict(spec)
    pipe = _build_pipeline(spark, catalog, spec)
    results = pipe.run_all(_read_source(spark, spec.source))
    if spec.export:
        _run_export(spark, catalog, spec)
    return results


def run_layer_task(
    layer: str,
    spec: dict[str, Any],
    warehouse: str,
    batch_id: str | None = None,
) -> dict[str, Any]:
    """Single-layer task entry point for external orchestrators (the
    callable the generated Airflow DAG's PythonOperators invoke — reference
    dag_generator.py:809-1157 renders one Airflow task per layer the same
    way). Each invocation builds its own SparkSession/catalog, so tasks are
    independently retryable; ``batch_id`` (Airflow's run_id) makes bronze
    retries idempotent via the catalog's ingested-batch ledger.
    """
    from autonomus_datapipeline_spark.session import get_spark

    s = PipelineSpec.from_dict(spec)
    spark = get_spark(f"{s.name}_{layer}")
    catalog = Catalog(warehouse)
    pipe = _build_pipeline(spark, catalog, s)
    if layer == "bronze":
        result = pipe.ingest_bronze(_read_source(spark, s.source), batch_id=batch_id)
    elif layer == "silver":
        result = pipe.run_silver()
    elif layer == "gold":
        result = pipe.run_gold()
    elif layer == "export":
        _run_export(spark, catalog, s)
        return {"layer": "export", "ok": True}
    else:
        raise ValueError(f"unknown layer: {layer!r}")
    return {
        "layer": result.layer,
        "version": result.version,
        "path": result.path,
        "row_count": result.row_count,
        "elapsed_s": result.elapsed_s,
    }
