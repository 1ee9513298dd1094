"""autonomus_datapipeline_spark — a PySpark-native analytics/pipeline engine.

Re-implements, Spark-first, the capability surface of the reference system
``sairam030/autonomus_datapipeline`` (an AI-assisted medallion Bronze→Silver→Gold
pipeline platform whose executor is PySpark itself; see SURVEY.md):

- multi-source ingestion (files / REST / Kafka / JDBC) with lineage columns
- heuristic schema inference with confidence scoring and overrides
- a sandboxed, versioned ``transform(df, spark)`` chain engine with dry-runs
- layered Parquet storage (the reference used CSV; we use columnar + persisted
  schemas so Catalyst gets pushdown/pruning for free)
- large-scale training-data operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), similarity search, text analysis,
  multimodal column plumbing
- Structured Streaming ingestion (replaces the reference's manual Kafka offset
  management with checkpointed exactly-once semantics)

Everything is DataFrame-declarative so Catalyst/Tungsten/AQE pick physical
plans; Python UDFs appear only where built-ins cannot express the semantics,
and then always Arrow-batched (pandas) — never row-at-a-time.
"""

__version__ = "0.1.0"

from autonomus_datapipeline_spark.session import get_spark  # noqa: F401
