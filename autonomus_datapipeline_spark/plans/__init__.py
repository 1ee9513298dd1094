from autonomus_datapipeline_spark.plans.spec import PipelineSpec, run_spec  # noqa: F401
