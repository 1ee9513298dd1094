from autonomus_datapipeline_spark.inference.schema_inference import (  # noqa: F401
    FieldSchema,
    InferenceResult,
    SchemaOverride,
    apply_overrides,
    infer_dataframe_schema,
    infer_field,
    to_struct_type,
    validate_multi_file,
)
