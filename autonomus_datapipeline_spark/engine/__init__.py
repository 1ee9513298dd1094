from autonomus_datapipeline_spark.engine.validation import validate_transform_code  # noqa: F401
from autonomus_datapipeline_spark.engine.sandbox import compile_transform, dry_run  # noqa: F401
from autonomus_datapipeline_spark.engine.chain import TransformChain, TransformStep  # noqa: F401
from autonomus_datapipeline_spark.engine.pipeline import Pipeline  # noqa: F401
