from autonomus_datapipeline_spark.functions.udf_registry import (  # noqa: F401
    UdfRegistry,
    UserFunction,
)
from autonomus_datapipeline_spark.functions.columns import (  # noqa: F401
    category_bucket,
    fahrenheit_to_celsius,
    time_delay_seconds,
)
