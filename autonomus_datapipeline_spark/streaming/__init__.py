from autonomus_datapipeline_spark.streaming.ingest import (  # noqa: F401
    kafka_stream,
    stream_dir_to_bronze,
    with_stream_lineage,
)
from autonomus_datapipeline_spark.streaming.aggregations import (  # noqa: F401
    sessionized_counts,
    windowed_counts,
)
from autonomus_datapipeline_spark.streaming.stateful import running_user_stats  # noqa: F401
