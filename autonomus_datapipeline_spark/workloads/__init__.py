from autonomus_datapipeline_spark.workloads.registry import (  # noqa: F401
    QUERY_REGISTRY,
    TABLES,
    QuerySpec,
    load_table,
    oracle_sql,
    queries,
    query,
)

# Importing these modules populates QUERY_REGISTRY via the @query decorator.
from autonomus_datapipeline_spark.workloads import relational  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import relational_ext  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import incremental_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import graph_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import text_ops2  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import pipeline_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import curation_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import curation_pipeline  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import relational_joins  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import scale_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import sql_surface  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import training_prep  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import audit_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import analytics_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import search_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import mining_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import stats_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import diagnostics_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import tpch_partsupp  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import model_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import asof_ops  # noqa: F401,E402
from autonomus_datapipeline_spark.workloads import sketch_ops  # noqa: F401,E402
