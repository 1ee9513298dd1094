from autonomus_datapipeline_spark.sources.files import FileSource, discover_files  # noqa: F401
from autonomus_datapipeline_spark.sources.rest import RestSource  # noqa: F401
from autonomus_datapipeline_spark.sources.jdbc import jdbc_reader_options, read_jdbc, write_jdbc  # noqa: F401
