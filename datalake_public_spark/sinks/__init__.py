from datalake_public_spark.sinks.writers import (
    DocumentSink,
    ElasticsearchSink,
    ParquetDocumentSink,
    write_partitioned_parquet,
)

__all__ = [
    "DocumentSink",
    "ElasticsearchSink",
    "ParquetDocumentSink",
    "write_partitioned_parquet",
]
