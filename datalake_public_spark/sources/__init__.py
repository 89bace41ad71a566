from datalake_public_spark.sources.readers import (
    load_testdata_tables,
    read_json_snapshots,
    read_parquet_table,
)

__all__ = ["read_json_snapshots", "read_parquet_table", "load_testdata_tables"]
