from hdfs_with_pyspark_spark.sources.io import (
    read_table,
    read_events_partition,
    write_parquet,
)

__all__ = ["read_table", "read_events_partition", "write_parquet"]
