from spotify_podcasts_airflow_batch_spark.sources.readers import (
    TABLES,
    list_data_files,
    read_csv,
    read_json,
    read_parquet_many,
    table,
)

__all__ = [
    "TABLES",
    "table",
    "read_parquet_many",
    "read_csv",
    "read_json",
    "list_data_files",
]
