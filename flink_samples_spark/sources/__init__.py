from flink_samples_spark.sources.readers import (
    TABLES,
    load_table,
    load_tables,
    range_source,
    read_json_lines,
    scan_parquet,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "range_source",
    "read_json_lines",
    "scan_parquet",
]
