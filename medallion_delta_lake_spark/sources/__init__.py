from medallion_delta_lake_spark.sources.readers import scan, scan_csv, scan_json, scan_table
from medallion_delta_lake_spark.sources.writers import (
    write_append,
    write_overwrite,
    write_if_absent,
)

__all__ = [
    "scan",
    "scan_csv",
    "scan_json",
    "scan_table",
    "write_append",
    "write_overwrite",
    "write_if_absent",
]
