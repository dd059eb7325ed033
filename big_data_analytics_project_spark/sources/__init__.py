from .readers import (
    Catalog,
    available_tables,
    detect_data_dir,
    read_clickstream_csv,
    read_table,
)

__all__ = [
    "Catalog",
    "available_tables",
    "detect_data_dir",
    "read_clickstream_csv",
    "read_table",
]
