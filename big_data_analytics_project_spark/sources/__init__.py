from .readers import (
    Catalog,
    available_tables,
    detect_data_dir,
    read_clickstream_csv,
    read_table,
)
from .sinks import index_scratch_dir

__all__ = [
    "Catalog",
    "available_tables",
    "detect_data_dir",
    "index_scratch_dir",
    "read_clickstream_csv",
    "read_table",
]
