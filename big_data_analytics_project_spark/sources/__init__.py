from .readers import Catalog, read_clickstream_csv, read_table

__all__ = ["Catalog", "read_clickstream_csv", "read_table"]
