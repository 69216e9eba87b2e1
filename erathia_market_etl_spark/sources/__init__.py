from .parquet_io import load_table, load_tables, write_partitioned, write_single_file

__all__ = ["load_table", "load_tables", "write_partitioned", "write_single_file"]
