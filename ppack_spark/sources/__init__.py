from .etl import (
    load_tables,
    read_parquet_glob,
    read_tsv,
    register_views,
    tsv_to_partitioned_parquet,
)

__all__ = [
    "load_tables",
    "read_parquet_glob",
    "read_tsv",
    "register_views",
    "tsv_to_partitioned_parquet",
]
